"""Dedup operator semantics on synthetic corpora with known duplicates."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the tall green trees"
)


@pytest.fixture(scope="module")
def corpus(spark):
    words = BASE.split()
    docs = [(0, BASE)]
    # near-dup of 0: one word changed
    w = words.copy()
    w[5] = "under"
    docs.append((1, " ".join(w)))
    # exact dup of 0
    docs.append((2, BASE))
    # unrelated docs
    docs.append((3, "completely different content about spark query engines and shuffles"))
    docs.append((4, "parquet files columnar storage predicate pushdown row groups statistics"))
    # near-dup of 3
    docs.append((5, "completely different content about spark query engines and planners"))
    return spark.createDataFrame(docs, ["doc_id", "text"])


def exact_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + k]) for i in range(max(len(w) - k + 1, 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark, corpus):
    out = dedup.exact_dedup(corpus, ["text"], "doc_id").toPandas()
    assert len(out) == 5  # 6 docs, one exact dup collapses
    grp = out[out.n_copies == 2]
    assert len(grp) == 1 and grp.iloc[0].keeper_id == 0
    # both modes return the same schema and groups
    raw = dedup.exact_dedup(corpus, ["text"], "doc_id", hash_key=False).toPandas()
    assert list(raw.columns) == list(out.columns) == ["keeper_id", "n_copies"]
    assert sorted(map(tuple, raw.values.tolist())) == sorted(map(tuple, out.values.tolist()))


def test_exact_dedup_multicol_separator_injective(spark):
    # values containing the old separator byte must NOT merge distinct
    # key tuples: ('x\x1fvy','z') vs ('x','y\x1fvz') are different keys
    rows = [(1, "x\x1fvy", "z"), (2, "x", "y\x1fvz"), (3, None, ""), (4, "", None)]
    df = spark.createDataFrame(rows, "id bigint, a string, b string")
    out = dedup.exact_dedup(df, ["a", "b"], "id").toPandas()
    assert len(out) == 4  # four distinct keys, no collisions
    assert (out.n_copies == 1).all()


def test_minhash_finds_near_dups(spark, corpus):
    pairs = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", threshold=0.3, num_hashes=64, bands=16
    ).toPandas()
    found = {tuple(sorted((r.id_a, r.id_b))) for r in pairs.itertuples()}
    assert (0, 2) in found  # exact dup: jaccard 1.0
    assert (0, 1) in found or (1, 2) in found  # near dup
    assert (3, 5) in found
    # unrelated docs must not pair with the fox corpus
    assert not any({a, b} & {3, 4, 5} and {a, b} & {0, 1, 2} for a, b in found)


def test_minhash_estimates_jaccard(spark, corpus):
    rows = corpus.collect()
    texts = {r.doc_id: r.text for r in rows}
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(sorted(texts), 2)], ["id_a", "id_b"]
    )
    sigs = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", threshold=0.0, num_hashes=128, bands=128
    ).toPandas()
    est = {(r.id_a, r.id_b): r.est_jaccard for r in sigs.itertuples()}
    for (a, b), e in est.items():
        true = exact_jaccard(texts[a], texts[b])
        assert abs(e - true) < 0.2, (a, b, e, true)


def test_ngram_jaccard_exact(spark, corpus):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["id_a", "id_b"])
    out = dedup.ngram_jaccard_pairs(corpus, pairs, "doc_id", "text").toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    texts = {r.doc_id: r.text for r in corpus.collect()}
    for (a, b), j in got.items():
        assert j == pytest.approx(exact_jaccard(texts[a], texts[b]))
    assert got[(0, 2)] == 1.0


def test_simhash_pairs(spark, corpus):
    out = dedup.simhash_pairs(corpus, "doc_id", "text", max_hamming=16).toPandas()
    found = {tuple(sorted((r.id_a, r.id_b))) for r in out.itertuples()}
    assert (0, 2) in found
    ham = {tuple(sorted((r.id_a, r.id_b))): r.hamming for r in out.itertuples()}
    assert ham[(0, 2)] == 0  # identical text → identical simhash


DIM = 16


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal((8, DIM))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        # near-dup: tiny perturbation → cosine ≈ 1
        rows.append((2 * i + 1, [float(x) for x in v + rng.standard_normal(DIM) * 0.01]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _np_cosine_pairs(rows, threshold):
    import numpy as np

    ids = [r.vec_id for r in rows]
    vs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    out = set()
    for a, b in itertools.combinations(sorted(ids), 2):
        va, vb = vs[a], vs[b]
        sim = float(va @ vb) / (float(np.linalg.norm(va)) * float(np.linalg.norm(vb)))
        if round(sim, 4) > threshold:
            out.add((a, b))
    return out


def test_embed_cosine_pairs_matches_numpy(spark, vectors):
    expected = _np_cosine_pairs(vectors.collect(), threshold=0.9)
    out = dedup.embed_cosine_pairs(vectors, "vec_id", "embedding", threshold=0.9).toPandas()
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert got == expected
    assert all(r.cos_sim > 0.9 for r in out.itertuples())
    # every planted perturbation pair must be found
    assert all((2 * i, 2 * i + 1) in got for i in range(8))


def test_embed_lsh_recall_and_precision(spark, vectors):
    exact = _np_cosine_pairs(vectors.collect(), threshold=0.9)
    out = dedup.embed_cosine_pairs_lsh(
        vectors, "vec_id", "embedding", threshold=0.9, dim=DIM, bands=8, rows_per_band=4
    ).toPandas()
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    # precision is exact by construction: every candidate is cosine-verified
    assert got <= exact
    # recall: near-identical pairs collide in some band with p≈0.998
    assert len(got & exact) >= len(exact) - 1


# ---------------------------------------------------------------------------
# degenerate-corpus guards


@pytest.fixture(scope="module")
def pathological(spark):
    # 1k identical short docs: every LSH bucket holds all 1000 ids →
    # uncapped candidate space is ~500k pairs from a single bucket
    return spark.createDataFrame(
        [(i, "same boilerplate text repeated") for i in range(1000)],
        ["doc_id", "text"],
    )


def test_minhash_hot_bucket_cap_bounds_candidates(spark, pathological):
    capped = dedup.minhash_lsh_pairs(
        pathological, "doc_id", "text", threshold=0.0, max_bucket_size=50
    )
    # every bucket is oversized → all dropped → no quadratic blow-up
    assert capped.count() == 0


def test_minhash_cap_no_op_on_normal_corpus(spark, corpus):
    plain = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", threshold=0.3, num_hashes=64, bands=16
    ).toPandas()
    capped = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", threshold=0.3, num_hashes=64, bands=16,
        max_bucket_size=100,
    ).toPandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values.tolist()))
    assert key(capped) == key(plain)


def test_simhash_hot_bucket_cap(spark, pathological, corpus):
    assert (
        dedup.simhash_pairs(
            pathological, "doc_id", "text", max_hamming=3, max_bucket_size=50
        ).count()
        == 0
    )
    plain = dedup.simhash_pairs(corpus, "doc_id", "text", max_hamming=16).toPandas()
    capped = dedup.simhash_pairs(
        corpus, "doc_id", "text", max_hamming=16, max_bucket_size=100
    ).toPandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values.tolist()))
    assert key(capped) == key(plain)


def test_embed_cosine_pairs_refuses_large_corpus(spark):
    big = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n²\\) baseline"):
        dedup.embed_cosine_pairs(big, "vec_id", "embedding", threshold=0.5, max_rows=10)
    # explicit opt-out still works
    out = dedup.embed_cosine_pairs(
        big, "vec_id", "embedding", threshold=0.5, max_rows=None
    )
    assert out.count() == 50 * 49 / 2


def test_setsim_prefix_matches_brute_force(spark):
    # lossless pruning: the prefix-filtered join must return EXACTLY
    # the brute-force τ-threshold pairs on a handmade corpus
    import itertools

    docs = {
        1: {"a", "b", "c", "d", "e"},
        2: {"a", "b", "c", "d", "f"},   # J(1,2)=4/6=0.667 ≥ 0.6
        3: {"a", "b", "c", "d", "e"},   # J(1,3)=1.0, J(2,3)=0.667
        4: {"x", "y", "z"},             # disjoint
        5: {"a", "x"},                  # low overlap with everything
    }
    rows = [(i, t) for i, ts in docs.items() for t in ts]
    tok = spark.createDataFrame(rows, "doc_id bigint, token string")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.setsim_join_prefix(tok, "doc_id", "token", 3, 5).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        if 5 * inter >= 3 * (len(docs[a]) + len(docs[b]) - inter):
            want.add((a, b))
    assert got == want and (1, 3) in got and (4, 5) not in got


# ---------------------------------------------------------------------------
# adaptive signature width (the fixed-bucket-count scale fix)


def test_adaptive_width_formula_matches_duckdb_law(spark):
    """The Python width r(n) and the DuckDB `nbits` CTE the oracles
    replay (queries/training.py::_duck_adaptive_band_ctes) must agree
    for EVERY corpus size — especially at the power-of-two boundaries
    where ceil(log2(·)) steps, and at the clamp edge."""
    import duckdb

    from demo_data_warehouse_spark.queries.training import _duck_adaptive_band_ctes

    rpb, ref_n, max_extra = 4, 2000, 8
    ctes = _duck_adaptive_band_ctes(
        bands=2, rows_per_band=rpb, dim=3, ref_n=ref_n, max_extra_bits=max_extra
    )
    con = duckdb.connect()
    sweep = [1, 3, 1999, 2000, 2001, 3999, 4000, 4001, 4096, 8000, 8001,
             60000, 511999, 512000, 512001, 5_000_000]
    import random

    sweep += random.Random(11).sample(range(1, 1_000_000), 20)
    for n in sweep:
        sql = (
            f"WITH e AS (SELECT range AS id, [0.1, 0.2, 0.3]::DOUBLE[] AS v "
            f"FROM range({n})),\n    {ctes}\n    SELECT r FROM nbits"
        )
        duck_r = con.execute(sql).fetchone()[0]
        py_r = dedup.adaptive_signature_width(n, rpb, ref_n, max_extra)
        assert duck_r == py_r, (n, duck_r, py_r)
    # monotone, base-anchored, clamped
    widths = [dedup.adaptive_signature_width(n, rpb, ref_n, max_extra)
              for n in range(1, 4_000_000, 997)]
    assert widths == sorted(widths)
    assert dedup.adaptive_signature_width(ref_n, rpb, ref_n, max_extra) == rpb
    assert (
        dedup.adaptive_signature_width(10**12, rpb, ref_n, max_extra)
        == rpb + max_extra
    )


def test_adaptive_width_prefix_layout_law(spark):
    """Widening the signature only APPENDS sign bits (band j always
    reads the same seeded stream block), so a band collision at width
    r+k implies one at width r: verified pairs must be NESTED as the
    forced width grows, and planted near-identical pairs must survive
    every width."""
    import numpy as np

    rng = np.random.RandomState(23)
    base = rng.standard_normal((60, DIM))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.standard_normal(DIM) * 0.01]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])  # n=120

    def pairs(ref_n):
        out = dedup.embed_cosine_pairs_lsh(
            df, "vec_id", "embedding", threshold=0.9, dim=DIM,
            bands=8, rows_per_band=4, ref_n=ref_n, max_extra_bits=8,
        ).toPandas()
        return {(r.id_a, r.id_b) for r in out.itertuples()}

    p_base = pairs(120)   # extra = 0 → r = 4 (exactly the tuned base)
    p_mid = pairs(30)     # extra = 2 → r = 6
    p_wide = pairs(1)     # extra = ceil(log2 120) = 7 → r = 11
    assert p_wide <= p_mid <= p_base
    planted = {(2 * i, 2 * i + 1) for i in range(60)}
    # r=11, b=8 still catches cos≈0.9999 pairs with p≈1 — demand all
    assert planted <= p_wide


def test_embed_lsh_null_vector_rows_are_inert(spark, vectors):
    """A null embedding (poison row, inevitable at corpus scale) must
    neither crash the Arrow batch (np.vstack) nor become a candidate:
    null buckets explode to zero rows, null cosines are SQL NULL (not
    NaN — Spark orders NaN above every number, so NaN would PASS a
    `> threshold` filter). Pairs must equal the clean-corpus run."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    poisoned = vectors.unionByName(
        spark.createDataFrame(
            [(999, None), (998, None), (997, [1.0, 2.0])], schema
        )  # 997 = wrong dimension (schema drift), equally inert
    )
    clean = dedup.embed_cosine_pairs_lsh(
        vectors, "vec_id", "embedding", threshold=0.9, dim=DIM
    ).toPandas()
    dirty = dedup.embed_cosine_pairs_lsh(
        poisoned, "vec_id", "embedding", threshold=0.9, dim=DIM
    ).toPandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values.tolist()))
    # n grows 16 -> 19 but stays <= ref_n, so the signature width — and
    # therefore the clean rows' buckets — are identical
    assert key(dirty) == key(clean)
