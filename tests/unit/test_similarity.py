"""Similarity search: brute-force top-k vs numpy; LSH bucket recall."""

from __future__ import annotations

import numpy as np
import pytest

from demo_data_warehouse_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    m = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in m[i]]) for i in range(len(m))]
    return m, spark.createDataFrame(rows, ["vec_id", "embedding"])


def numpy_topk(m, q, k):
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(m)), -sims))
    return [int(i) for i in order[:k]], sims


def test_cosine_topk_matches_numpy(spark, vecs):
    m, df = vecs
    q = [float(x) for x in m[0]]
    got = similarity.cosine_topk(df.where("vec_id <> 0"), "vec_id", "embedding", q, k=10).toPandas()
    m2 = np.vstack([m[1:]])
    ids = np.arange(1, len(m))
    sims = (m2.astype(np.float64) @ np.asarray(q)) / (
        np.linalg.norm(m2.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    order = np.lexsort((ids, -sims))
    expect = [int(ids[i]) for i in order[:10]]
    assert list(got.vec_id) == expect
    np.testing.assert_allclose(
        got.cos_sim.to_numpy(), sims[order[:10]], rtol=1e-9
    )


def test_lsh_recall(spark, vecs):
    m, df = vecs
    q = [float(x) for x in m[0]]
    brute = set(
        similarity.cosine_topk(df.where("vec_id <> 0"), "vec_id", "embedding", q, k=5)
        .toPandas()
        .vec_id
    )
    got = similarity.cosine_topk_lsh(
        df.where("vec_id <> 0"), "vec_id", "embedding", q, dim=16, k=5, n_planes=2
    ).toPandas()
    # coarse buckets (2 planes → 4 buckets) must recover most of top-5
    assert len(set(got.vec_id) & brute) >= 3


def test_lsh_bucket_determinism(spark, vecs):
    _, df = vecs
    a = similarity.lsh_signatures(df, "vec_id", "embedding", dim=16, n_planes=8).toPandas()
    b = similarity.lsh_signatures(df, "vec_id", "embedding", dim=16, n_planes=8).toPandas()
    assert a.sort_values("id").bucket.tolist() == b.sort_values("id").bucket.tolist()


def test_ivf_assign_partitions_corpus(spark, vecs):
    _, df = vecs
    cents = similarity.ivf_train_centroids(df, "embedding", n_cells=4, sample_rows=100)
    assign = similarity.ivf_assign(df, "vec_id", "embedding", cents).toPandas()
    assert len(assign) == 200  # every vector lands in exactly one cell
    assert set(assign.cell) <= set(range(4))
    assert assign.cell.nunique() >= 2  # quantizer actually splits the space


def test_ivf_recall(spark, vecs):
    m, df = vecs
    q = [float(x) for x in m[0]]
    corpus = df.where("vec_id <> 0")
    brute = set(
        similarity.cosine_topk(corpus, "vec_id", "embedding", q, k=5).toPandas().vec_id
    )
    cents = similarity.ivf_train_centroids(corpus, "embedding", n_cells=4, sample_rows=100)
    got = similarity.cosine_topk_ivf(
        corpus, "vec_id", "embedding", q, cents, k=5, n_probe=2
    ).toPandas()
    # probing half the cells must recover most of the true top-5
    assert len(set(got.vec_id) & brute) >= 3


def test_ivf_indexed_matches_unindexed(spark, vecs, tmp_path):
    # the materialized-index probe must return exactly what the
    # semi-join probe returns for the same centroids and n_probe
    m, df = vecs
    q = [float(x) for x in m[0]]
    corpus = df.where("vec_id <> 0")
    cents = similarity.ivf_train_centroids(corpus, "embedding", n_cells=4, sample_rows=100)
    direct = similarity.cosine_topk_ivf(
        corpus, "vec_id", "embedding", q, cents, k=5, n_probe=2
    ).toPandas()
    idx = str(tmp_path / "ivf")
    similarity.ivf_write_index(corpus, "vec_id", "embedding", cents, idx)
    indexed = similarity.cosine_topk_ivf_indexed(
        spark, idx, "vec_id", "embedding", q, cents, k=5, n_probe=2
    ).toPandas()
    assert list(indexed.vec_id) == list(direct.vec_id)
    np.testing.assert_allclose(indexed.cos_sim.to_numpy(), direct.cos_sim.to_numpy(), rtol=1e-12)


def test_ivf_centroids_deterministic(spark, vecs):
    _, df = vecs
    a = similarity.ivf_train_centroids(df, "embedding", n_cells=4, sample_rows=100)
    b = similarity.ivf_train_centroids(df, "embedding", n_cells=4, sample_rows=100)
    assert a == b


def test_l2_normalize_unit_norm_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    got = {r.vec_id: r for r in similarity.l2_normalize(df, "vec_id", "embedding").collect()}
    assert got[1].norm == 5.0 and got[1].unit == [0.6, 0.8]
    assert got[2].norm == 0.0 and got[2].unit == [0.0, 0.0]  # no NaN


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r for r in similarity.quantize_int8(df, "vec_id", "embedding").collect()}
    assert got[1].qvec == [127, -64, 32]  # HALF_UP away from zero
    assert all(-127 <= q <= 127 for q in got[1].qvec)
    # dequantized values within one quantization step of the input
    step = got[1].scale
    for orig, q in zip([1.0, -0.5, 0.25], got[1].qvec):
        assert abs(q * step - orig) <= step / 2 + 1e-9
    assert got[2].scale == 0.0 and got[2].qvec == [0, 0, 0]


def test_semantic_dup_flags_within_cell_only(spark):
    # axis-aligned centroids; v1/v2 share cell 0 at cos≈1 → higher id
    # flagged; v3 alone in cell 1; v4 joins cell 1 but is ~orthogonal
    # to v3 so it survives
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.01]),
            (2, [2.0, 0.02]),
            (3, [0.01, 1.0]),
            (4, [-1.0, 0.05]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = {
        r["id"]: (r["cell"], r["is_dup"])
        for r in similarity.semantic_dup_flags(
            df, "vec_id", "embedding", cents, 0.9
        ).collect()
    }
    assert got[1] == (0, False)
    assert got[2] == (0, True)  # lower-id twin exists in its cell
    assert got[3][1] is False
    assert got[4][1] is False  # same cell as 3, but far below threshold


def test_pca_fit_project_contracts(spark, sf_dir):
    # the four contracts rows-only checking can't see: orthonormal
    # basis, descending explained variance, bounded reconstruction
    # error, and a partitioning-independent, sign-deterministic fit
    import numpy as np

    from demo_data_warehouse_spark.catalog import table
    from demo_data_warehouse_spark.operators.similarity import pca_fit_project

    emb = table(spark, sf_dir, "embeddings")
    comps, projected = pca_fit_project(emb, "vec_id", "embedding", k=4)
    # orthonormality
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    # sign rule: the largest-|coeff| entry of each component is positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # explained variance decreasing: projection variances sorted desc
    P = np.array([r.proj for r in projected.collect()])
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))
    # top-k must beat the uniform k/d variance share (the corpus is
    # near-isotropic synthetic data, so "most of the variance" is not
    # attainable — beating uniform by 20% proves the fit found the
    # principal directions)
    X = np.array([r.embedding for r in emb.select("embedding").collect()], dtype=float)
    Xc = X - X.mean(axis=0)
    assert var.sum() > 1.2 * (4 / 64) * Xc.var(axis=0).sum()
    # refit on a repartitioned frame: identical basis bit-for-bit
    comps2, _ = pca_fit_project(emb.repartition(7), "vec_id", "embedding", k=4)
    assert np.array_equal(comps, comps2)


def test_ivf_assign_matches_maxby_join_law(spark):
    # equivalence law for the map-only Arrow argmax assignment: on
    # randomized vectors (including exact duplicates of a centroid and
    # scaled copies that tie on cosine) it must agree cell-for-cell
    # with the reference broadcast-join + max_by((sim, cell)) plan it
    # replaced — same fold arithmetic, same higher-cell tie-break.
    import numpy as np

    from demo_data_warehouse_spark.operators import similarity
    from demo_data_warehouse_spark.operators.similarity import (
        cosine_sim_col,
        ivf_assign,
    )

    rng = np.random.RandomState(7)
    dim, k_cells, n = 16, 9, 300
    cents = [[float(x) for x in rng.standard_normal(dim)] for _ in range(k_cells)]
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]
    # adversarial rows: exact centroid copies and positive scalings
    # (cosine ties across NO two cells here, but exact hits stress the
    # boundary sims==1.0 path); plus a duplicated centroid pair that
    # DOES tie two cells on every query
    cents.append(list(cents[0]))  # cells 0 and 9 are identical → ties
    k_cells += 1
    rows += [(n + j, list(cents[j % len(cents)])) for j in range(20)]
    rows += [(n + 20 + j, [2.5 * x for x in cents[j % len(cents)]]) for j in range(20)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    got = {
        r["id"]: r["cell"]
        for r in ivf_assign(df, "vec_id", "embedding", cents).collect()
    }

    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, cvec array<double>"
    )
    from pyspark.sql import functions as F

    sim = cosine_sim_col(F.col("embedding"), F.col("cvec"))
    ref = {
        r["id"]: r["cell"]
        for r in (
            df.crossJoin(F.broadcast(cent_df))
            .select(F.col("vec_id").alias("id"), "cell", sim.alias("sim"))
            .groupBy("id")
            .agg(F.max_by("cell", F.struct("sim", "cell")).alias("cell"))
        ).collect()
    }
    assert got == ref
    # the duplicated centroid must resolve to the HIGHER cell id
    assert got[n] == k_cells - 1


def test_lsh_signatures_matches_fold_law(spark):
    # equivalence law for the Arrow-batched sign projections: bucket
    # bit i must equal the interpreted fold's sign of dot(v, plane_i)
    # for randomized vectors, including all-zero vectors (dot == 0.0 is
    # NOT > 0 → bit 0 on both paths).
    import numpy as np

    from demo_data_warehouse_spark.operators.similarity import (
        _as_double,
        _dot,
        lsh_signatures,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    dim, n_planes, n = 12, 10, 200
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]
    rows.append((n, [0.0] * dim))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    got = {
        r["id"]: r["bucket"]
        for r in lsh_signatures(
            df, "vec_id", "embedding", dim=dim, n_planes=n_planes, seed=42
        ).collect()
    }

    planes = np.random.RandomState(42).standard_normal((n_planes, dim))
    bits = [
        F.when(
            _dot(
                _as_double(F.col("embedding")),
                F.array(*[F.lit(float(v)) for v in p]),
            )
            > 0,
            1,
        )
        .otherwise(0)
        .cast("bigint")
        for p in planes
    ]
    bucket = bits[0]
    for i, b in enumerate(bits[1:], start=1):
        bucket = bucket + (b * (1 << i))
    ref = {
        r["id"]: r["bucket"]
        for r in df.select(F.col("vec_id").alias("id"), bucket.alias("bucket")).collect()
    }
    assert got == ref
    assert got[n] == 0  # zero vector: every projection 0.0 → no bits


def test_null_vectors_inert_in_lsh_ivf_and_cosine(spark, vecs):
    """Null embeddings must be inert, not fatal, in every Arrow-batched
    vector path: lsh_signatures emits a NULL bucket, ivf_assign a NULL
    cell, cosine_batch a true SQL NULL similarity (never NaN, which
    Spark orders above all numbers and would pass threshold filters)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    _, vdf = vecs
    poisoned = vdf.unionByName(
        spark.createDataFrame([(999, None), (998, [1.0, 2.0])], schema)
    )  # 998 = wrong dimension (schema drift), equally inert

    sigs = similarity.lsh_signatures(poisoned, "vec_id", "embedding", dim=16)
    for pid in (999, 998):
        row = sigs.where(F.col("id") == pid).collect()
        assert len(row) == 1 and row[0]["bucket"] is None
    assert sigs.where("id NOT IN (999, 998) AND bucket IS NULL").count() == 0

    cents = similarity.ivf_train_centroids(vdf, "embedding", n_cells=8)
    cells = similarity.ivf_assign(poisoned, "vec_id", "embedding", cents)
    for pid in (999, 998):
        assert cells.where(F.col("id") == pid).collect()[0]["cell"] is None
    assert cells.where("id NOT IN (999, 998) AND cell IS NULL").count() == 0

    a = poisoned.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = vdf.limit(1).select(F.col("embedding").alias("vb"))
    sims = a.crossJoin(b).select(
        "id_a", similarity.cosine_batch(F.col("va"), F.col("vb")).alias("s")
    )
    for pid in (999, 998):
        assert sims.where(F.col("id_a") == pid).collect()[0]["s"] is None
    # the filter semantics that motivated NULL-not-NaN:
    assert sims.where(F.col("s") > -2.0).where(F.col("id_a").isin(999, 998)).count() == 0


def test_seed_collect_guard_bounds_driver_collects(spark, vecs):
    """The quantizer seed collect has an explicit ceiling: within the
    bound the guard is a passthrough; above it, every seed-collecting
    build path raises BEFORE moving rows (sqrt(n) IVF sizing crosses the
    bound around 4e9 vectors — a 1e12-row corpus must cap cells or
    broadcast-join centroids, not OOM the driver)."""
    import pytest

    assert similarity.seed_collect_guard(8, "t") == 8
    assert similarity.seed_collect_guard(similarity.SEED_COLLECT_MAX, "t") == (
        similarity.SEED_COLLECT_MAX
    )
    with pytest.raises(RuntimeError, match="driver-collect bound"):
        similarity.seed_collect_guard(similarity.SEED_COLLECT_MAX + 1, "t")

    _, vdf = vecs
    with pytest.raises(RuntimeError, match="kmeans_fixed seeds"):
        similarity.kmeans_fixed(
            vdf, "vec_id", "embedding", dim=16, k=similarity.SEED_COLLECT_MAX + 1
        )
    with pytest.raises(RuntimeError, match="ivf_train_centroids sample"):
        similarity.ivf_train_centroids(
            vdf, "embedding", n_cells=8, sample_rows=similarity.SEED_COLLECT_MAX + 1
        )
