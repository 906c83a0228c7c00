"""operators/ml.py + kmeans_fixed edge cases the registry queries can't
reach: hand-checkable fits, empty-cluster carry, degenerate corpora."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators.ml import (
    _tdiv,
    dbscan_lsh,
    logreg_gd_fixed,
    naive_bayes_fixed,
)
from demo_data_warehouse_spark.operators.similarity import kmeans_fixed


def test_tdiv_matches_sql_semantics():
    # SQL integer division truncates toward zero; python // floors
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3  # python -7 // 2 == -4
    assert _tdiv(7, -2) == -3
    assert _tdiv(-7, -2) == 3


def test_logreg_matches_numpy_replication(spark):
    rng = np.random.RandomState(0)
    x = rng.standard_normal((40, 4))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(int)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]], int(y[i])) for i in range(40)],
        "id bigint, vec array<double>, y int",
    )
    got = {
        r["j"]: r["w_micro"]
        for r in logreg_gd_fixed(df, "id", "vec", F.col("y"), dim=4, iters=2).collect()
    }

    # numpy replication of the exact fixed-point algorithm
    scale = 1_000_000
    xq = np.round(x * scale).astype(np.int64)
    w = np.zeros(4, dtype=np.int64)
    b = 0
    n = 40
    for _ in range(2):
        s = xq @ w
        z = s / float(scale) ** 2 + b / float(scale)
        p = 1.0 / (1.0 + np.exp(-z))
        # numpy rounds half-to-even; the engines round half-away — use
        # the same half-away rule explicitly
        r = np.array(
            [int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))
             for v in (p - y) * scale],
            dtype=np.int64,
        )
        g = r @ xq
        gb = int(r.sum())
        w = np.array([w[j] - _tdiv(int(g[j]), 2 * n * scale) for j in range(4)])
        b = b - _tdiv(gb, 2 * n)
    for j in range(4):
        assert got[j] == w[j], (j, got[j], w[j])
    assert got[4] == b
    # the fit must separate better than chance on this separable set
    assert got[5] >= 30


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # 3 coincident points + k=2: one seed wins every vector, the other
    # cluster goes empty and must carry its centroid (not crash/NaN)
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(3)] + [(99, [1.0, 1.0])],
        "id bigint, vec array<double>",
    )
    out = kmeans_fixed(df, "id", "vec", dim=2, k=2, iters=2)
    rows = out.collect()
    assert len(rows) == 4
    # all identical points land in one cluster at distance 0
    assert {r["d2"] for r in rows} == {0}
    assert len({r["cluster"] for r in rows}) == 1


def test_naive_bayes_separable_langs(spark):
    df = spark.createDataFrame(
        [
            (0, "aa bb aa", "x"),
            (1, "aa aa cc", "x"),
            (2, "zz yy zz", "y"),
            (3, "yy zz yy", "y"),
        ],
        "doc_id bigint, text string, lang string",
    )
    conf = {
        (r["true_label"], r["pred_label"]): r["n_docs"]
        for r in naive_bayes_fixed(df, "doc_id", "text", "lang").collect()
    }
    # fully separable vocab → perfect diagonal
    assert conf == {("x", "x"): 2, ("y", "y"): 2}


def test_dbscan_roles_on_synthetic_blob(spark):
    # one dense blob of 4 near-identical vectors + 3 isolated vectors
    base = np.zeros(8)
    base[0] = 1.0
    rows = []
    rng = np.random.RandomState(1)
    for i in range(4):
        rows.append((i, [float(v) for v in base + rng.standard_normal(8) * 0.01]))
    for i, far in enumerate(np.eye(8)[3:6] * -5.0):
        rows.append((10 + i, [float(v) for v in far]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["id"]: (r["role"], r["cluster"]) for r in
           dbscan_lsh(df, "vec_id", "embedding", dim=8, threshold=0.9,
                      min_pts=3, bands=4, rows_per_band=2).collect()}
    assert all(out[i] == ("core", 0) for i in range(4))
    assert all(out[10 + i][0] == "noise" for i in range(3))


def test_temperature_targets_cap_and_sum(spark):
    from demo_data_warehouse_spark.operators.sampling import temperature_targets

    df = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)],
        "id bigint, src string",
    )
    # no cap binding: targets sum exactly to the budget
    t = {r["source"]: r["target"] for r in
         temperature_targets(df, "src", budget=20, inv_temperature_pow=0.5).collect()}
    assert sum(t.values()) == 20
    assert t["small"] > 20 * 10 // 100  # sqrt scaling up-weights the small source
    # cap binding (uncapped small target would exceed n=10): documented
    # single-pass semantics — capped total comes in UNDER the budget
    t1 = {r["source"]: r["target"] for r in
          temperature_targets(df, "src", budget=50, inv_temperature_pow=0.5).collect()}
    assert t1["small"] == 10 and sum(t1.values()) <= 50
    # budget beyond the corpus: every target capped at n_i
    t2 = {r["source"]: r["target"] for r in
          temperature_targets(df, "src", budget=1000, inv_temperature_pow=0.5).collect()}
    assert t2 == {"big": 90, "small": 10}


def test_bm25_ignores_absent_terms(spark):
    from demo_data_warehouse_spark.operators.text import bm25_score

    df = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "cherry date")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           bm25_score(df, "doc_id", "text", ["apple", "zzz_unseen"]).collect()}
    assert set(out) == {0}
    assert out[0]["n_matched"] == 1 and out[0]["bm25_micro"] > 0


def test_business_days_formula_matches_brute_force(spark):
    # semantic check (the oracle only proves both engines run the same
    # formula): h(d) = 5·⌊(d+4)/7⌋ + min((d+4)%7, 5) vs a day walk
    from demo_data_warehouse_spark.queries import QUERIES, load_all

    load_all()

    def brute(d0, d1):
        return sum(1 for d in range(d0, d1) if (d + 4) % 7 < 5)

    rows = (
        QUERIES["fn_business_days"](spark, "/root/testdata/sf0.001")
        .limit(200)
        .collect()
    )
    import duckdb

    con = duckdb.connect()
    days = dict(
        con.execute(
            "SELECT o_orderkey, CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)"
            " FROM '/root/testdata/sf0.001/orders.parquet'"
        ).fetchall()
    )
    for r in rows:
        d0 = days[r["o_orderkey"]]
        d1 = d0 + 3 + (r["o_orderkey"] % 25)
        assert r["business_days"] == brute(d0, d1), (r, d0, d1)
