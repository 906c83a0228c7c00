"""Deterministic sampling: stability under re-partitioning and exact
per-stratum sizes."""

from __future__ import annotations

from demo_data_warehouse_spark.operators.sampling import hash_split, stratified_sample


def test_hash_split_stable_under_repartition(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id bigint")
    a = {r.id: r.split for r in hash_split(df, "id").collect()}
    b = {r.id: r.split for r in hash_split(df.repartition(7), "id").collect()}
    assert a == b
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.02 < frac < 0.12  # ≈1/16


def test_stratified_sample_exact_sizes(spark):
    rows = [(i, "big") for i in range(200)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "id bigint, stratum string")
    out = stratified_sample(df, "stratum", "id", 10).toPandas()
    sizes = out.groupby("stratum").size().to_dict()
    assert sizes == {"big": 10, "small": 3}  # capped at stratum size
    # deterministic: same sample every run
    out2 = stratified_sample(df, "stratum", "id", 10).toPandas()
    assert sorted(out.id) == sorted(out2.id)
