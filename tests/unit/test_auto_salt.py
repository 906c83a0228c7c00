"""Measured-skew auto-salting (S127).

The "skew fixture ⇒ k>1" expectation lives HERE, against a synthetic
hot-key fixture — never inside the registry query, where it would
couple correctness to the scale factor (the round-3 sf0.001 crash).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_data_warehouse_spark.queries.relational_ext import derive_salt_factor


def test_derive_salt_factor_uniform_is_one():
    # below target → k=1, the plan-identical no-op path
    assert derive_salt_factor(1, target=2000) == 1
    assert derive_salt_factor(1999, target=2000) == 1
    assert derive_salt_factor(2000, target=2000) == 1


def test_derive_salt_factor_skew_splits():
    assert derive_salt_factor(2001, target=2000) == 2
    assert derive_salt_factor(10_000, target=2000) == 5
    assert derive_salt_factor(63_999, target=2000) == 32


def test_derive_salt_factor_capped():
    assert derive_salt_factor(10**9, target=2000) == 32
    assert derive_salt_factor(10**9, target=2000, cap=64) == 64


def test_synthetic_hot_key_derives_k_gt_1_and_matches_plain_join(spark):
    # one hot key (5000 rows) + a cold tail: measured census must derive
    # k>1 and the salted join must equal the plain join row-for-row.
    rows = spark.range(5200).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 5000, F.lit("hot")).otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 4).cast("string"))
        ).alias("k"),
    )
    dim = spark.createDataFrame(
        [("hot", 7), ("cold_0", 1), ("cold_1", 2), ("cold_2", 3), ("cold_3", 4)],
        "k string, rate int",
    )
    hist = rows.groupBy("k").count().collect()
    k = derive_salt_factor(max(r["count"] for r in hist), target=2000)
    assert k > 1, "synthetic hot key must trigger salting"

    salted_dim = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    salted = (
        rows.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(k)).cast("int"))
        .join(F.broadcast(salted_dim), ["k", "salt"])
        .select("event_id", "k", "rate")
    )
    plain = rows.join(F.broadcast(dim), "k").select("event_id", "k", "rate")
    assert salted.count() == plain.count() == 5200
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_join_auto_salt_runs_at_smoke_scale(spark):
    # the round-3 regression: the registry query must run at ANY sf,
    # including the sf0.001 smoke scale where no key crosses the target
    # and k degenerates to 1.
    import __spark_entry__ as m

    df = m.queries()["join_auto_salt"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
