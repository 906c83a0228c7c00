"""MERGE schema evolution: columns only ever ADD, nulls fill the gaps,
and untouched partitions' on-disk schema stays readable."""

import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.io import Warehouse
from demo_data_warehouse_spark.operators.merge import merge_upsert


def test_source_adds_column(spark):
    tgt = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    src = spark.createDataFrame([(2, "B", 9), (3, "C", 7)], "id bigint, v string, extra bigint")
    out = merge_upsert(tgt, src, ["id"], evolve_schema=True)
    assert out.columns == ["id", "v", "extra"]
    got = {r["id"]: (r["v"], r["extra"]) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("B", 9), 3: ("C", 7)}


def test_source_missing_column_survives(spark):
    tgt = spark.createDataFrame([(1, "a", 5)], "id bigint, v string, keepme bigint")
    src = spark.createDataFrame([(1, "A"), (2, "B")], "id bigint, v string")
    out = merge_upsert(tgt, src, ["id"], evolve_schema=True)
    got = {r["id"]: (r["v"], r["keepme"]) for r in out.collect()}
    # upserted rows null the column the delta lacks; it is NOT dropped
    assert got == {1: ("A", None), 2: ("B", None)}


def test_retype_conflict_raises(spark):
    tgt = spark.createDataFrame([(1, "a")], "id bigint, v string")
    src = spark.createDataFrame([(1, 2)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="retype"):
        merge_upsert(tgt, src, ["id"], evolve_schema=True)


def test_strict_mode_still_fails_on_missing_column(spark):
    tgt = spark.createDataFrame([(1, "a")], "id bigint, v string")
    src = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(Exception):
        merge_upsert(tgt, src, ["id"]).collect()


def test_warehouse_evolving_merge_keeps_old_partitions_readable(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-02")], "id bigint, v string, d string"
    ).withColumn("partition_value", F.col("d").cast("date")).drop("d")
    base.write.mode("overwrite").partitionBy("partition_value").parquet(
        wh.path("silver", "t")
    )
    delta = spark.createDataFrame(
        [(2, "Y", 99, "2024-01-02")], "id bigint, v string, extra bigint, d string"
    ).withColumn("partition_value", F.col("d").cast("date")).drop("d")
    wh.merge_write(delta, "silver", "t", keys=["id"], partition="2024-01-02",
                   evolve_schema=True)
    out = wh.read("silver", "t", merge_schema=True)
    got = {r["id"]: (r["v"], r["extra"]) for r in out.select("id", "v", "extra").collect()}
    # untouched 01-01 partition (old schema on disk) reads as null extra;
    # the merged row carries the new column
    assert got == {1: ("x", None), 2: ("Y", 99)}
    # and replaying the same delta is a no-op (idempotent under evolution)
    wh.merge_write(delta, "silver", "t", keys=["id"], partition="2024-01-02",
                   evolve_schema=True)
    out2 = wh.read("silver", "t", merge_schema=True)
    assert {r["id"]: (r["v"], r["extra"]) for r in out2.select("id", "v", "extra").collect()} == got
