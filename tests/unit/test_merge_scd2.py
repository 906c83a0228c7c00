"""MERGE upsert semantics + SCD2 invariants (SURVEY §5 leg B core)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators.merge import merge_upsert
from demo_data_warehouse_spark.operators.scd2 import SENTINEL_TS, scd2_delta, surrogate_id


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_merge_update_insert_keep(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["pk", "v"])
    source = spark.createDataFrame([(2, "B"), (4, "D")], ["pk", "v"])
    got = {(r.pk, r.v) for r in merge_upsert(target, source, ["pk"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_merge_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["pk", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["pk", "v"])
    once = merge_upsert(target, source, ["pk"])
    twice = merge_upsert(once, source, ["pk"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_merge_missing_key_raises(spark):
    target = spark.createDataFrame([(1, "a")], ["pk", "v"])
    source = spark.createDataFrame([(1, "a")], ["pk", "v"])
    with pytest.raises(ValueError):
        merge_upsert(target, source, ["nope"])


@pytest.fixture()
def dim_and_batch(spark):
    # current dim: users u1 (old ts), u2 (same ts as batch → untouched),
    # u3 absent from batch
    mk = lambda u, t, v: (u, v, ts(t))
    dim_rows = [mk("u1", "2024-01-01T10:00:00", 10.0), mk("u2", "2024-01-05T10:00:00", 20.0), mk("u3", "2024-01-02T10:00:00", 30.0)]
    dim = (
        spark.createDataFrame(dim_rows, ["user_id", "value", "ts"])
        .select(
            "user_id",
            surrogate_id("user_id", "ts").alias("sur_id"),
            "value",
            "ts",
            F.col("ts").alias("valid_from"),
            F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    batch_rows = [
        mk("u1", "2024-01-10T10:00:00", 11.0),  # changed → version + close
        mk("u2", "2024-01-05T10:00:00", 21.0),  # same ts → no-op
        mk("u4", "2024-01-11T10:00:00", 40.0),  # net new
    ]
    batch = spark.createDataFrame(batch_rows, ["user_id", "value", "ts"])
    return dim, batch


def test_scd2_delta_rows(spark, dim_and_batch):
    dim, batch = dim_and_batch
    delta = scd2_delta(dim, batch, key="user_id", ts_col="ts", attr_cols=["value"]).toPandas()
    by_kind = {(r.user_id, bool(r.is_current)): r for r in delta.itertuples()}
    # u4 net-new open; u1 new open version; u1 closed old; u2/u3 absent
    assert set(by_kind) == {("u4", True), ("u1", True), ("u1", False)}
    u1_closed = by_kind[("u1", False)]
    u1_open = by_kind[("u1", True)]
    # closed row keeps OLD surrogate id and OLD value, valid_to = new ts
    dim_pd = dim.toPandas()
    old_sur = dim_pd[dim_pd.user_id == "u1"].sur_id.iloc[0]
    assert u1_closed.sur_id == old_sur
    assert u1_closed.value == 10.0
    assert u1_closed.valid_to == ts("2024-01-10T10:00:00")
    # open row gets a fresh surrogate id and sentinel valid_to
    assert u1_open.sur_id != old_sur
    assert str(u1_open.valid_to) == "2099-01-01 12:00:00"


def test_scd2_merge_invariants(spark, dim_and_batch):
    """After merging the delta into the dim: exactly one is_current per key,
    contiguous valid_from/valid_to chains."""
    dim, batch = dim_and_batch
    delta = scd2_delta(dim, batch, key="user_id", ts_col="ts", attr_cols=["value"])
    merged = merge_upsert(dim, delta, keys=["sur_id"]).toPandas()
    cur = merged[merged.is_current]
    assert cur.groupby("user_id").size().max() == 1
    assert set(cur.user_id) == {"u1", "u2", "u3", "u4"}
    u1 = merged[merged.user_id == "u1"].sort_values("valid_from")
    assert len(u1) == 2
    assert u1.iloc[0].valid_to == u1.iloc[1].valid_from  # contiguous chain


def test_scd2_replay_idempotent(spark, dim_and_batch):
    """ST3: replaying the same batch produces no further changes."""
    dim, batch = dim_and_batch
    delta1 = scd2_delta(dim, batch, key="user_id", ts_col="ts", attr_cols=["value"])
    dim2 = merge_upsert(dim, delta1, keys=["sur_id"])
    delta2 = scd2_delta(dim2, batch, key="user_id", ts_col="ts", attr_cols=["value"])
    # same batch again: no changed keys, no net-new → empty delta
    assert delta2.count() == 0


def test_compact_reduces_files_keeps_data(spark, tmp_path):
    # streaming/merge sinks fragment tables; compact() must rewrite to
    # few files while keeping the data byte-identical (maintenance op).
    from demo_data_warehouse_spark.io import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 10_000).select(
        F.col("id").alias("pk"), (F.col("id") % 7).alias("v")
    )
    # fragment: 40 shuffle files in one partition dir
    wh.write_partition_replace(df.repartition(40), "silver", "frag", "2024-01-01")
    before = {tuple(r) for r in wh.read("silver", "frag").select("pk", "v").collect()}
    stats = wh.compact("silver", "frag")
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 4
    after = {tuple(r) for r in wh.read("silver", "frag").select("pk", "v").collect()}
    assert after == before
