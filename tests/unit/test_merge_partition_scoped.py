"""Partition-scoped MERGE: untouched partitions' files never move
(SURVEY §2.1 S4; reference dags/utils/common/data_helper.py:76-106 —
BigQuery merges the delta into the table, it never rewrites the table).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from demo_data_warehouse_spark.io import Warehouse


def _part_files(root: str, db: str, table: str) -> dict[str, dict[str, tuple]]:
    """{partition_dir: {filename: (inode, mtime_ns, size)}}"""
    base = os.path.join(root, db, table)
    out: dict[str, dict[str, tuple]] = {}
    for name in sorted(os.listdir(base)):
        d = os.path.join(base, name)
        if not (name.startswith("partition_value=") and os.path.isdir(d)):
            continue
        files = {}
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                st = os.stat(os.path.join(d, fn))
                files[fn] = (st.st_ino, st.st_mtime_ns, st.st_size)
        out[name] = files
    return out


def _seed(spark, wh, n_parts=10):
    rows = [
        (i * 100 + j, f"v{i}", dt.date(2024, 1, 1 + i))
        for i in range(n_parts)
        for j in range(5)
    ]
    df = spark.createDataFrame(rows, ["pk", "v", "partition_value"])
    wh.merge_write(df, "silver", "t", ["pk"], "2024-01-01")
    return df


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    _seed(spark, wh)
    before = _part_files(str(tmp_path), "silver", "t")
    assert len(before) == 10
    # delta: update one key in partition 2024-01-06 + one net-new key there
    delta = spark.createDataFrame(
        [(500, "V5", dt.date(2024, 1, 6)), (999, "NEW", dt.date(2024, 1, 6))],
        ["pk", "v", "partition_value"],
    )
    wh.merge_write(delta, "silver", "t", ["pk"], "2024-01-06")
    after = _part_files(str(tmp_path), "silver", "t")
    touched = "partition_value=2024-01-06"
    for part, files in before.items():
        if part == touched:
            continue
        assert after[part] == files, f"untouched {part} was rewritten"
    got = wh.read("silver", "t")
    assert got.where("pk = 500").select("v").collect()[0][0] == "V5"
    assert got.where("pk = 999").count() == 1
    assert got.count() == 51


def test_merge_key_moving_partition_touches_both(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    _seed(spark, wh)
    before = _part_files(str(tmp_path), "silver", "t")
    # pk=300 lives in 2024-01-04; delta moves it to 2024-01-09
    delta = spark.createDataFrame(
        [(300, "moved", dt.date(2024, 1, 9))], ["pk", "v", "partition_value"]
    )
    wh.merge_write(delta, "silver", "t", ["pk"], "2024-01-09")
    after = _part_files(str(tmp_path), "silver", "t")
    for part, files in before.items():
        if part in ("partition_value=2024-01-04", "partition_value=2024-01-09"):
            continue
        assert after[part] == files, f"untouched {part} was rewritten"
    got = wh.read("silver", "t")
    rows = got.where("pk = 300").select("v", "partition_value").collect()
    assert len(rows) == 1 and rows[0][0] == "moved"
    assert rows[0][1] == dt.date(2024, 1, 9)
    # old partition keeps its other rows, loses pk=300
    assert got.where("partition_value = '2024-01-04'").count() == 4


def test_merge_fully_drained_partition_removed(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    rows = [(i, "a", dt.date(2024, 1, 1)) for i in range(3)] + [
        (100 + i, "b", dt.date(2024, 1, 2)) for i in range(3)
    ]
    wh.merge_write(
        spark.createDataFrame(rows, ["pk", "v", "partition_value"]),
        "silver", "t2", ["pk"], "2024-01-01",
    )
    # delta pulls ALL of 2024-01-01's keys into 2024-01-02
    delta = spark.createDataFrame(
        [(i, "A", dt.date(2024, 1, 2)) for i in range(3)],
        ["pk", "v", "partition_value"],
    )
    wh.merge_write(delta, "silver", "t2", ["pk"], "2024-01-02")
    parts = _part_files(str(tmp_path), "silver", "t2")
    assert "partition_value=2024-01-01" not in parts
    got = wh.read("silver", "t2")
    assert got.count() == 6
    assert got.where("partition_value = '2024-01-01'").count() == 0


def test_merge_replay_idempotent_on_disk(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    _seed(spark, wh)
    delta = spark.createDataFrame(
        [(500, "V5", dt.date(2024, 1, 6))], ["pk", "v", "partition_value"]
    )
    wh.merge_write(delta, "silver", "t", ["pk"], "2024-01-06")
    rows1 = {tuple(r) for r in wh.read("silver", "t").select("pk", "v").collect()}
    wh.merge_write(delta, "silver", "t", ["pk"], "2024-01-06")
    rows2 = {tuple(r) for r in wh.read("silver", "t").select("pk", "v").collect()}
    assert rows1 == rows2


def test_swap_crash_recovery_restores_old(spark, tmp_path):
    """Crash window between the two compact renames: only .old remains.
    read() must restore it, not bootstrap an empty table."""
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a")], ["pk", "v"])
    wh.merge_write(df.withColumn("partition_value", F.lit("2024-01-01").cast("date")),
                   "silver", "t3", ["pk"], "2024-01-01")
    final = wh.path("silver", "t3")
    os.rename(final, final + ".old")  # simulate crash after rename #1
    got = wh.read("silver", "t3", schema=df.schema)
    assert got.count() == 1  # restored, not an empty bootstrap
    assert os.path.isdir(final) and not os.path.isdir(final + ".old")


def test_swap_debris_cleaned_when_final_present(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a")], ["pk", "v"])
    wh.merge_write(df.withColumn("partition_value", F.lit("2024-01-01").cast("date")),
                   "silver", "t4", ["pk"], "2024-01-01")
    final = wh.path("silver", "t4")
    os.makedirs(final + ".old")  # simulate crash after swap, before cleanup
    assert wh.read("silver", "t4").count() == 1
    assert not os.path.isdir(final + ".old")


def test_compact_splits_large_partitions(spark, tmp_path):
    """ADVICE fix: a partition bigger than target_file_bytes must split
    into ~ceil(bytes/target) files, not collapse to one."""
    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 20_000).select(
        F.col("id").alias("pk"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    wh.write_partition_replace(df.repartition(40), "silver", "big", "2024-01-01")
    base = wh.path("silver", "big")
    pdir = os.path.join(base, "partition_value=2024-01-01")
    part_bytes = sum(
        os.path.getsize(os.path.join(pdir, n))
        for n in os.listdir(pdir)
        if n.endswith(".parquet")
    )
    target = max(1, part_bytes // 4)  # expect ~4-5 files after compaction
    stats = wh.compact("silver", "big", target_file_bytes=target)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] >= 3, "large partition collapsed instead of splitting"
    got = {tuple(r) for r in wh.read("silver", "big").select("pk", "payload").collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want
