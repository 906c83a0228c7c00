"""Range-clustered writes: disjoint per-file min/max footer stats (the
file-skipping contract) and pushed range predicates."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from demo_data_warehouse_spark.catalog import table
from demo_data_warehouse_spark.io import Warehouse


def _file_ranges(path, col):
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        mn, mx = None, None
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(_col_index(md, col)).statistics
            assert stats is not None and stats.has_min_max
            mn = stats.min if mn is None else min(mn, stats.min)
            mx = stats.max if mx is None else max(mx, stats.max)
        ranges.append((mn, mx))
    return ranges


def _col_index(md, name):
    schema = md.schema
    for i in range(len(schema)):
        if schema.column(i).name == name:
            return i
    raise KeyError(name)


def test_clustered_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    wh.write_clustered(ev, "silver", "ev", ["ts"], n_files=6)
    ranges = _file_ranges(wh.path("silver", "ev"), "ts")
    assert len(ranges) >= 2
    # sort by min; each file's max must not exceed the next file's min
    # (boundary equality allowed): pairwise-disjoint = skippable
    ranges.sort()
    for (_, amax), (bmin, _) in zip(ranges, ranges[1:]):
        assert amax <= bmin, ranges


def test_range_filter_touches_few_files(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    wh.write_clustered(ev, "silver", "ev", ["ts"], n_files=6)
    ranges = _file_ranges(wh.path("silver", "ev"), "ts")
    import datetime as dt

    # footer stats come back UTC-aware (isAdjustedToUTC micros)
    utc = dt.timezone.utc
    lo, hi = dt.datetime(2024, 1, 10, tzinfo=utc), dt.datetime(2024, 1, 11, tzinfo=utc)
    touched = [r for r in ranges if not (r[1] < lo or r[0] >= hi)]
    # the one-day window must intersect a strict minority of files —
    # the stats alone prove most of the table is skippable
    assert len(touched) < len(ranges) / 2, ranges


def test_clustered_read_pushes_range_predicate(spark, sf_dir, tmp_path):
    from demo_data_warehouse_spark.plans.checks import physical_plan

    wh = Warehouse(spark, str(tmp_path))
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    wh.write_clustered(ev, "silver", "ev", ["ts"], n_files=6)
    out = wh.read("silver", "ev").where(
        F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp")
    )
    plan = physical_plan(out)
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan, plan
