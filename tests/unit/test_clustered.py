"""Range-clustered writes: disjoint per-file min/max footer stats (the
file-skipping contract) and pushed range predicates."""

import glob
import os

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


def test_zorder_files_skippable_in_both_dims(spark, tmp_path):
    """Z-ordered files must carry stat rectangles that let a 2-D box
    skip most files — including boxes on the SECOND dimension, where
    lexicographic range clustering cannot skip at all."""
    import pyarrow.parquet as pq

    from demo_data_warehouse_spark.catalog import table as cat_table
    from demo_data_warehouse_spark.io import Warehouse

    wh = Warehouse(spark, str(tmp_path / "whz"))
    ev = cat_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    wh.write_zordered(
        ev, "silver", "ez",
        [("user_id", 0, 150), ("value", 0.0, 500.0)],
        bits=12, n_files=16,
    )
    root = wh.path("silver", "ez")
    rects = []
    for f in os.listdir(root):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(root, f))
        los, his = {}, {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in ("user_id", "value") and col.statistics is not None:
                    st = col.statistics
                    los[name] = min(los.get(name, st.min), st.min)
                    his[name] = max(his.get(name, st.max), st.max)
        rects.append((los, his))
    assert len(rects) >= 8

    def intersects(lo, hi, blo, bhi):
        return not (hi < blo or lo > bhi)

    # 2-D box: a file survives only if its rectangle meets BOTH ranges
    box_hits = [
        r for r in rects
        if intersects(r[0]["user_id"], r[1]["user_id"], 30, 60)
        and intersects(r[0]["value"], r[1]["value"], 20.0, 60.0)
    ]
    assert len(box_hits) < len(rects) / 2, (
        f"Z-order should skip most files for a small 2-D box: "
        f"{len(box_hits)}/{len(rects)} files intersect"
    )
    # second-dimension-only predicate also skips: value stats must not
    # all span the full range (the lexicographic-clustering failure mode)
    val_hits = [r for r in rects if intersects(r[0]["value"], r[1]["value"], 20.0, 60.0)]
    assert len(val_hits) < len(rects), "value-only predicate skipped nothing"
