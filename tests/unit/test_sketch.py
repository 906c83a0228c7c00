"""HLL sketch rollup (agg_sketch_rollup): the two contracts rows-only
checking can't see — merge-of-parts equals sketch-of-whole exactly
(DataSketches HLL is hash-deterministic, no RNG), and the estimate
lands inside a tight envelope of the exact distinct count."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_merge_of_parts_equals_sketch_of_whole(spark, sf_dir):
    from demo_data_warehouse_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    whole = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"))
        ).alias("est")
    ).collect()[0].est
    merged = (
        ev.groupBy(F.col("ts").cast("date"))
        .agg(F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == whole, (merged, whole)
    # and partitioning cannot change the answer either
    repart = ev.repartition(13).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"))
        ).alias("est")
    ).collect()[0].est
    assert repart == whole


def test_estimate_within_envelope(spark, sf_dir):
    from demo_data_warehouse_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    est = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"))
        ).alias("est")
    ).collect()[0].est
    assert abs(est - exact) <= max(2, 0.02 * exact), (est, exact)


def test_rollup_query_total_row(spark, sf_dir):
    import __spark_entry__ as m

    rows = {r.day: r for r in m.queries()["agg_sketch_rollup"](spark, sf_dir).collect()}
    assert "ALL" in rows
    days = [d for d in rows if d != "ALL"]
    assert rows["ALL"].n_events == sum(rows[d].n_events for d in days)
    # union estimate can't undercut any single day's estimate
    assert rows["ALL"].est_users >= max(rows[d].est_users for d in days)
