"""HLL sketch rollup (agg_sketch_rollup): the contracts rows-only
checking can't see — merge-of-parts equals sketch-of-whole exactly in
the SPARSE regime (DataSketches HLL is hash-deterministic, no RNG; the
sf0.001 fixture stays sparse — past sparse promotion the two builds can
differ inside the error envelope, observed at sf0.1, which is why the
in-query law is the 2% consistency verdict, not equality), and the
estimate lands inside a tight envelope of the exact distinct count."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_merge_of_parts_equals_sketch_of_whole_sparse_regime(spark, sf_dir):
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
    # distincts overlap across days: the total is bounded by the sum
    assert rows["ALL"].exact_users <= sum(rows[d].exact_users for d in days)
    assert rows["ALL"].exact_users >= max(rows[d].exact_users for d in days)
    # the tolerance-twin verdicts the oracle pins must hold everywhere
    assert all(rows[d].within_tolerance for d in rows)
    assert all(rows[d].merge_consistent for d in rows)
