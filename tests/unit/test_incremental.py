"""Incremental rollup maintenance: state merging is order-independent,
tree-shaped merges equal serial merges, and finalize matches a direct
aggregate."""

from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators.incremental import (
    finalize_rollup,
    merge_partials,
    rollup_partials,
)


def _rows(df):
    return {
        tuple(r[k] for k in ("g", "n_rows", "sum_value", "avg_value", "min_value", "max_value"))
        for r in df.collect()
    }


def _facts(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def test_incremental_equals_full_recompute(spark):
    a = _facts(spark, [("x", 1.25), ("x", 2.75), ("y", 10.0)])
    b = _facts(spark, [("x", 4.0), ("z", 0.5)])
    merged = merge_partials(
        rollup_partials(a, ["g"], "v"), rollup_partials(b, ["g"], "v"), ["g"]
    )
    full = rollup_partials(a.unionByName(b), ["g"], "v")
    assert _rows(finalize_rollup(merged, ["g"])) == _rows(finalize_rollup(full, ["g"]))


def test_merge_is_commutative_and_tree_shaped(spark):
    parts = [
        rollup_partials(_facts(spark, [("x", float(i)), ("y", float(2 * i))]), ["g"], "v")
        for i in range(1, 5)
    ]
    serial = parts[0]
    for p in parts[1:]:
        serial = merge_partials(serial, p, ["g"])
    tree = merge_partials(
        merge_partials(parts[3], parts[2], ["g"]),
        merge_partials(parts[1], parts[0], ["g"]),
        ["g"],
    )
    assert _rows(finalize_rollup(serial, ["g"])) == _rows(finalize_rollup(tree, ["g"]))


def test_delta_only_group_appears(spark):
    stored = rollup_partials(_facts(spark, [("x", 1.0)]), ["g"], "v")
    delta = rollup_partials(_facts(spark, [("new", 7.5)]), ["g"], "v")
    out = finalize_rollup(merge_partials(stored, delta, ["g"]), ["g"])
    got = {r["g"]: (r["n_rows"], r["sum_value"]) for r in out.collect()}
    assert got == {"x": (1, 1.0), "new": (1, 7.5)}


def test_merge_never_reads_facts(spark):
    """The merge plan's leaves are the two partial tables — no fact scan."""
    stored = rollup_partials(_facts(spark, [("x", 1.0), ("x", 3.0)]), ["g"], "v")
    sp = stored.toPandas()
    # state alone is enough to continue: rebuild a frame from the saved
    # state (as a warehouse would after reading the gold partials table)
    revived = spark.createDataFrame(sp)
    delta = rollup_partials(_facts(spark, [("x", 5.0)]), ["g"], "v")
    out = finalize_rollup(merge_partials(revived, delta, ["g"]), ["g"])
    r = out.collect()[0]
    assert (r["n_rows"], r["sum_value"], r["min_value"], r["max_value"]) == (3, 9.0, 1.0, 5.0)


def test_exact_distinct_replay_is_idempotent(spark):
    from demo_data_warehouse_spark.operators.incremental import (
        distinct_state,
        finalize_distinct,
        merge_distinct_state,
    )

    a = _facts(spark, [("x", 1.0), ("x", 2.0), ("y", 1.0)])
    b = _facts(spark, [("x", 2.0), ("x", 3.0)])
    sa, sb = distinct_state(a, ["g"], "v"), distinct_state(b, ["g"], "v")
    once = merge_distinct_state(sa, sb)
    twice = merge_distinct_state(once, sb)  # replayed delta
    got_once = {r["g"]: r["n_distinct"] for r in finalize_distinct(once, ["g"]).collect()}
    got_twice = {r["g"]: r["n_distinct"] for r in finalize_distinct(twice, ["g"]).collect()}
    assert got_once == got_twice == {"x": 3, "y": 1}


def test_hll_incremental_matches_one_shot_and_near_exact(spark):
    from demo_data_warehouse_spark.operators.incremental import (
        finalize_hll,
        hll_partials,
        merge_hll,
    )

    rows = [("g", i % 500) for i in range(2000)] + [("h", i) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    half1 = df.where(F.col("v") < 250)
    half2 = df.where(F.col("v") >= 250)
    inc = finalize_hll(
        merge_hll(
            hll_partials(half1, ["g"], "v"), hll_partials(half2, ["g"], "v"), ["g"]
        ),
        ["g"],
    )
    one = finalize_hll(hll_partials(df, ["g"], "v"), ["g"])
    gi = {r["g"]: r["approx_distinct"] for r in inc.collect()}
    go = {r["g"]: r["approx_distinct"] for r in one.collect()}
    # Datasketches HLL union is not bit-identical to a one-shot sketch
    # (the union's target representation differs), so incremental vs
    # one-shot agree within sketch error, not exactly
    for g in go:
        assert abs(gi[g] - go[g]) / max(go[g], 1) < 0.03, (gi, go)
    # and the estimate is near the exact cardinalities (500, 100)
    assert abs(gi["g"] - 500) / 500 < 0.05 and abs(gi["h"] - 100) / 100 < 0.05


def test_rollup_merge_sink_multi_batch_and_replay(spark, tmp_path):
    """Two micro-batches accumulate; a REPLAYED batch (same id) is a
    no-op — the at-least-once foreachBatch contract cannot double-count
    because the applied batch id commits atomically with the state."""
    from demo_data_warehouse_spark.io import Warehouse
    from demo_data_warehouse_spark.operators.incremental import finalize_rollup
    from demo_data_warehouse_spark.streaming.pipeline import rollup_merge_sink

    wh = Warehouse(spark, str(tmp_path))
    sink = rollup_merge_sink(wh, "gold", "mv", ["g"], "v")
    b0 = _facts(spark, [("x", 1.0), ("y", 2.0)])
    b1 = _facts(spark, [("x", 3.0)])
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay after a simulated checkpoint rollback
    out = finalize_rollup(wh.read("gold", "mv"), ["g"])
    got = {r["g"]: (r["n_rows"], r["sum_value"]) for r in out.collect()}
    assert got == {"x": (2, 4.0), "y": (1, 2.0)}


def test_quantile_state_merge_equals_full(spark):
    from demo_data_warehouse_spark.operators.incremental import (
        finalize_quantile,
        merge_quantile_state,
        quantile_state,
    )

    a = _facts(spark, [("x", 1.2), ("x", 3.4), ("x", 9.9), ("y", 0.2)])
    b = _facts(spark, [("x", 5.1), ("y", 0.4), ("y", 0.6)])
    lo, w, nb = 0.0, 0.5, 40
    merged = merge_quantile_state(
        quantile_state(a, ["g"], "v", lo, w, nb),
        quantile_state(b, ["g"], "v", lo, w, nb),
        ["g"],
    )
    full = quantile_state(a.unionByName(b), ["g"], "v", lo, w, nb)
    got_m = {r.g: r.quantile_est for r in finalize_quantile(merged, ["g"], lo, w).collect()}
    got_f = {r.g: r.quantile_est for r in finalize_quantile(full, ["g"], lo, w).collect()}
    assert got_m == got_f
    # x values 1.2,3.4,5.1,9.9 → bins 2,6,10,19; cum 2 hits 2·cum>=total
    # → bin 6 midpoint (6+0.5)*0.5 = 3.25
    assert got_m["x"] == 3.25
    # y: 0.2,0.4,0.6 → bins 0,0,1; bin 0 cum 2, 2·2>=3 → midpoint 0.25
    assert got_m["y"] == 0.25


def test_quantile_saturates_out_of_range(spark):
    from demo_data_warehouse_spark.operators.incremental import (
        finalize_quantile,
        quantile_state,
    )

    df = _facts(spark, [("g", -5.0), ("g", -4.0), ("g", 99.0)])
    st = quantile_state(df, ["g"], "v", 0.0, 0.5, 10)
    bins = sorted((r.bin, r.n) for r in st.collect())
    assert bins == [(0, 2), (9, 1)]  # clamped into edge bins, visible
    est = finalize_quantile(st, ["g"], 0.0, 0.5).collect()[0].quantile_est
    assert est == 0.25  # median falls in the low edge bin


def test_cached_result_query_key_prevents_cross_serving(spark, tmp_path):
    # two DIFFERENT computations over the SAME inputs in one shared
    # cache_root: with distinct query_keys they fill separate entries;
    # re-asking with the same key hits the right one.
    import os

    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.io import cached_result

    tbl = str(tmp_path / "t")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(tbl)
    cache = str(tmp_path / "cache")
    os.makedirs(cache, exist_ok=True)

    def q_sum():
        return spark.read.parquet(tbl).agg(F.sum("v").alias("x"))

    def q_cnt():
        return spark.read.parquet(tbl).agg(F.count("*").alias("x"))

    r1, hit1 = cached_result(spark, [tbl], cache, q_sum, query_key="sum_v")
    r2, hit2 = cached_result(spark, [tbl], cache, q_cnt, query_key="count")
    assert not hit1 and not hit2  # distinct entries, no collision
    assert r1.collect()[0].x == 9900 and r2.collect()[0].x == 100
    r1b, hit1b = cached_result(spark, [tbl], cache, q_sum, query_key="sum_v")
    assert hit1b and r1b.collect()[0].x == 9900
    # the documented pitfall: same root, empty key → second query would
    # be served the FIRST query's materialized rows
    a, _ = cached_result(spark, [tbl], cache, q_sum)
    b, hb = cached_result(spark, [tbl], cache, q_cnt)
    assert hb and b.collect()[0].x == 9900  # cross-served — why query_key exists


def test_merge_on_read_crash_recovery(spark, tmp_path):
    # simulate the apply_deletes crash window: data renamed to .old,
    # staging not yet renamed in. The next read must restore .old
    # (rule: .old alone -> restore); post-swap debris is dropped.
    import os
    import shutil

    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.io import MergeOnReadTable

    t = MergeOnReadTable(spark, str(tmp_path / "mor"), "id")
    t.write(spark.range(50).withColumn("v", F.col("id") * 3))
    t.delete_keys(spark.range(5).select(F.col("id")))
    assert t.read().count() == 45
    # crash half-way: data -> data.old, no staging promoted
    os.rename(t.data_dir, t.data_dir + ".old")
    assert t.read().count() == 45  # healed transparently
    # post-swap debris: .old alongside a live data dir is swept
    shutil.copytree(t.data_dir, t.data_dir + ".old")
    assert t.apply_deletes()["delete_files_applied"] >= 1  # per part-file count
    assert not os.path.isdir(t.data_dir + ".old")
    assert t.read().count() == 45
