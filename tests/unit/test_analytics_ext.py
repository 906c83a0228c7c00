"""Properties of the round-7 analytics extensions beyond the oracle:
skyline phase-equivalence and dominance law, CM-sketch one-sided error,
chi-square contingency conservation, stump optimality by brute force,
spatial join shape (broadcast equi-join, never cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_data_warehouse_spark.catalog import table
from demo_data_warehouse_spark.queries.analytics_ext import (
    _K_ANON,
    agg_chisq_abtest,
    agg_cms_rollup,
    dq_k_anonymity,
    join_spatial_grid,
    ml_decision_stump,
    pareto_frontier,
    window_skyline,
)


def _parts(spark, sf_dir):
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        "p_size",
    )


def test_skyline_two_phase_equals_direct(spark, sf_dir):
    # the salted local prune must be lossless: phase1∘phase2 == direct
    p = _parts(spark, sf_dir)
    direct = {
        (r.p_partkey, r.cents, r.p_size)
        for r in pareto_frontier(p, "cents", "p_size").collect()
    }
    two_phase = {
        (r.p_partkey, r.cents, r.p_size)
        for r in window_skyline(spark, sf_dir).collect()
    }
    assert two_phase == direct and direct


def test_skyline_dominance_law(spark, sf_dir):
    # every survivor is non-dominated; every dropped row is dominated
    rows = _parts(spark, sf_dir).collect()
    kept = {r.p_partkey for r in window_skyline(spark, sf_dir).collect()}

    def dominated(a):
        return any(
            b.cents <= a.cents
            and b.p_size >= a.p_size
            and (b.cents < a.cents or b.p_size > a.p_size)
            for b in rows
        )

    for r in rows:
        assert (r.p_partkey in kept) == (not dominated(r))


def test_cms_never_underestimates_and_is_exact_here(spark, sf_dir):
    truth = {
        r.event_type: r.cnt
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    est = {r.item: r.est_cnt for r in agg_cms_rollup(spark, sf_dir).collect()}
    assert set(est) == set(truth)
    for item, e in est.items():
        assert e >= truth[item]  # CM error is one-sided
        assert e == truth[item]  # 5 items in 1024 cells: no collisions


def test_chisq_contingency_conserves_rows(spark, sf_dir):
    row = agg_chisq_abtest(spark, sf_dir).collect()[0]
    total = table(spark, sf_dir, "events").count()
    assert row.a + row.b + row.c + row.d == total
    assert row.chi2 >= 0.0


def test_stump_split_is_brute_force_optimal(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
        F.round("l_quantity").cast("bigint").alias("q"),
    )
    census = sorted(
        (r.d, r.n, r.s)
        for r in li.groupBy("d")
        .agg(F.count("*").alias("n"), F.sum("q").alias("s"))
        .collect()
    )
    best, best_gain = None, None
    nl = sl = 0
    n_t, s_t = sum(c[1] for c in census), sum(c[2] for c in census)
    for d, n, s in census:
        nl, sl = nl + n, sl + s
        nr, sr = n_t - nl, s_t - sl
        if nr == 0:
            continue
        gain = (float(sl) * sl) / nl + (float(sr) * sr) / nr
        if best_gain is None or gain > best_gain:
            best, best_gain = d, gain
    got = ml_decision_stump(spark, sf_dir).collect()[0]
    assert got.split_at == best
    assert got.n_l + got.n_r == n_t and got.s_l + got.s_r == s_t


def test_spatial_grid_plan_is_broadcast_equi_join(spark, sf_dir):
    plan = join_spatial_grid(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_spatial_grid_matches_within_one_cell(spark, sf_dir):
    cell = 5_000_000
    for r in join_spatial_grid(spark, sf_dir).collect():
        assert 0 <= r.dist2 <= cell * cell


def test_k_anonymity_flags_only_small_classes(spark, sf_dir):
    out = dq_k_anonymity(spark, sf_dir).collect()
    assert all(r.n < _K_ANON for r in out)
    full = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .count()
        .collect()
    )
    assert len(out) == sum(1 for r in full if r["count"] < _K_ANON)


def test_frontier_guard_raises_on_adversarial_monotone_input(spark):
    # degenerate all-on-the-frontier input: both axes strictly monotone
    # in the same direction, so NO point dominates any other and phase 1
    # prunes nothing — the survivor guard must fail loudly instead of
    # letting phase 2 sort everything on one partition.
    import pytest

    from demo_data_warehouse_spark.queries.analytics_ext import (
        frontier_survivor_guard,
        pareto_frontier,
    )

    n = 5000
    monotone = spark.range(n).select(
        F.col("id").alias("cost"), F.col("id").alias("size")
    ).withColumn("salt", F.pmod(F.xxhash64("cost"), F.lit(32)))
    local = pareto_frontier(monotone, "cost", "size", "salt").drop("salt")
    with pytest.raises(RuntimeError, match="frontier survivors exceed"):
        frontier_survivor_guard(local, limit=n - 1, what="test phase-2")
    # a realistic (dominating) input passes the same guard untouched
    ok = frontier_survivor_guard(local.limit(10), limit=100)
    assert ok.count() == 10
