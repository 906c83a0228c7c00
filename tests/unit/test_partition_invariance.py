"""Partition-count invariance — the distributed-determinism contract.

The DuckDB gate already proves Spark (32 shuffle partitions) equals a
serial engine; this pins the stronger claim directly: representative
queries from every exactness-sensitive family produce IDENTICAL rows
under different shuffle-partition counts, i.e. no result depends on
partial-aggregation order, merge order, or partition boundaries. Any
float accumulation on a grouped path would fail this within a few
queries — the reason the engine lifts money/metrics to integer units.
"""

from __future__ import annotations

import pytest

# one per family: fixed-point agg, window, graph iteration, dedup
# banding, incremental merge, CDC resolution, sketch estimate
QUERIES = [
    "agg_group",
    "agg_skew_kurtosis",
    "window_drawdown",
    "graph_pagerank",
    "dedup_minhash",
    "agg_incremental_join",
    "merge_cdc_apply",
    "agg_sketch_rollup",
    "agg_kll_quantile",
    "agg_theta_setops",
    "sample_temperature",
    "embed_kmeans",
    "ml_logreg_gd",
    # round-7 families: skyline two-phase prune, CM-sketch cells,
    # shared-expression DOUBLE stats, DP seeded noise, bloom pruning
    "window_skyline",
    "agg_cms_rollup",
    "ml_decision_stump",
    "agg_chisq_abtest",
    "agg_dp_noise",
    "scan_bloom_index",
    # round-8 (driver round 4) touched families: measured-skew salting
    # (census + salted join), tolerance-twin sketch verdicts (the
    # returned booleans/exact twins must not depend on how the HLL/GK
    # partial sketches were partitioned before merging)
    "join_auto_salt",
    "agg_approx_distinct",
    "agg_approx_median",
]


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as m

    return m.queries()


def _rows(spark, qs, name, sf_dir, n_part):
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        df = qs[name](spark, sf_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


@pytest.mark.parametrize("name", QUERIES)
def test_partition_count_invariance(spark, sf_dir, qs, name):
    a = _rows(spark, qs, name, sf_dir, 3)
    b = _rows(spark, qs, name, sf_dir, 17)
    assert a == b, f"{name} differs between 3 and 17 shuffle partitions"
