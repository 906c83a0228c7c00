"""bench.py contract: the tier-1 anchor set is frozen (headline totals
are compared against BENCH_r01.json per query, forever), and the
self-certification math condemns exactly the runs whose bracketing
probes diverged (the round-6 failure mode: a mid-run steal storm the
end-of-run probe had already recovered from)."""

from __future__ import annotations

import bench


def test_headline_membership_frozen():
    # DO NOT EDIT these sets without an explicit new anchor decision:
    # cross-round continuity of headline_total_wall depends on them.
    assert bench.HEADLINE == [
        "agg_group",
        "join_multihop",
        "window_latest",
        "scd2_delta",
        "merge_upsert",
        "agg_cube",
        "dedup_minhash",
        "ann_cosine_topk",
        "text_quality",
        "flagship_report",
    ]
    assert bench.HEADLINE_T2 == [
        "maintenance_mv_rewrite",
        "scan_bloom_index",
        "text_inverted_index",
        "ml_dbscan",
        "corpus_curate_mix",
    ]


def test_calib_divergence_direction_agnostic():
    pre = {"numpy_s": 0.04, "spark_range_s": 0.10}
    assert bench._calib_divergence(pre, dict(pre)) == 1.0
    # slowdown and speedup condemn equally
    slow = {"numpy_s": 0.096, "spark_range_s": 0.10}
    fast = {"numpy_s": 0.04 / 2.4, "spark_range_s": 0.10}
    assert bench._calib_divergence(pre, slow) == bench._calib_divergence(pre, fast)
    assert bench._calib_divergence(pre, slow) > bench.CALIB_DIVERGENCE_MAX
    # worst probe wins: one calm probe cannot certify a stormy run
    mixed = {"numpy_s": 0.04, "spark_range_s": 0.30}
    assert bench._calib_divergence(pre, mixed) == 3.0
    # a missing probe never divides by zero or condemns
    assert bench._calib_divergence({"numpy_s": 0.04}, {"spark_range_s": 0.1}) == 1.0


def test_r6_failure_modes_condemned():
    # the two recorded round-6 contaminations, verbatim from the
    # artifacts: both must fail certification under the 1.5x criterion
    driver_r6 = ({"numpy_s": 0.041}, {"numpy_s": 0.096})
    judge_r6 = ({"numpy_s": 0.056}, {"numpy_s": 0.174})
    for pre, post in (driver_r6, judge_r6):
        assert bench._calib_divergence(pre, post) > bench.CALIB_DIVERGENCE_MAX
