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


def test_contaminated_run_retries_and_reports(monkeypatch, capsys):
    """End-to-end main() law without Spark: a run whose bracketing
    probes diverge re-runs its timed passes (bounded), and the JSON
    line carries the full attempt history plus a certified flag that
    reflects only the FINAL attempt."""
    import itertools

    # probe sequence: attempt 1 diverges (0.04 -> 0.096, the r6 storm),
    # attempt 2 agrees -> certified on the second attempt
    probes = itertools.chain(
        [{"numpy_s": 0.04, "spark_range_s": 0.1}, {"numpy_s": 0.096, "spark_range_s": 0.1}],
        itertools.repeat({"numpy_s": 0.04, "spark_range_s": 0.1}),
    )
    passes = {"n": 0}

    def fake_timed(qs, spark, sf_dir):
        passes["n"] += 1
        return {name: 0.1 for name in bench.HEADLINE + bench.HEADLINE_T2}

    monkeypatch.setattr(bench, "_calibrate", lambda spark: next(probes))
    monkeypatch.setattr(bench, "_timed_passes", fake_timed)
    monkeypatch.setattr(bench, "_quiet_window_warnings", lambda spark: None)
    monkeypatch.setattr(bench, "_run", lambda qs, name, spark, sf_dir: None)

    class _FakeEntry:
        @staticmethod
        def queries():
            return {}

    import sys

    monkeypatch.setitem(sys.modules, "__spark_entry__", _FakeEntry)
    monkeypatch.setattr(
        "demo_data_warehouse_spark.session.get_spark", lambda name: object()
    )
    monkeypatch.setattr(bench, "get_spark", lambda name: object())

    bench.main()
    import json

    out = json.loads(capsys.readouterr().out.strip())
    assert passes["n"] == 2  # contaminated attempt re-ran exactly once
    assert out["attempts"] == [2.4, 1.0]
    assert out["certified"] is True
    assert out["calib_divergence"] == 1.0
    assert out["value"] == round(0.1 * len(bench.HEADLINE), 3)



def test_stormy_host_exhausts_attempts_and_self_reports(monkeypatch, capsys):
    """When every attempt diverges, the artifact records certified:false
    with MAX_ATTEMPTS divergences — self-describing contamination the
    judge can discount without forensics (the r6 gap)."""
    import itertools
    import json
    import sys

    flip = itertools.cycle(
        [{"numpy_s": 0.04, "spark_range_s": 0.1}, {"numpy_s": 0.2, "spark_range_s": 0.1}]
    )
    monkeypatch.setattr(bench, "_calibrate", lambda spark: next(flip))
    monkeypatch.setattr(
        bench,
        "_timed_passes",
        lambda qs, spark, sf_dir: {n: 0.1 for n in bench.HEADLINE + bench.HEADLINE_T2},
    )
    monkeypatch.setattr(bench, "_quiet_window_warnings", lambda spark: None)
    monkeypatch.setattr(bench, "_run", lambda qs, name, spark, sf_dir: None)

    class _FakeEntry:
        @staticmethod
        def queries():
            return {}

    monkeypatch.setitem(sys.modules, "__spark_entry__", _FakeEntry)
    monkeypatch.setattr(bench, "get_spark", lambda name: object())

    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["certified"] is False
    assert len(out["attempts"]) == bench.MAX_ATTEMPTS
    assert all(a == 5.0 for a in out["attempts"])
