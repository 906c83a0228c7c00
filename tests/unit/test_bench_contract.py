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
    # a missing probe is a BROKEN probe: it condemns (ADVICE r7 — the
    # old `if a and b` guard silently excluded it, quietly weakening
    # certification), and the sentinel stays finite for strict JSON
    missing = bench._calib_divergence({"numpy_s": 0.04}, {"spark_range_s": 0.1})
    assert missing > bench.CALIB_DIVERGENCE_MAX
    import math

    assert math.isfinite(missing)
    # a probe that rounds to 0.0 is clamped, not excluded: the huge
    # ratio against the other side condemns rather than certifies
    zeroed = bench._calib_divergence(
        {"numpy_s": 0.0, "spark_range_s": 0.1},
        {"numpy_s": 0.04, "spark_range_s": 0.1},
    )
    assert zeroed > bench.CALIB_DIVERGENCE_MAX and math.isfinite(zeroed)


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
        return {name: 0.1 for name in bench.HEADLINE + bench.HEADLINE_T2}, 1.0

    monkeypatch.setattr(bench, "_calibrate", lambda spark: next(probes))
    monkeypatch.setattr(bench, "_timed_passes", fake_timed)
    monkeypatch.setattr(bench, "_quiet_window_warnings", lambda spark: (lambda: None))
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
    assert [a["calib_divergence"] for a in out["attempts"]] == [2.4, 1.0]
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
        lambda qs, spark, sf_dir: (
            {n: 0.1 for n in bench.HEADLINE + bench.HEADLINE_T2},
            1.0,
        ),
    )
    monkeypatch.setattr(bench, "_quiet_window_warnings", lambda spark: (lambda: None))
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
    assert all(a["calib_divergence"] == 5.0 for a in out["attempts"])


def _fake_bench_harness(monkeypatch, calibs, timed_results):
    """Wire main() to canned probe/timing sequences; returns the parsed
    JSON via a closure-run."""
    import itertools
    import sys

    probes = iter(calibs)
    timed = iter(timed_results)
    monkeypatch.setattr(bench, "_calibrate", lambda spark: next(probes))
    monkeypatch.setattr(bench, "_timed_passes", lambda qs, spark, sf_dir: next(timed))
    monkeypatch.setattr(bench, "_quiet_window_warnings", lambda spark: (lambda: None))
    monkeypatch.setattr(bench, "_run", lambda qs, name, spark, sf_dir: None)

    class _FakeEntry:
        @staticmethod
        def queries():
            return {}

    monkeypatch.setitem(sys.modules, "__spark_entry__", _FakeEntry)
    monkeypatch.setattr(bench, "get_spark", lambda name: object())


def test_intra_window_storm_condemns_despite_agreeing_probes(monkeypatch, capsys):
    """A storm that starts after the pre-probe and subsides before the
    post-probe leaves the bracketing pair agreeing around inflated
    walls (the r6 half-recovered mode). The per-query pass spread is
    the signal that catches it: spread above PASS_SPREAD_MAX retries,
    and certifies only when a later attempt is calm on BOTH signals."""
    import json

    calm = {"numpy_s": 0.04, "spark_range_s": 0.1}
    all_q = bench.HEADLINE + bench.HEADLINE_T2
    stormy_walls = {n: 0.4 for n in all_q}
    calm_walls = {n: 0.1 for n in all_q}
    _fake_bench_harness(
        monkeypatch,
        calibs=[calm] * 4,
        timed_results=[(stormy_walls, 8.0), (calm_walls, 1.2)],
    )
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert [a["pass_spread"] for a in out["attempts"]] == [8.0, 1.2]
    assert out["certified"] is True
    assert out["pass_spread_max"] == 1.2
    assert out["queries"] == calm_walls  # stormy walls discarded


def test_uncertified_run_reports_least_divergent_attempt(monkeypatch, capsys):
    """When no attempt certifies, the artifact must carry the LEAST
    contaminated attempt's walls and probes — the stormiest attempt
    happening to run last must not overwrite the best evidence."""
    import json

    def probe(x):
        return {"numpy_s": x, "spark_range_s": 0.1}

    all_q = bench.HEADLINE + bench.HEADLINE_T2
    walls = [
        ({n: 0.16 for n in all_q}, 1.0),  # divergence 1.6 — best
        ({n: 0.50 for n in all_q}, 1.0),  # divergence 5.0
        ({n: 0.17 for n in all_q}, 1.0),  # divergence 1.7
    ]
    calibs = [
        probe(0.04), probe(0.064),  # 1.6x
        probe(0.04), probe(0.2),    # 5.0x
        probe(0.04), probe(0.068),  # 1.7x
    ]
    _fake_bench_harness(monkeypatch, calibs=calibs, timed_results=walls)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["certified"] is False
    assert out["calib_divergence"] == 1.6
    assert out["queries"]["agg_group"] == 0.16  # attempt-1 walls kept
    assert [a["calib_divergence"] for a in out["attempts"]] == [1.6, 5.0, 1.7]


def test_quiet_window_warnings_restores_jvm_level(spark):
    """The WindowExec log suppression is JVM-global; the returned
    restore callable must put the logger's effective level back so
    code sharing the long-lived JVM after bench.main() keeps its
    warnings (ADVICE r7)."""
    jvm = spark._jvm
    ctx = jvm.org.apache.logging.log4j.LogManager.getContext(False)

    def effective_level():
        return str(
            ctx.getConfiguration().getLoggerConfig(bench._WINDOW_LOGGER).getLevel()
        )

    before = effective_level()
    restore = bench._quiet_window_warnings(spark)
    assert effective_level() == "ERROR"
    restore()
    assert effective_level() == before
