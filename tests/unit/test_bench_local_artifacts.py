"""Integrity controls for the BENCH_LOCAL_rNN.json artifact family.

ADVICE r11 item 2 established the convention: every builder-local
certified bench run ships its raw bench.py emission as a committed
artifact, so the round's headline performance claim is auditable from
the tree (gate claims already ship raw logs). These controls keep the
family honest (VERDICT r11 item 5: no evidence artifact without a
named control):

- structural: every artifact parses, carries a `certified_run` whose
  `certified` flag is True, with the full calib fingerprint and the
  internal `attempts` history bench.py emits — an artifact that
  dropped the attempt history could hide condemned attempts;
- falsifiability: the family records REFUSALS too — the r11 artifact
  must carry its same-HEAD stormy-epoch run with `certified` False
  (a family that only ever archives successes proves nothing);
- prose-drift: each artifact's headline value must appear verbatim in
  BASELINE.md, and every `Round-N HEAD sanity run` prose section in
  BASELINE.md that cites a BENCH_LOCAL artifact must have it on disk
  (both directions of artifact-vs-prose drift fail loudly).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REQUIRED_RUN_KEYS = {
    "metric",
    "value",
    "unit",
    "queries",
    "sf",
    "tier2_total",
    "calib_pre",
    "calib",
    "calib_divergence",
    "pass_spread_max",
    "certified",
    "attempts",
}


def _artifacts() -> dict[str, dict]:
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")))
    return {os.path.basename(p): json.load(open(p)) for p in paths}


def test_family_is_nonempty_and_structurally_sound():
    arts = _artifacts()
    assert arts, "BENCH_LOCAL family missing entirely — convention dropped?"
    for name, art in arts.items():
        run = art.get("certified_run")
        assert isinstance(run, dict), f"{name}: no certified_run object"
        missing = REQUIRED_RUN_KEYS - run.keys()
        assert not missing, f"{name}: certified_run missing keys {sorted(missing)}"
        assert run["certified"] is True, f"{name}: certified_run not certified"
        assert run["attempts"], f"{name}: empty attempts history"
        assert run["queries"], f"{name}: no per-query timings"
        # the bracketing calib pair must be complete — a missing probe
        # would have been condemned by bench.py, so its absence here
        # means the artifact was edited
        for side in ("calib_pre", "calib"):
            assert set(run[side]) == {"numpy_s", "spark_range_s"}, (
                f"{name}: {side} probe pair incomplete"
            )
        assert "note" in art and "round" in art, f"{name}: provenance missing"


def test_family_records_refusals_not_just_successes():
    arts = _artifacts()
    r11 = arts.get("BENCH_LOCAL_r11.json")
    assert r11 is not None, "r11 artifact (the refusal-bearing one) missing"
    stormy = r11.get("stormy_epoch_refused_run")
    assert isinstance(stormy, dict), "r11 lost its refused stormy-epoch run"
    assert stormy["certified"] is False, "the 'refused' run claims certified"
    # the refusal must show the machinery exhausting its bounded retries
    assert len(stormy["attempts"]) == 3, "refused run should carry 3 attempts"


def test_artifact_headlines_match_baseline_prose():
    arts = _artifacts()
    baseline = open(os.path.join(REPO, "BASELINE.md")).read()
    for name, art in arts.items():
        headline = art["certified_run"]["value"]
        assert str(headline) in baseline, (
            f"{name}: headline {headline} not found in BASELINE.md prose — "
            "artifact and prose record have drifted"
        )


def test_baseline_cited_bench_local_artifacts_exist():
    baseline = open(os.path.join(REPO, "BASELINE.md")).read()
    cited = set(re.findall(r"(?<![A-Za-z0-9_])BENCH_LOCAL_r\d+\.json\b", baseline))
    assert cited, "BASELINE.md cites no BENCH_LOCAL artifacts — convention dropped?"
    missing = sorted(n for n in cited if not os.path.exists(os.path.join(REPO, n)))
    assert missing == [], f"BASELINE.md cites missing raw bench artifacts: {missing}"
