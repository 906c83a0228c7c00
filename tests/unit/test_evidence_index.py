"""The evidence index must not cite artifacts that don't exist.

SURVEY.md's standing claims are artifact pointers; a renamed, deleted, or
not-yet-landed artifact cited as evidence is doc drift that reads as a
broken provenance chain. Every round-stamped artifact filename mentioned
anywhere in SURVEY.md must exist at the repo root — except the two round-5
names SURVEY cites specifically to DOCUMENT that the round-5 driver pass
was skipped and produced none.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCUMENTED_ABSENT = {"BENCH_r05.json", "CORRECTNESS_r05.json"}

_PATTERN = re.compile(
    r"(?:GATE[A-Z0-9_]*_r\d+\.txt"
    r"|CORRECTNESS_r\d+\.json"
    r"|BENCH_r\d+\.json"
    r"|SCALE[A-Z0-9_]*_r\d+\.jsonl"
    r"|SKEW_r\d+\.jsonl"
    r"|ANN_RECALL_r\d+\.jsonl)"
)


def test_survey_cited_artifacts_exist():
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        cited = set(_PATTERN.findall(f.read()))
    assert cited, "pattern matched nothing — regex drifted from SURVEY's naming"
    missing = sorted(
        name
        for name in cited - DOCUMENTED_ABSENT
        if not os.path.exists(os.path.join(REPO, name))
    )
    assert missing == [], (
        f"SURVEY.md cites evidence artifacts that don't exist: {missing}"
    )
    # the allowlist must stay honest too: if an r5 artifact ever appears,
    # drop it from DOCUMENTED_ABSENT rather than shadowing a real file
    stale_allow = sorted(
        name
        for name in DOCUMENTED_ABSENT
        if os.path.exists(os.path.join(REPO, name))
    )
    assert stale_allow == [], f"allowlisted-as-absent but present: {stale_allow}"
