"""The evidence index must not cite artifacts that don't exist.

SURVEY.md's standing claims are artifact pointers; a renamed, deleted, or
not-yet-landed artifact cited as evidence is doc drift that reads as a
broken provenance chain. Every round-stamped artifact filename mentioned
anywhere in SURVEY.md must exist at the repo root — INCLUDING the
compound citation forms SURVEY uses to compress a family of rounds
(`GATE_ADV_r06/r07/r08/r10.txt`, `BENCH_r01…r09.json`), which the
original standalone-filename regex silently skipped (ADVICE r10).
The two round-5 names SURVEY cites specifically to DOCUMENT that the
round-5 driver pass was skipped are allowlisted as absent.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCUMENTED_ABSENT = {"BENCH_r05.json", "CORRECTNESS_r05.json"}

# artifact families and the extension each is stamped with; BENCH takes
# an optional [A-Z0-9_]* tail for the builder-local raw artifacts
# (BENCH_LOCAL_r12.json, ADVICE r11 item 2)
_STEM = r"(GATE[A-Z0-9_]*|CORRECTNESS|BENCH[A-Z0-9_]*|SCALE[A-Z0-9_]*|SKEW|ANN_RECALL)"
# longest-first: 'json' before 'jsonl' would truncate '.jsonl' citations
# into phantom '.json' names
_EXT = r"(txt|jsonl|json)"
# boundary anchors (ADVICE r11 item 3): without the leading lookbehind,
# prose like 'PREBENCH_r05.json' extracts a phantom 'BENCH_r05.json';
# without the trailing \b, 'BENCH_r05.jsonish' half-matches its prefix.
_LB = r"(?<![A-Za-z0-9_])"
_RB = r"\b"

# standalone:  NAME_r08.ext
_SIMPLE = re.compile(_LB + _STEM + r"_r(\d+)\." + _EXT + _RB)
# slash list:  NAME_r06/r07/r10.ext  (any number of /rNN tails)
_SLASH = re.compile(_LB + _STEM + r"_r(\d+)((?:/r\d+)+)\." + _EXT + _RB)
# ellipsis range:  NAME_r01…r09.ext  (inclusive, zero-padded like the anchor)
_RANGE = re.compile(_LB + _STEM + r"_r(\d+)…r(\d+)\." + _EXT + _RB)


def _extract(text: str) -> set[str]:
    """Expand every citation form in `text` to full artifact filenames."""
    cited: set[str] = set()
    for stem, lo, hi, ext in _RANGE.findall(text):
        width = len(lo)
        for n in range(int(lo), int(hi) + 1):
            cited.add(f"{stem}_r{str(n).zfill(width)}.{ext}")
    for stem, first, tail, ext in _SLASH.findall(text):
        for n in [first, *re.findall(r"r(\d+)", tail)]:
            cited.add(f"{stem}_r{n}.{ext}")
    # strip compounds before the standalone pass so e.g. the 'r09.json'
    # tail of a range can't be half-matched; what remains is standalone
    remainder = _RANGE.sub(" ", _SLASH.sub(" ", text))
    for stem, n, ext in _SIMPLE.findall(remainder):
        cited.add(f"{stem}_r{n}.{ext}")
    return cited


def test_extractor_expands_compound_citations():
    """Negative/positive control for the extractor itself: the compound
    forms must expand to exact filenames (so a nonexistent round cited
    inside a compound IS caught by the existence check), and plain prose
    must yield nothing."""
    got = _extract(
        "see GATE_ADV_r06/r07/r10.txt and BENCH_r01…r03.json plus "
        "CORRECTNESS_r09.json and SKEW_r05.jsonl; "
        "also a fake GATE10X_r98/r99.txt and BENCH_LOCAL_r12.json"
    )
    assert got == {
        "GATE_ADV_r06.txt",
        "GATE_ADV_r07.txt",
        "GATE_ADV_r10.txt",
        "BENCH_r01.json",
        "BENCH_r02.json",
        "BENCH_r03.json",
        "CORRECTNESS_r09.json",
        # '.jsonl' must survive intact — a 'json|jsonl' alternation order
        # bug would emit a phantom 'SKEW_r05.json'
        "SKEW_r05.jsonl",
        "GATE10X_r98.txt",
        "GATE10X_r99.txt",
        # builder-local raw bench artifacts (ADVICE r11 item 2) are
        # citations too — the BENCH stem's optional tail must cover them
        "BENCH_LOCAL_r12.json",
    }
    assert _extract("no artifacts here, just prose about round 9") == set()
    # boundary anchoring (ADVICE r11 item 3): an embedded prefix or a
    # suffixed extension is a near-miss, NOT a citation — extracting a
    # phantom name here would demand a file that rightly doesn't exist
    assert _extract("the PREBENCH_r05.json prototype") == set()
    assert _extract("a BENCH_r05.jsonish mockup") == set()
    assert _extract("lowercase preBENCH_r05.json too") == set()


def test_survey_cited_artifacts_exist():
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        cited = _extract(f.read())
    assert cited, "pattern matched nothing — regex drifted from SURVEY's naming"
    # the compound forms are the reason this extractor exists; if SURVEY
    # drops them entirely this guard should be revisited, not pass silently
    assert any(
        name.startswith(("GATE_ADV_", "BENCH_")) for name in cited
    ), "expected the compound-cited families to expand to concrete names"
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
