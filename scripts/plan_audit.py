"""Full-registry physical-plan audit — the 100 TB lens, mechanized.

Explains EVERY registry query at a small scale factor and flags the
plan shapes that do not survive a 1000-executor run:

  - CartesianProduct ............ unkeyed O(|L|x|R|) join
  - BatchEvalPython ............. row-at-a-time (pickled) Python
  - global Sort not under a TakeOrderedAndProject and not above an
    aggregate/census-sized input ... full-data single-range sort

Known sanctioned exceptions are listed explicitly with reasons, so the
output is a true exception report: anything printed under FLAGS is
either a regression or a new, undocumented hazard. Exit code 1 if any
unsanctioned flag fires (CI-able).

Usage: python -u scripts/plan_audit.py [sf_dir] [name ...] 2>/dev/null
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, node) pairs that are DESIGNED, with the reason they are safe
SANCTIONED: dict[tuple[str, str], str] = {
    # 1-row / centroid-table broadcast nested loops are fine; only
    # CartesianProduct is flagged, so no entries needed for BNLJ.
    ("fn_udtf_split", "BatchEvalPython"): (
        "deliberate Python-UDTF surface exercise (SURVEY §2.10 R7): "
        "UDTFs are row-generating by contract; the node is "
        "BatchEvalPythonUDTF, not a hot-path scalar fallback"
    ),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as m
    from demo_data_warehouse_spark.plans.checks import physical_plan
    from demo_data_warehouse_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[4]")
    qs = m.queries()
    flags: list[str] = []
    errors: list[str] = []
    n_audited = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = physical_plan(df)
        except Exception as e:  # noqa: BLE001 — audit must not die per-query
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        n_audited += 1
        for node in ("CartesianProduct", "BatchEvalPython"):
            if node in plan and (name, node) not in SANCTIONED:
                flags.append(f"{name}: {node}")
        # a GLOBAL Sort (Arguments ... "], true, 0" — range-partitioned
        # total order) with no TakeOrdered: the whole dataset flows
        # through a range exchange. Local sorts ("false") are grouping /
        # SMJ / window machinery and are fine.
        import re

        global_sorts = [
            mm
            for mm in re.finditer(
                r"\(\d+\) Sort\b(?:.*\n)*?Arguments: .*\], (\w+), \d+", plan
            )
            if mm.group(1) == "true"
        ]
        if global_sorts and "TakeOrdered" not in plan:
            if (name, "globalSort") not in SANCTIONED:
                flags.append(f"{name}: unguarded global Sort")
        print(f"ok    {name}", flush=True)

    print(f"\naudited {n_audited} queries")
    if errors:
        print("ERRORS (query failed to plan):")
        for e in errors:
            print(" ", e)
    if flags:
        print("FLAGS:")
        for f in flags:
            print(" ", f)
        return 1
    print("NO FLAGS")
    return 0 if not errors else 1


if __name__ == "__main__":
    raise SystemExit(main())
