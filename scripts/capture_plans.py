"""Capture .explain("formatted") for bench queries into plans/r12/.

Usage:
    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

Writes plans/r12/<query>_<tag>.txt. Queries default to the bench
tier-1 + tier-2 set. Building a query's DataFrame executes any
in-query setup actions (index builds, MV refreshes) but never the
final query itself — explain is plan-only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "tag must be before|after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from bench import HEADLINE, HEADLINE_T2

    from demo_data_warehouse_spark.session import get_spark

    names = sys.argv[2:] or (HEADLINE + HEADLINE_T2)
    qs = entry_mod.queries()
    spark = get_spark("ddw-plans")
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
