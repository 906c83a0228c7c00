"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across the headline queries (each executed
to completion via a count/collect action, results not retained).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_data_warehouse_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family — scan-heavy agg, shuffle join,
# window, SCD2 composite, merge, dedup LSH, ANN, text sweep.
HEADLINE = [
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark("ddw-bench")
    # Warm-up pass: run every headline query once so the measured passes
    # report engine steady state (plan compile, JIT, and OS page cache
    # are one-time costs, not per-query costs on a long-lived cluster).
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # min of 3 timed passes: wall-clock on a shared box is noisy; the
    # minimum is the reproducible steady-state engine time.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
