"""Measure wall-time scaling of representative operator families between
sf0.1 and an N×-scaled twin (scripts/make_scaled_sf.py).

Prints one JSON line per query: {"query", "t_base", "t_scaled",
"ratio", "rows_base", "rows_scaled"} and a trailing summary. A ratio
near the data factor = linear scaling (what survives a 1000-executor
100 TB run); a ratio far above it flags a super-linear stage worth a
plan fix. Local caveat: local[32] with tiny absolute times means fixed
scheduling overhead inflates the BASE and deflates small ratios —
ratios well UNDER the factor mean overhead-dominated, not sublinear
magic.

Usage: python scripts/scale_check.py [scaled_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_data_warehouse_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"

FAMILIES = [
    "agg_group",          # scan-heavy grouped agg
    "agg_cube",           # multi-grouping agg
    "join_multihop",      # fact ⟕ broadcast dims
    "window_latest",      # keyed window
    "scd2_delta",         # SCD2 composite
    "merge_upsert",       # MERGE sink
    "flagship_report",    # end-to-end report
    "dedup_exact",        # hash groupBy dedup
    "dedup_minhash",      # banded LSH + verify
    "dedup_simhash",      # blocked hamming join
    "dedup_setsim_prefix",# prefix-filtered set-sim join
    "ann_cosine_topk",    # brute-force top-k
    "ann_cosine_ivf",     # cell-pruned ANN
    "ml_dbscan",          # LSH neighborhoods + components
    "text_quality",       # narrow text scoring
    "text_tfidf",         # explode + census joins
    "graph_pagerank",     # iterative joins on 10× edges
    "corpus_curate_mix",  # curation capstone
]


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ddw_scaled_sf10"
    only = sys.argv[2:]
    names = only or FAMILIES
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark("ddw-scale-check")

    def run(name, sf_dir):
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return df

    results = []
    for name in names:
        try:
            # warm both sides once, then min-of-2 timed passes each
            run(name, BASE)
            rows_scaled = run(name, scaled).count()
            rows_base = qs[name](spark, BASE).count()
        except Exception as exc:  # guard-railed queries may refuse the twin
            print(
                json.dumps({"query": name, "error": str(exc).split("\n")[0][:200]}),
                flush=True,
            )
            continue
        tb = min(
            [(lambda t0: (run(name, BASE), time.time() - t0)[1])(time.time()) for _ in range(2)]
        )
        ts = min(
            [(lambda t0: (run(name, scaled), time.time() - t0)[1])(time.time()) for _ in range(2)]
        )
        rec = {
            "query": name,
            "t_base": round(tb, 3),
            "t_scaled": round(ts, 3),
            "ratio": round(ts / tb, 2) if tb > 0 else None,
            "rows_base": rows_base,
            "rows_scaled": rows_scaled,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    worst = max(results, key=lambda r: r["ratio"] or 0)
    print(
        json.dumps(
            {
                "summary": "scale_check",
                "scaled_dir": scaled,
                "n_queries": len(results),
                "median_ratio": sorted(r["ratio"] for r in results)[len(results) // 2],
                "worst": {"query": worst["query"], "ratio": worst["ratio"]},
            }
        )
    )


if __name__ == "__main__":
    main()
