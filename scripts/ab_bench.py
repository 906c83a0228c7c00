"""Interleaved fresh-JVM A/B bench: HEAD vs an older commit's worktree.

The shared bench host drifts ±25-40% between hours (SURVEY §6.2), so
absolute cross-round walls cannot attribute regressions to code. The
only valid comparison is interleaved: alternating fresh-JVM subprocess
reps of OLD and NEW code on the same hardware state, medians per
variant. This encodes the round-5 discipline as a script:

    git worktree add .worktrees/r4 8f24647
    python scripts/ab_bench.py --old .worktrees/r4 \
        --queries corpus_curate_mix ml_dbscan agg_group

Each rep spawns ONE subprocess per variant (fresh JVM: no cross-variant
cache pollution), which runs every query once for warm-up then takes
min-of-N timed noop-sink passes. Rep start order alternates OLD/NEW
first; with an EVEN rep count (the default) both orderings occur
equally often, so a monotone host drift cancels in the medians — odd
counts leave a residual order bias. Output: one JSON line per
subprocess on stderr-free stdout, and a final median table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
root = sys.argv[1]
sf_dir = sys.argv[2]
names = sys.argv[3].split(",")
passes = int(sys.argv[4])
os.chdir(root)
sys.path.insert(0, root)
from demo_data_warehouse_spark.session import get_spark
import __spark_entry__ as entry_mod
qs = entry_mod.queries()
spark = get_spark("ddw-ab")
def run(n):
    qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
for n in names:
    run(n)  # warm-up
out = {}
for n in names:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        run(n)
        best = min(best, time.time() - t0)
    out[n] = round(best, 3)
print("ABRESULT " + json.dumps(out))
"""


def _run_variant(root: str, sf_dir: str, names: list[str], passes: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, root, sf_dir, ",".join(names), str(passes)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"variant at {root} produced no result\n--- stdout ---\n{p.stdout[-2000:]}"
        f"\n--- stderr ---\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="worktree of the old commit")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument(
        "--reps",
        type=int,
        default=4,
        help="interleaved reps; EVEN counts balance old-first/new-first "
        "orderings so a monotone host drift cancels in the medians — an "
        "odd count leaves a residual order bias (ADVICE r7)",
    )
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    new_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_root = os.path.abspath(args.old)
    results: dict[str, dict[str, list[float]]] = {
        "old": {n: [] for n in args.queries},
        "new": {n: [] for n in args.queries},
    }
    for rep in range(args.reps):
        order = ["old", "new"] if rep % 2 == 0 else ["new", "old"]
        for variant in order:
            root = old_root if variant == "old" else new_root
            walls = _run_variant(root, args.sf_dir, args.queries, args.passes)
            for n, w in walls.items():
                results[variant][n].append(w)
            print(f"rep {rep + 1} {variant:3s}: {walls}", file=sys.stderr)

    table = {}
    for n in args.queries:
        old_m = statistics.median(results["old"][n])
        new_m = statistics.median(results["new"][n])
        table[n] = {
            "old_median": round(old_m, 3),
            "new_median": round(new_m, 3),
            "ratio_new_over_old": round(new_m / old_m, 3),
            "old_reps": results["old"][n],
            "new_reps": results["new"][n],
        }
    print(json.dumps({"ab": table, "reps": args.reps, "passes": args.passes}))


if __name__ == "__main__":
    main()
