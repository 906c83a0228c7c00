"""Measure IVF ANN recall@k against exact brute force across corpus
sizes — the QUALITY axis of the ANN family (scale_check measures the
speed axis; the oracles pin determinism, but recall vs ground truth is
a property of the index geometry and must be measured, not asserted).

Uses the REAL operators for everything that defines the index:
`ivf_train_centroids` (K = max(8, ceil(sqrt(n))), the same
count-derived sizing as the ann_cosine_ivf query) and `ivf_assign`
(the law-pinned Arrow argmax). Ground-truth exact top-k and the
probe-restricted ranking then run in numpy on the collected
(id, cell, vector) table — the ranking arithmetic is the same
fold-exact cosine both engines already replay bit-for-bit, and doing
it driver-side lets one run sweep many query points.

Prints one JSON line per (corpus, n_probe): mean/min recall@10 over
`n_queries` corpus points (deterministic stride sample; self-match
included on both sides so it cancels).

Usage: python scripts/ann_recall_check.py [dir ...]
       (default: /root/testdata/sf0.1 /tmp/ddw_scaled_sf30)
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo_data_warehouse_spark.operators import similarity as sim
from demo_data_warehouse_spark.session import get_spark

N_QUERIES = 64
K = 10


def measure(spark, path: str) -> None:
    emb = spark.read.parquet(f"{path}/embeddings.parquet")
    n = emb.count()
    n_cells = max(8, math.ceil(math.sqrt(n)))
    cents = sim.ivf_train_centroids(emb, "embedding", n_cells=n_cells)
    assigned = sim.ivf_assign(emb, "vec_id", "embedding", cents).join(
        emb.select(sim.F.col("vec_id").alias("id"), "embedding"), on="id"
    )
    rows = assigned.select("id", "cell", "embedding").collect()
    ids = np.array([r["id"] for r in rows])
    cells = np.array([r["cell"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    q_idx = np.argsort(ids)[:: max(1, len(ids) // N_QUERIES)][:N_QUERIES]
    for n_probe in (1, 2, 4):
        recalls = []
        ratios = []
        for qi in q_idx:
            sims = Xn @ Xn[qi]
            # exact ground truth: top-k by (sim desc, id asc) — the same
            # total order cosine_topk uses
            order = np.lexsort((ids, -sims))
            truth = set(ids[order[:K]])
            probe = set(np.argsort(-(Cn @ Xn[qi]))[:n_probe])
            mask = np.isin(cells, list(probe))
            cand_order = np.lexsort((ids[mask], -sims[mask]))
            got_idx = np.where(mask)[0][cand_order[:K]]
            got = set(ids[got_idx])
            recalls.append(len(truth & got) / K)
            # similarity ratio: how much of the true top-k's total
            # similarity the probe-restricted answer captures — on
            # structureless corpora the true neighbors are near-ties,
            # so recall@k understates answer quality badly
            ratios.append(float(sims[got_idx].sum() / sims[order[:K]].sum()))
        print(
            json.dumps(
                {"corpus": path, "n": int(n), "n_cells": int(n_cells),
                 "n_probe": n_probe, "queries": len(q_idx),
                 "recall_at_10_mean": round(float(np.mean(recalls)), 4),
                 "recall_at_10_min": round(float(np.min(recalls)), 4),
                 "sim_ratio_mean": round(float(np.mean(ratios)), 4)}
            ),
            flush=True,
        )


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/ddw_scaled_sf30"]
    spark = get_spark("ddw-ann-recall")
    for d in dirs:
        measure(spark, d)


if __name__ == "__main__":
    main()
