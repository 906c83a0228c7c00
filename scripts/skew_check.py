"""Measure hot-key join skew and the two mitigations (AQE skew-join,
explicit salting) on a scaled twin — the remaining 100 TB risk class
the volume twins can't show (they replicate keys UNIFORMLY, keeping
per-key group sizes constant by construction).

Setup: events from the given twin with user_id remapped so `hot_pct`%
of all rows land on ONE user (deterministic xxhash64 coin per row —
the "one whale account / one boilerplate domain" regime), joined to a
per-user dim big enough that Spark cannot broadcast it. Every variant
computes the same aggregate-of-join answer, printed for cross-checking:

  smj_aqe_off      sort-merge join, AQE fully off — the straggler
                   baseline: one reducer owns the hot key's entire
                   partition while the rest idle.
  smj_aqe_skew     AQE on with OptimizeSkewedJoin thresholds sized for
                   local data (the defaults are 256 MB-scale) — the
                   runtime fix: the skewed partition is split and the
                   matching side duplicated.
  salted_k32       explicit salting (the plan-time fix for engines or
                   join shapes AQE can't reach): fact side salts by row
                   hash, dim side explodes ×k — algebraically the same
                   join for any k (queries/relational_ext.py::
                   join_auto_salt pins the algebra against an oracle;
                   here we measure the wall-time effect).

Usage: python scripts/skew_check.py [scaled_dir] [hot_pct]
       (defaults: /tmp/ddw_scaled_sf100, 40)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from demo_data_warehouse_spark.session import get_spark


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ddw_scaled_sf100"
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("ddw-skew-check")

    def make_fact(pct: int):
        return (
            spark.read.parquet(f"{src}/events.parquet")
            .select(
                "event_id",
                F.when(F.pmod(F.xxhash64("event_id"), F.lit(100)) < pct, F.lit(7))
                .otherwise(F.col("user_id"))
                .alias("user_id"),
                F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            )
            .localCheckpoint(eager=True)  # freeze inputs: every variant
            # reads the same materialized rows, so wall deltas are join
            # strategy only
        )

    # skewed fact + uniform CONTROL fact measured in the SAME session,
    # interleaved (the bench host drifts between processes; SURVEY 6.2)
    facts = {"skewed": make_fact(hot_pct), "uniform": make_fact(0)}
    dim = (
        facts["uniform"]
        .select("user_id")
        .distinct()
        .withColumn(
            "rate_bps",
            F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(500)) + 1,
        )
        .localCheckpoint(eager=True)
    )
    n, n_dim = facts["skewed"].count(), dim.count()
    hot_rows = facts["skewed"].where(F.col("user_id") == 7).count()
    print(
        json.dumps(
            {"setup": "skew_check", "src": src, "rows": n, "dim_rows": n_dim,
             "hot_rows": hot_rows, "hot_frac": round(hot_rows / n, 3)}
        ),
        flush=True,
    )

    def joined(fact, d, salt_k: int | None):
        if salt_k is None:
            j = fact.join(d, "user_id")
        else:
            salted_dim = d.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1)))
            )
            j = fact.withColumn(
                "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_k)).cast("int")
            ).join(salted_dim, ["user_id", "salt"])
        return j.agg(
            F.count("*").alias("n"),
            F.sum(F.col("cents") * F.col("rate_bps")).alias("weighted"),
        )

    # force the shuffle path: the dim must not broadcast
    base = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    variants = {
        "smj_aqe_off": ({**base, "spark.sql.adaptive.enabled": "false"}, None),
        "smj_aqe_skew": (
            {
                **base,
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                # local-scale thresholds: the production defaults (256 MB
                # / 5x) never trigger on MB-scale partitions
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            },
            None,
        ),
        "salted_k32": ({**base, "spark.sql.adaptive.enabled": "false"}, 32),
    }

    def one_pass(fact, confs, salt_k):
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            t0 = time.time()
            row = joined(fact, dim, salt_k).collect()[0]
            return time.time() - t0, (row["n"], int(row["weighted"]))
        finally:
            for k in confs:
                spark.conf.unset(k)

    # JIT/codegen warmup, then ROUND-ROBIN reps so host drift lands on
    # every variant equally; report the median of 5
    for fact in facts.values():
        for confs, salt_k in variants.values():
            one_pass(fact, confs, salt_k)
    walls: dict[tuple[str, str], list[float]] = {}
    answers: dict[str, set] = {}
    for _ in range(5):
        for fname, fact in facts.items():
            for vname, (confs, salt_k) in variants.items():
                dt, ans = one_pass(fact, confs, salt_k)
                walls.setdefault((fname, vname), []).append(dt)
                answers.setdefault(fname, set()).add(ans)
    for fname in facts:
        # every strategy computes the same answer on the same fact
        assert len(answers[fname]) == 1, answers[fname]
    for (fname, vname), ts in walls.items():
        ts.sort()
        print(
            json.dumps(
                {"fact": fname, "variant": vname, "wall_s": round(ts[len(ts) // 2], 3),
                 "reps": [round(t, 3) for t in ts]}
            ),
            flush=True,
        )
    print(json.dumps({"summary": "skew_check", "answers_match": True}), flush=True)


if __name__ == "__main__":
    main()
