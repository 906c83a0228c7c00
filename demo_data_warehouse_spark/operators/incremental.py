"""Incremental aggregate maintenance — update a gold rollup from a
delta without recomputing from raw facts.

The reference rebuilds its gold layer from silver on every run
(reference dags/utils/etl.py:616-677 — full recompute each schedule
tick). That is affordable at pandas scale and ruinous at 100 TB: the
scale-correct pattern is to keep the stored gold table in *partial
aggregate* form (algebraic state: count / sum / min / max per group),
partially aggregate only the delta (a delta-sized map-side combine +
one |groups|-bounded shuffle), and merge states. Raw history is never
re-read; the merge input is |stored groups| + |delta groups| rows.

All maintained aggregates must be algebraic (mergeable): count-sum-min-
max here, avg derived at finalize. Sums accumulate in exact fixed-point
bigint (queries/core.py `csum` rationale) so merge order cannot change
the value and the state stays a primitive long inside whole-stage
codegen.

At 100 TB: stored partials are a partitioned table keyed by group;
merging is groupBy(keys) over (stored ∪ delta_partials) — the shuffle
moves aggregate state, never fact rows. AQE coalesces the tiny
post-merge partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_c", "min_c", "max_c")


def _lift(measure: str | Column, dp: int) -> Column:
    col = F.col(measure) if isinstance(measure, str) else measure
    return F.round(col * (10**dp)).cast("bigint")


def rollup_partials(
    df: DataFrame, keys: Sequence[str], measure: str, dp: int = 2
) -> DataFrame:
    """Partial (mergeable) aggregate state of `measure` per `keys`:
    (n_rows, sum_c, min_c, max_c) with the measure lifted losslessly to
    fixed-point ints (dp decimal places)."""
    c = _lift(measure, dp)
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(c).alias("sum_c"),
        F.min(c).alias("min_c"),
        F.max(c).alias("max_c"),
    )


def merge_partials(
    stored: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Merge two partial-state tables. Associative + commutative, so a
    nightly delta, a replayed delta batch, or a 1000-way tree merge all
    produce identical state."""
    keys = list(keys)
    cols = keys + list(STATE_COLS)
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return both.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_c").alias("sum_c"),
        F.min("min_c").alias("min_c"),
        F.max("max_c").alias("max_c"),
    )


def finalize_rollup(partials: DataFrame, keys: Sequence[str], dp: int = 2) -> DataFrame:
    """Resolve partial state into the user-facing aggregate row
    (count / sum / avg / min / max), one final cast to DOUBLE."""
    scale = float(10**dp)
    return partials.select(
        *keys,
        F.col("n_rows"),
        (F.col("sum_c").cast("double") / scale).alias("sum_value"),
        (F.col("sum_c").cast("double") / scale / F.col("n_rows")).alias("avg_value"),
        (F.col("min_c").cast("double") / scale).alias("min_value"),
        (F.col("max_c").cast("double") / scale).alias("max_value"),
    )
