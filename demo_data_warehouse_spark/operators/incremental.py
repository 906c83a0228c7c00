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
    """Merge two partial-state tables. Associative + commutative, so
    any merge ORDER or grouping (nightly deltas, a 1000-way tree merge)
    produces identical state. NOT idempotent: merging the same delta
    twice double-counts n_rows/sum_c — replay protection is the SINK's
    job (streaming/pipeline.py's _applied_batch marker / TransactionLog
    meta batch_id), never the algebra's."""
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


# ---------------------------------------------------------------------------
# DISTINCT — the one common aggregate that is not algebraic. Two
# incremental strategies, both state-mergeable:
#
#   exact   state = the distinct (keys, col) pairs; merge = union ∪
#           distinct (co-partitioned shuffle on the pair); finalize =
#           count per key. State is |distinct pairs| — exact but big.
#   sketch  state = one HLL sketch per group (Datasketches HLL via
#           hll_sketch_agg); merge = hll_union_agg over |groups| rows;
#           finalize = hll_sketch_estimate. State is O(|groups| · 2^lgk)
#           regardless of cardinality — the 100 TB default; trades
#           ~1-2% error (lgk=12) for constant-size state.
# ---------------------------------------------------------------------------


def distinct_state(df: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """Exact-distinct partial state: the distinct (keys, col) pairs."""
    return df.select(*keys, col).distinct()


def merge_distinct_state(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge exact-distinct states (idempotent: re-merging a replayed
    delta cannot double-count — union ∪ distinct absorbs duplicates)."""
    return stored.unionByName(delta).distinct()


def finalize_distinct(
    state: DataFrame, keys: Sequence[str], alias: str = "n_distinct"
) -> DataFrame:
    return state.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


# ---------------------------------------------------------------------------
# QUANTILES — also not algebraic exactly, but mergeable via a fixed
# binning: state = per-group counts over nbins equal-width value bins.
# Merge = summing counts (associative/commutative, replay gives the
# same state only if the delta split is disjoint — same contract as
# rollup_partials). Finalize walks the cumulative histogram. The
# estimate is DETERMINISTIC (bin midpoint), so unlike percentile_approx
# it is oracle-checkable bit-for-bit; error is bounded by width/2.
# At 100 TB the state is O(|groups| · nbins) longs — constant in rows.
# ---------------------------------------------------------------------------


def quantile_state(
    df: DataFrame,
    keys: Sequence[str],
    measure: str,
    lo: float,
    width: float,
    nbins: int,
) -> DataFrame:
    """Binned-histogram partial state: rows per (keys, bin) where
    bin = clamp(floor((measure - lo)/width), 0, nbins-1). Out-of-range
    values saturate into the edge bins (visible as edge-midpoint
    estimates rather than silently dropped rows)."""
    b = F.floor((F.col(measure) - F.lit(lo)) / F.lit(width)).cast("bigint")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1))
    return df.groupBy(*keys, b.alias("bin")).agg(F.count("*").alias("n"))


def merge_quantile_state(
    stored: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    keys = list(keys)
    cols = keys + ["bin", "n"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return both.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))


def finalize_quantile(
    state: DataFrame,
    keys: Sequence[str],
    lo: float,
    width: float,
    q_num: int = 1,
    q_den: int = 2,
    alias: str = "quantile_est",
) -> DataFrame:
    """Resolve histogram state to the q = q_num/q_den quantile estimate:
    midpoint of the first bin whose cumulative count reaches q·total.
    The comparison is integer-exact (cum·q_den >= total·q_num) so Spark
    and a SQL oracle cannot disagree by float rounding."""
    from pyspark.sql import Window

    keys = list(keys)
    w_cum = Window.partitionBy(*keys).orderBy("bin")
    w_all = Window.partitionBy(*keys)
    cum = state.select(
        *keys,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    hit = cum.where(F.col("cum") * F.lit(q_den) >= F.col("total") * F.lit(q_num))
    mid = (F.col("bin") + F.lit(0.5)) * F.lit(width) + F.lit(lo)
    return hit.groupBy(*keys).agg(F.min(mid).cast("double").alias(alias))


def hll_partials(
    df: DataFrame, keys: Sequence[str], col: str, lgk: int = 12
) -> DataFrame:
    """Sketch partial state: one HLL sketch per group. `col` must be
    int/bigint/string/binary (hll_sketch_agg's domain) — cast other
    types explicitly so the representation choice is visible."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("hll")
    )


def merge_hll(stored: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    keys = list(keys)
    cols = keys + ["hll"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return both.groupBy(*keys).agg(F.hll_union_agg(F.col("hll")).alias("hll"))


def finalize_hll(
    partials: DataFrame, keys: Sequence[str], alias: str = "approx_distinct"
) -> DataFrame:
    return partials.select(*keys, F.hll_sketch_estimate(F.col("hll")).alias(alias))
