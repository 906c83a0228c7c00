"""Data-quality primitives: column profiling and rule-based row routing.

The reference's quality surface is implicit — publish-time NOT-NULL key
filtering (reference dags/utils/etl.py:100-106 drop of null-key rows)
and the required-inputs check before a silver build (reference
dags/utils/etl.py:379-384). These two operators make that surface
explicit and general:

  profile     per-column facts (row/null/distinct counts, min/max) —
              what a pipeline asserts drift against before publishing
  check_rules tag each row with the named rules it violates; callers
              split valid/quarantine on the tag (the reference silently
              DROPS bad rows; quarantine keeps them auditable)

Scale: profile is ONE scan — all per-column measures are computed in a
single multi-aggregate pass (exact distincts via Catalyst's Expand,
which multiplies the mapper output |cols|-fold but never re-reads the
table; at 100 TB swap exact n_distinct for approx_count_distinct and
the Expand disappears). check_rules is a pure projection — no shuffle,
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, num_cols: list[str], str_cols: list[str]) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str). Numeric min/max in
    the num_* pair (str_* NULL) and vice versa — min/max are taken on
    the NATIVE type then cast, never on a string-cast (lexicographic
    '9' > '10' would corrupt numeric bounds)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
        ]
    for c in num_cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__mn"),
            F.max(c).cast("double").alias(f"{c}__mx"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__mns"), F.max(c).alias(f"{c}__mxs")]
    wide = df.agg(*aggs)

    # pivot the single wide row to per-column rows via explode(array(
    # struct...)) — NOT a union of per-column selects: Catalyst prunes
    # each union branch down to its own column and re-derives an
    # independent aggregation per branch, turning one scan into |cols|
    # scans (observed; pinned by tests/unit/test_plans.py)
    def pack(c: str, numeric: bool) -> Column:
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__mn") if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"{c}__mx") if numeric else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__mns")).alias("min_str"),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__mxs")).alias("max_str"),
        )

    packed = [pack(c, True) for c in num_cols] + [pack(c, False) for c in str_cols]
    return wide.select(F.explode(F.array(*packed)).alias("p")).select("p.*")


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append `violations`: comma-joined names (sorted) of every rule
    the row FAILS. A rule is a validity predicate; NULL evaluation
    counts as a failure (a row you can't prove valid is not valid) —
    matching SQL `NOT coalesce(pred, FALSE)`. Empty string = clean row."""
    tags = [
        F.when(~F.coalesce(rules[name], F.lit(False)), F.lit(name))
        for name in sorted(rules)
    ]
    return df.withColumn("violations", F.concat_ws(",", *tags))


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined-with-violations). The reference
    drops invalid rows (dags/utils/etl.py:100-106); quarantine preserves
    them for audit/replay instead."""
    tagged = check_rules(df, rules)
    valid = tagged.where(F.col("violations") == "").drop("violations")
    bad = tagged.where(F.col("violations") != "")
    return valid, bad
