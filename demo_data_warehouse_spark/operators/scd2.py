"""SCD2 slowly-changing-dimension delta builder (SURVEY §2.3 J5-J7, §2.8 F1/F16/F19).

Generalizes the reference's dim_employee / dim_vendor build
(reference dags/utils/etl.py:274-354, 356-422):

  net-new   = batch keys absent from the current dim        (J5) → open row
  new-ver   = batch ⋈ dim where dim.ts < batch.ts           (J6) → open row
  closed    = dim ⋈ batch where dim.ts < batch.ts           (J7) → the dim's
              old row with is_current=False, valid_to=batch.ts, and —
              reference quirk preserved — datetime_updated overwritten by the
              incoming ts while KEEPING the old surrogate id
              (reference dags/utils/etl.py:332-340)

  delta = net-new ∪ new-ver ∪ closed   (U1, reference dags/utils/etl.py:342-344)

Surrogate id = md5(business_key || strftime(ts, '%Y-%m-%d %H:%M:%S'))
(reference dags/utils/etl.py:52,282-284) — JVM-native md5/concat, no UDF.

The delta feeds operators.merge.merge_upsert on the surrogate id (the
reference merges on sur_id alone, dags/utils/etl.py:542,559), which both
inserts the new versions and closes the old ones in place.

Scale: all three legs come out of ONE left join on the business key —
each joined row emits 0–2 delta rows through a typed array + explode
(net-new → [open], changed → [open, closed], unchanged → []). The
union-of-three-joins formulation would scan and shuffle both inputs
three times (verified: 6 Exchanges in the physical plan); this shape
plans 2 input shuffles + 1 join, pinned by
tests/unit/test_plans.py::test_scd2_single_join_no_recompute.
The dim side is filtered to is_current before the join so only the
live snapshot shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTINEL_TS = "2099-01-01 12:00:00"  # far-future valid_to (reference dags/utils/etl.py:317)
TS_FMT = "yyyy-MM-dd HH:mm:ss"


def surrogate_id(key_col, ts_col):
    """md5(key || formatted ts) — F1."""
    return F.md5(F.concat(F.col(key_col).cast("string"), F.date_format(ts_col, TS_FMT)))


def scd2_delta(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    sur_id_col: str = "sur_id",
) -> DataFrame:
    """Build the SCD2 delta (rows to MERGE) from a current-dim snapshot
    and an incoming batch.

    dim columns:   key, sur_id_col, *attr_cols, ts_col, valid_from, valid_to, is_current
    batch columns: key, *attr_cols, ts_col
    """
    out_cols = [key, sur_id_col, *attr_cols, ts_col, "valid_from", "valid_to", "is_current"]
    dim_cur = dim.where(F.col("is_current"))

    # single join feeding all three legs (see module docstring)
    dim_ts = dim_cur.select(
        F.col(key),
        F.col(ts_col).alias("__dim_ts"),
        F.col(sur_id_col).alias("__dim_sur"),
        F.col("valid_from").alias("__dim_valid_from"),
        *[F.col(c).alias(f"__dim_{c}") for c in attr_cols],
    )
    joined = batch.join(dim_ts, on=key, how="left")

    # J5/J6: the open row (net-new and new-version are the same shape)
    open_s = F.struct(
        surrogate_id(key, ts_col).alias(sur_id_col),
        *[F.col(c).alias(c) for c in attr_cols],
        F.col(ts_col).alias(ts_col),
        F.col(ts_col).alias("valid_from"),
        F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # J7: close the old dim row — old sur_id/attrs/valid_from kept,
    # datetime_updated overwritten by the incoming ts (reference quirk)
    closed_s = F.struct(
        F.col("__dim_sur").alias(sur_id_col),
        *[F.col(f"__dim_{c}").alias(c) for c in attr_cols],
        F.col(ts_col).alias(ts_col),
        F.col("__dim_valid_from").alias("valid_from"),
        F.col(ts_col).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    both = F.array(open_s, closed_s)
    rows = (
        F.when(F.col("__dim_sur").isNull(), F.slice(both, 1, 1))   # net-new
        .when(F.col("__dim_ts") < F.col(ts_col), both)             # changed
        .otherwise(F.slice(both, 1, 0))                            # no-op
    )
    return (
        joined.select(F.col(key), F.explode(rows).alias("__r"))
        .select(key, "__r.*")
        .select(out_cols)
    )
