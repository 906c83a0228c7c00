"""SCD2 slowly-changing-dimension delta builder (SURVEY §2.3 J5-J7, §2.8 F1/F16/F19).

Generalizes the reference's dim_employee / dim_vendor build
(reference dags/utils/etl.py:274-354, 356-422):

  net-new   = batch keys absent from the current dim        (left-anti, J5)
  new-ver   = batch ⋈ dim where dim.ts < batch.ts           (J6) → open rows
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

Scale: one shuffle on the business key for the join trio (Catalyst
reuses the exchange); the dim side is filtered to is_current before the
join so only the live snapshot shuffles.
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

    def open_row(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key),
            surrogate_id(key, ts_col).alias(sur_id_col),
            *[F.col(c) for c in attr_cols],
            F.col(ts_col),
            F.col(ts_col).alias("valid_from"),
            F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    # J5: net-new keys
    net_new = open_row(batch.join(dim_cur, on=key, how="left_anti"))

    # shared join for J6/J7 — batch vs live dim, changed keys only
    dim_ts = dim_cur.select(
        F.col(key),
        F.col(ts_col).alias("__dim_ts"),
        F.col(sur_id_col).alias("__dim_sur"),
        F.col("valid_from").alias("__dim_valid_from"),
        *[F.col(c).alias(f"__dim_{c}") for c in attr_cols],
    )
    changed = (
        batch.join(dim_ts, on=key, how="inner")
        .where(F.col("__dim_ts") < F.col(ts_col))
    )

    # J6: new open versions from the batch side
    new_ver = open_row(changed.select(key, ts_col, *attr_cols))

    # J7: close the old dim rows — old sur_id/attrs/valid_from kept,
    # datetime_updated overwritten by the incoming ts (reference quirk)
    closed = changed.select(
        F.col(key),
        F.col("__dim_sur").alias(sur_id_col),
        *[F.col(f"__dim_{c}").alias(c) for c in attr_cols],
        F.col(ts_col),
        F.col("__dim_valid_from").alias("valid_from"),
        F.col(ts_col).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )

    return net_new.select(out_cols).unionByName(new_ver.select(out_cols)).unionByName(
        closed.select(out_cols)
    )
