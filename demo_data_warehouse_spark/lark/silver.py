"""Silver layer: SCD2 dims + facts, Spark-first.

Re-expresses get_dim_employee / get_dim_vendor / get_fact_*
(reference dags/utils/etl.py:274-523). The SCD2 delta is the reference's
three-branch assembly (net-new ∪ new-versions ∪ closed-rows); quirks
preserved deliberately (SURVEY §7.3 item 4):

  - closed rows keep the OLD surrogate id (so the MERGE closes the old
    version in place) but their datetime_updated is overwritten with the
    incoming batch's value (reference etl.py:332-340)
  - closed rows get NULL valid_from: the reference drops valid_from when
    projecting to batch columns and never re-adds it, so the MERGE
    UPDATE nulls the stored value (reference etl.py:336-340 — the
    projection at :338 excludes valid_from)
  - leader_sur_id resolution prefers the incoming batch's surrogate id
    over the stored dim's (reference etl.py:302-305)

Scale: dim lookups are broadcast (dims are bounded, HR-sized); the
SCD2 delta is a single left join on the business key — one shuffle per
input, no recompute across legs (see _scd2_assemble).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import nested
from .schemas import DIM_EMPLOYEE, DIM_VENDOR, FACT_ATTENDANCE, FACT_ATTENDANCE_RECORD, FACT_PAYMENT

TS_FMT = "yyyy-MM-dd HH:mm:ss"  # reference DEFAULT_FORMAT_DATETIME (etl.py:52)
SENTINEL = "2099-01-01 12:00:00"  # reference etl.py:317


def _sur_id(key_col: str, ts_col: str = "datetime_updated"):
    """md5(business_key || formatted datetime_updated) — reference etl.py:282-284."""
    return F.md5(F.concat(F.col(key_col), F.date_format(ts_col, TS_FMT)))


def _scd2_assemble(batch: DataFrame, dim_latest: DataFrame, key: str, attr_cols: list[str]) -> DataFrame:
    """SCD2 delta on `key`; batch/dim both carry attr_cols (which
    include the surrogate id and datetime_updated).

    One left join feeds all three legs (same single-pass shape as
    operators/scd2.py — the union-of-three-joins form scans and
    shuffles both inputs three times). Classification mirrors the
    reference's pandas left-merge exactly (reference etl.py:296-317):

      - net-new ⇔ the merged dim ts is NULL — which covers BOTH an
        absent key AND a stored dim row whose datetime_updated is NULL
        (the reference checks datetime_updated_latest.isnull() after
        the merge, so such a row re-opens with no closing row);
      - the join is null-safe on the key (pandas merges NaN keys as
        equal, so a NULL-key batch row matches a NULL-key dim row).
    """
    out_cols = [*attr_cols, "is_current", "valid_from", "valid_to"]
    dim_k = dim_latest.select(
        F.col(key).alias("__k"),
        F.col("datetime_updated").alias("__dim_ts"),
        *[F.col(c).alias(f"__dim_{c}") for c in attr_cols if c != key],
    )
    joined = batch.join(dim_k, batch[key].eqNullSafe(dim_k["__k"]), "left")

    # open row (net-new and new-version share it; reference etl.py:310-329)
    open_s = F.struct(
        *[F.col(c).alias(c) for c in attr_cols],
        F.lit(True).alias("is_current"),
        F.col("datetime_updated").alias("valid_from"),
        F.lit(SENTINEL).cast("timestamp").alias("valid_to"),
    )

    # close the old dim row: old attrs + old sur_id, datetime_updated
    # overwritten by the incoming ts, valid_from dropped→NULL (quirk)
    def _closed_field(c):
        if c in (key, "datetime_updated"):
            return F.col(c).alias(c)
        return F.col(f"__dim_{c}").alias(c)

    closed_s = F.struct(
        *[_closed_field(c) for c in attr_cols],
        F.lit(False).alias("is_current"),
        F.lit(None).cast("timestamp").alias("valid_from"),
        F.col("datetime_updated").alias("valid_to"),
    )
    both = F.array(open_s, closed_s)
    rows = (
        F.when(F.col("__dim_ts").isNull(), F.slice(both, 1, 1))            # net-new
        .when(F.col("__dim_ts") < F.col("datetime_updated"), both)         # changed
        .otherwise(F.slice(both, 1, 0))                                    # no-op
    )
    return joined.select(F.explode(rows).alias("__r")).select("__r.*").select(out_cols)


def build_dim_employee(bronze_employee: DataFrame, dim_latest: DataFrame) -> DataFrame:
    """SCD2 delta for dim_employee (reference dags/utils/etl.py:274-354)."""
    emp = (
        bronze_employee.withColumn("employee_sur_id", _sur_id("user_id"))
        .withColumn("lark_id", nested.person_id(F.col("user")))
        .withColumn("name", nested.person_name(F.col("user")))
        .withColumn("leader_lark_id", nested.person_id(F.col("leader")))
        .withColumn("department_ids", nested.string_list(F.col("department_ids")))
    )
    # leader lookup: batch-first precedence over stored dim (etl.py:302-305)
    new_lk = emp.select(
        F.col("lark_id").alias("__nl_id"), F.col("employee_sur_id").alias("__nl_sur")
    ).where(F.col("__nl_id").isNotNull()).distinct()
    old_lk = dim_latest.select(
        F.col("lark_id").alias("__ol_id"), F.col("employee_sur_id").alias("__ol_sur")
    ).where(F.col("__ol_id").isNotNull()).distinct()
    emp = (
        emp.join(F.broadcast(new_lk), emp.leader_lark_id == F.col("__nl_id"), "left")
        .join(F.broadcast(old_lk), emp.leader_lark_id == F.col("__ol_id"), "left")
        .withColumn("leader_sur_id", F.coalesce("__nl_sur", "__ol_sur"))
    )
    attr_cols = [f.name for f in DIM_EMPLOYEE.fields if f.name not in ("is_current", "valid_from", "valid_to")]
    batch = emp.select(*attr_cols)
    delta = _scd2_assemble(batch, dim_latest, key="user_id", attr_cols=attr_cols)
    return delta.select(*[f.name for f in DIM_EMPLOYEE.fields])


def build_dim_vendor(bronze_vendor: DataFrame, dim_latest: DataFrame) -> DataFrame:
    """SCD2 delta for dim_vendor (reference dags/utils/etl.py:356-422)."""
    ven = bronze_vendor.withColumn(
        "vendor_id", nested.text_value(F.col("vendor_id"))
    ).withColumn("vendor_sur_id", _sur_id("vendor_id"))
    attr_cols = [f.name for f in DIM_VENDOR.fields if f.name not in ("is_current", "valid_from", "valid_to")]
    batch = ven.select(*attr_cols)
    delta = _scd2_assemble(batch, dim_latest, key="vendor_id", attr_cols=attr_cols)
    return delta.select(*[f.name for f in DIM_VENDOR.fields])


def build_fact_attendance_record(bronze_record: DataFrame) -> DataFrame:
    """fact_attendance_record (reference dags/utils/etl.py:424-443).

    The reference left-joins dim_employee and then projects every dim
    column away (schema at dags/utils/dwh/silver/fact_attendance_record.py
    has no sur_id), and a current-dim join can't fan out — so the join
    is a semantic no-op; we declare just the projection and let the
    lineage stay clean.
    """
    return bronze_record.select(*[f.name for f in FACT_ATTENDANCE_RECORD.fields])


def build_fact_attendance(bronze_attendance: DataFrame, dim_employee_cur: DataFrame) -> DataFrame:
    """fact_attendance ⟕ dim_employee → employee_sur_id
    (reference dags/utils/etl.py:453-473)."""
    dim = F.broadcast(
        dim_employee_cur.select("user_id", "employee_sur_id").withColumnRenamed(
            "user_id", "__dim_user_id"
        )
    )
    joined = bronze_attendance.join(
        dim, bronze_attendance.user_id == F.col("__dim_user_id"), "left"
    )
    return joined.select(*[f.name for f in FACT_ATTENDANCE.fields])


def build_fact_payment(
    bronze_payment: DataFrame,
    dim_vendor_cur: DataFrame,
    dim_employee_cur: DataFrame,
) -> DataFrame:
    """fact_payment: nested-cell extraction + two dim hops
    (reference dags/utils/etl.py:475-523)."""
    pay = (
        bronze_payment.withColumn("payment_id", nested.text_value(F.col("payment_id")))
        .withColumn("payment_name", nested.text_value(F.col("payment_name")))
        .withColumn("payment_type", nested.list_head(F.col("payment_type")))
        .withColumn("lark_id", nested.dict_id(F.col("buying_person")))
        .withColumn("buying_person_name", nested.dict_name(F.col("buying_person")))
        .withColumn("vendor_id", nested.text_value(F.col("billing_person")))
    )
    ven = F.broadcast(
        dim_vendor_cur.select(
            F.col("vendor_id").alias("__v_id"), "vendor_sur_id"
        )
    )
    emp = F.broadcast(
        dim_employee_cur.select(
            F.col("lark_id").alias("__e_id"), "employee_sur_id"
        )
    )
    joined = (
        pay.join(ven, pay.vendor_id == F.col("__v_id"), "left")
        .join(emp, pay.lark_id == F.col("__e_id"), "left")
    )
    return joined.select(*[f.name for f in FACT_PAYMENT.fields])
