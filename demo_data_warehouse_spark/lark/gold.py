"""Gold layer: cube_attendance_report (reference dags/utils/etl.py:616-677).

Reference quirks preserved exactly (SURVEY §7.3 item 4):
  - +7h shift applied to attendance_date and to the check_in/check_out
    side of the late/early comparisons, but NOT to the shift-time
    benchmark columns (etl.py:631,640-653)
  - late/early = ((checked + 7h) - shift).minutes.clip(upper=0).abs():
    EARLY arrival is reported as late_time_minute and actual lateness
    reports 0 (etl.py:640-647)
  - metrics are float-computed then truncated to INT64 by the catalog
    cast (gold DDL dags/utils/dwh/gold/cube_attendance_report.py:7-11)
  - attendance_date is formatted to a string and coerced back → second
    precision TIMESTAMP (etl.py:633 + schema-apply)
  - the re-parse of check columns with format '%d/%m/%Y %H:%M' is a
    pandas no-op on already-datetime columns (etl.py:637-639) → identity
  - all-null derived rows dropped (etl.py:655)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import CUBE_ATTENDANCE_REPORT

_7H = 7 * 3600


def _clip0_abs_minutes(checked_col: str, shift_col: str):
    """((checked + 7h) − shift) in minutes, clip(upper=0).abs(), null→0."""
    diff_min = (
        F.unix_timestamp(checked_col) + F.lit(_7H) - F.unix_timestamp(shift_col)
    ) / 60.0
    return F.coalesce(F.abs(F.least(diff_min, F.lit(0.0))), F.lit(0.0))


def build_cube_attendance_report(
    fact_attendance: DataFrame, dim_employee_cur: DataFrame
) -> DataFrame:
    dim = F.broadcast(
        dim_employee_cur.select(
            F.col("user_id").alias("__d_user_id"), "name", "job_title"
        )
    )
    m = fact_attendance.drop("name", "job_title").join(
        dim, fact_attendance.user_id == F.col("__d_user_id"), "left"
    )
    shifted = F.col("attendance_date") + F.expr("INTERVAL 7 HOURS")
    hours = lambda a, b: F.coalesce(
        (F.unix_timestamp(a) - F.unix_timestamp(b)) / 3600.0, F.lit(0.0)
    )
    report = m.select(
        F.date_format(shifted, "yyyy-MM").alias("attendance_month"),
        F.date_format(shifted, "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp")
        .alias("attendance_date"),
        F.col("user_id").alias("lark_hrm_code"),
        F.col("name").alias("hrm_name"),
        F.col("job_title"),
        _clip0_abs_minutes("check_in_datetime", "check_in_shift_time")
        .cast("long")
        .alias("late_time_minute"),
        _clip0_abs_minutes("check_out_datetime", "check_out_shift_time")
        .cast("long")
        .alias("early_time_minute"),
        hours("check_out_datetime", "check_in_datetime")
        .cast("long")
        .alias("working_duration_hours"),
        hours("check_out_shift_time", "check_in_shift_time")
        .cast("long")
        .alias("working_duration_benchmark"),
        F.col("penalty").alias("penalty_amount"),
    )
    return report.na.drop("all").select(*[f.name for f in CUBE_ATTENDANCE_REPORT.fields])
