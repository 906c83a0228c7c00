"""Schema registry: the single source of truth for table shapes.

Replaces the reference's runtime BigQuery catalog fetch
(reference dags/utils/common/schema_helper.py:10-49). Bronze specs
transcribe the five {raw Lark column → dtype} dicts + rename maps
(reference dags/utils/dwh/bronze/lark/*.py); silver/gold schemas
transcribe the DDL comments (reference dags/utils/dwh/silver/*.py,
dags/utils/dwh/gold/cube_attendance_report.py).

Column kinds drive bronze preprocessing (bronze.py):
    s   string
    ts  epoch-milliseconds → TIMESTAMP (reference data_helper.py:132-137)
    b   bool, null → False               (reference data_helper.py:139-140)
    i   int64 via messy-numeric coercion (reference data_helper.py:109-122,142-145)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


@dataclass(frozen=True)
class BronzeSpec:
    name: str                       # bronze table name
    cols: tuple[tuple[str, str], ...]  # (raw Lark column, kind)
    renames: dict[str, str]         # raw → snake_case
    primary_keys: tuple[str, ...]

    @property
    def out_columns(self) -> list[str]:
        return [self.renames.get(raw, raw) for raw, _ in self.cols]


# reference dags/utils/dwh/bronze/lark/employee.py:25-53
EMPLOYEE = BronzeSpec(
    name="lark_employee",
    cols=(
        ("user_id", "s"), ("employee_no", "s"), ("name", "s"), ("user", "s"),
        ("employee_type", "s"), ("email", "s"), ("mobile", "s"),
        ("department_ids", "s"), ("departments", "s"), ("leader", "s"),
        ("join_time", "ts"), ("job_title", "s"), ("city", "s"), ("gender", "s"),
        ("Parent items", "s"), ("Created By", "s"), ("Modified By", "s"),
        ("Date Created", "ts"), ("Last Modified Date", "ts"),
    ),
    renames={
        "Parent items": "parent_items", "Created By": "created_by",
        "Modified By": "modified_by", "Date Created": "datetime_created",
        "Last Modified Date": "datetime_updated",
    },
    primary_keys=("user_id", "partition_value"),
)

# reference dags/utils/dwh/bronze/lark/attendance_record.py:13-31
ATTENDANCE_RECORD = BronzeSpec(
    name="lark_attendance_record",
    cols=(
        ("User id", "s"), ("Record id", "s"), ("Date", "ts"), ("Employee", "s"),
        ("Check time", "ts"), ("Check location name", "s"), ("Is offsite", "b"),
    ),
    renames={
        "User id": "user_id", "Record id": "attendance_record_id",
        "Date": "attendance_date", "Employee": "employee",
        "Check time": "check_time", "Check location name": "check_location_name",
        "Is offsite": "is_offsite",
    },
    primary_keys=("attendance_record_id", "partition_value"),
)

# reference dags/utils/dwh/bronze/lark/attendance.py:36-100
ATTENDANCE = BronzeSpec(
    name="lark_attendance",
    cols=(
        ("User id", "s"), ("Result id", "s"), ("Date", "ts"), ("Employee", "s"),
        ("Group name", "s"), ("Shift name", "s"),
        ("Check in record id", "s"), ("Check in time", "ts"),
        ("Check in shift time", "ts"), ("Check in location name", "s"),
        ("Check in - Is offsite", "b"), ("Check in type", "s"),
        ("Check in result", "s"), ("Check in result supplement", "s"),
        ("Check out record id", "s"), ("Check out time", "ts"),
        ("Check out shift time", "ts"), ("Check out location name", "s"),
        ("Check out - Is offsite", "b"), ("Check out type", "s"),
        ("Check out result", "s"), ("Check out result supplement", "s"),
        ("Employee type", "s"),
        ("Nhân sự không đồng ý phiếu phạt", "b"), ("Đi muộn / về sớm", "b"),
        ("Muộn 20p/sớm 20p", "b"), ("Giá phạt đi muộn/ về sớm", "i"),
        ("Phạt muộn 20p/sớm 20p", "i"), ("Tiền phạt", "i"), ("Lý do", "s"),
    ),
    renames={
        "User id": "user_id", "Result id": "attendance_id",
        "Date": "attendance_date", "Employee": "employee",
        "Group name": "group_name", "Shift name": "shift_name",
        "Check in record id": "check_in_record_id",
        "Check in time": "check_in_datetime",
        "Check in shift time": "check_in_shift_time",
        "Check in location name": "check_in_location_name",
        "Check in - Is offsite": "check_in_is_offsite",
        "Check in type": "check_in_type", "Check in result": "check_in_result",
        "Check in result supplement": "check_in_result_supplement",
        "Check out record id": "check_out_record_id",
        "Check out time": "check_out_datetime",
        "Check out shift time": "check_out_shift_time",
        "Check out location name": "check_out_location_name",
        "Check out - Is offsite": "check_out_is_offsite",
        "Check out type": "check_out_type", "Check out result": "check_out_result",
        "Check out result supplement": "check_out_result_supplement",
        "Employee type": "employee_type",
        "Nhân sự không đồng ý phiếu phạt": "request_penalty",
        "Đi muộn / về sớm": "early_late",
        "Muộn 20p/sớm 20p": "early_late_20_min",
        "Giá phạt đi muộn/ về sớm": "early_late_penalty_price",
        "Phạt muộn 20p/sớm 20p": "penalty_early_late_20_min",
        "Tiền phạt": "penalty", "Lý do": "reason",
    },
    primary_keys=("attendance_id", "partition_value"),
)

# reference dags/utils/dwh/bronze/lark/payment.py:28-76
PAYMENT = BronzeSpec(
    name="lark_payment",
    cols=(
        ("Payment", "s"), ("Loại chi phí", "s"), ("Ngày mua", "ts"),
        ("Tên dự án", "s"), ("Hàng hóa", "s"), ("Đơn giá", "i"),
        ("Số lượng", "i"), ("Tổng tiền", "i"), ("Hóa đơn", "s"),
        ("Minh chứng chuyển khoản", "s"),
        ("Thông tin người cần chuyển khoản", "s"), ("Số tài khoản", "s"),
        ("Ngân hàng", "s"), ("Người mua", "s"), ("Ghi chú", "s"),
        ("CEO duyệt", "b"), ("Kế toán đã thanh toán", "b"),
        ("Người mua đã nhận được tiền", "b"), ("Ngày CEO duyệt", "ts"),
        ("Ngày kế toán chuyển khoản", "ts"), ("Ngày người mua nhận tiền", "ts"),
        ("Payment_ID", "s"),
    ),
    renames={
        "Payment": "payment_name", "Loại chi phí": "payment_type",
        "Ngày mua": "payment_date", "Tên dự án": "project_name",
        "Hàng hóa": "goods", "Đơn giá": "price_unit", "Số lượng": "quantity",
        "Tổng tiền": "price_total", "Hóa đơn": "bill_image",
        "Minh chứng chuyển khoản": "billing_evidence",
        "Thông tin người cần chuyển khoản": "billing_person",
        "Số tài khoản": "bank_acc_number", "Ngân hàng": "bank_holder",
        "Người mua": "buying_person", "Ghi chú": "note",
        "CEO duyệt": "was_approved_by_ceo",
        "Kế toán đã thanh toán": "was_paid_by_accountant",
        "Người mua đã nhận được tiền": "was_recieve",
        "Ngày CEO duyệt": "ceo_approved_datetime",
        "Ngày kế toán chuyển khoản": "accountant_paid_datetime",
        "Ngày người mua nhận tiền": "recieve_datetime",
        "Payment_ID": "payment_id",
    },
    primary_keys=("payment_id", "partition_value"),
)

# reference dags/utils/dwh/bronze/lark/vendor.py:12-32
VENDOR = BronzeSpec(
    name="lark_vendor",
    cols=(
        ("Vendor", "s"), ("Tên tài khoản", "s"), ("Số tài khoản", "s"),
        ("Ngân hàng", "s"), ("QR code", "s"), ("Ghi chú", "s"),
        ("Date Created", "ts"), ("Last Modified Date", "ts"),
    ),
    renames={
        "Vendor": "vendor_id", "Tên tài khoản": "bank_holder_name",
        "Số tài khoản": "bank_acc_number", "Ngân hàng": "bank_holder",
        "QR code": "qr_code", "Ghi chú": "note",
        "Date Created": "datetime_created",
        "Last Modified Date": "datetime_updated",
    },
    primary_keys=("vendor_id", "partition_value"),
)

BRONZE_SPECS = {
    "employee": EMPLOYEE,
    "attendance_record": ATTENDANCE_RECORD,
    "attendance": ATTENDANCE,
    "payment": PAYMENT,
    "vendor": VENDOR,
}


def snake_case(raw: str) -> str:
    """Raw Lark column label → snake_case identifier (the same shape the
    hand-written rename maps produce: 'Parent items' → 'parent_items')."""
    import re

    s = re.sub(r"[^0-9a-zA-Z]+", "_", raw).strip("_").lower()
    return s or "col"


def infer_bronze_spec(logical_name: str, raw_columns: list[str]) -> BronzeSpec:
    """S6 dynamic-catalog analog: a landing table with NO registered spec
    still lands in bronze — every column kept as string, auto snake_case
    renames, no primary-key filter. Mirrors the reference's
    discovery-driven ingestion (dags/utils/lark.py:71-112 `get_tables`
    feeding dags/ingestion/lark_to_gcs.py:110-148 `expand_kwargs`): a
    newly created Bitable is ingested with zero code change; typed
    bronze treatment starts when a spec is registered."""
    renames: dict[str, str] = {}
    seen: set[str] = set()
    for raw in raw_columns:
        cand = snake_case(raw)
        i, base = 2, cand
        while cand in seen:  # collision-proof: 'A b' and 'a_b' both present
            cand, i = f"{base}_{i}", i + 1
        seen.add(cand)
        if cand != raw:
            renames[raw] = cand
    return BronzeSpec(
        name=f"lark_{logical_name}",
        cols=tuple((raw, "s") for raw in raw_columns),
        renames=renames,
        primary_keys=(),
    )


def _f(name, t, nullable=True):
    return StructField(name, t, nullable)


_S, _T, _B, _L, _D = StringType(), TimestampType(), BooleanType(), LongType(), DateType()

# reference dags/utils/dwh/silver/dim_employee.py:1-23
DIM_EMPLOYEE = StructType(
    [
        _f("user_id", _S), _f("lark_id", _S), _f("employee_sur_id", _S),
        _f("employee_no", _S), _f("name", _S), _f("employee_type", _S),
        _f("email", _S), _f("mobile", _S),
        _f("department_ids", ArrayType(_S)), _f("leader_sur_id", _S),
        _f("join_time", _T), _f("job_title", _S), _f("city", _S),
        _f("gender", _S), _f("datetime_created", _T), _f("datetime_updated", _T),
        _f("valid_from", _T), _f("valid_to", _T), _f("is_current", _B),
    ]
)

# reference dags/utils/dwh/silver/dim_vendor.py:1-16
DIM_VENDOR = StructType(
    [
        _f("vendor_id", _S), _f("vendor_sur_id", _S), _f("bank_holder_name", _S),
        _f("bank_acc_number", _S), _f("bank_holder", _S), _f("qr_code", _S),
        _f("note", _S), _f("datetime_created", _T), _f("datetime_updated", _T),
        _f("valid_from", _T), _f("valid_to", _T), _f("is_current", _B),
    ]
)

# reference dags/utils/dwh/silver/fact_attendance.py:1-32
FACT_ATTENDANCE = StructType(
    [
        _f("attendance_id", _S), _f("attendance_date", _T), _f("user_id", _S),
        _f("employee_sur_id", _S), _f("group_name", _S), _f("shift_name", _S),
        _f("check_in_record_id", _S), _f("check_in_shift_time", _T),
        _f("check_in_datetime", _T), _f("check_in_location_name", _S),
        _f("check_in_is_offsite", _B), _f("check_in_type", _S),
        _f("check_in_result", _S), _f("check_in_result_supplement", _S),
        _f("check_out_record_id", _S), _f("check_out_shift_time", _T),
        _f("check_out_datetime", _T), _f("check_out_location_name", _S),
        _f("check_out_is_offsite", _B), _f("check_out_type", _S),
        _f("check_out_result", _S), _f("check_out_result_supplement", _S),
        _f("request_penalty", _B), _f("early_late", _B),
        _f("early_late_20_min", _B), _f("penalty_early_late_20_min", _L),
        _f("penalty", _L), _f("reason", _S),
    ]
)

# reference dags/utils/dwh/silver/fact_attendance_record.py:1-10
FACT_ATTENDANCE_RECORD = StructType(
    [
        _f("user_id", _S), _f("attendance_record_id", _S), _f("check_time", _T),
        _f("check_location_name", _S), _f("is_offsite", _B),
        _f("attendance_date", _T),
    ]
)

# reference dags/utils/dwh/silver/fact_payment.py:1-25
FACT_PAYMENT = StructType(
    [
        _f("payment_id", _S), _f("payment_name", _S), _f("payment_type", _S),
        _f("payment_date", _T), _f("project_name", _S), _f("goods", _S),
        _f("price_unit", _L), _f("quantity", _L), _f("price_total", _L),
        _f("bill_image", _S), _f("billing_evidence", _S),
        _f("buying_person_name", _S), _f("employee_sur_id", _S),
        _f("vendor_sur_id", _S), _f("note", _S), _f("was_approved_by_ceo", _B),
        _f("was_paid_by_accountant", _B), _f("was_recieve", _B),
        _f("ceo_approved_datetime", _T), _f("accountant_paid_datetime", _T),
        _f("recieve_datetime", _T),
    ]
)

# reference dags/utils/dwh/gold/cube_attendance_report.py:1-14
# metric columns are INT64 in the DDL but float-computed — the catalog
# cast truncates (SURVEY §7.3 item 4); attendance_date DDL says DATE but
# the schema-apply path coerces the formatted string back to TIMESTAMP
CUBE_ATTENDANCE_REPORT = StructType(
    [
        _f("attendance_month", _S), _f("attendance_date", _T),
        _f("lark_hrm_code", _S), _f("hrm_name", _S), _f("job_title", _S),
        _f("late_time_minute", _L), _f("early_time_minute", _L),
        _f("working_duration_hours", _L), _f("working_duration_benchmark", _L),
        _f("penalty_amount", _L),
    ]
)

SILVER_SCHEMAS = {
    "dim_employee": DIM_EMPLOYEE,
    "dim_vendor": DIM_VENDOR,
    "fact_attendance": FACT_ATTENDANCE,
    "fact_attendance_record": FACT_ATTENDANCE_RECORD,
    "fact_payment": FACT_PAYMENT,
}
GOLD_SCHEMAS = {"cube_attendance_report": CUBE_ATTENDANCE_REPORT}
