"""End-to-end reference-parity test: Lark-shaped CSVs → bronze → silver
→ gold over a temp Warehouse, asserting the reference's exact semantics
(FIXTURES.md §B, SURVEY §5 leg 2) including the documented quirks.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import pandas as pd
import pytest

from demo_data_warehouse_spark.io import Warehouse
from demo_data_warehouse_spark.lark.pipeline import LarkPipeline


def ms(iso: str) -> int:
    return int(datetime.fromisoformat(iso).replace(tzinfo=timezone.utc).timestamp() * 1000)


def md5_sur(key: str, ms_val: int) -> str:
    ts = datetime.fromtimestamp(ms_val // 1000, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    return hashlib.md5((key + ts).encode()).hexdigest()


T1 = ms("2024-01-01T05:00:00")
T2 = ms("2024-01-02T06:00:00")

P1, P2 = "2024-01-01", "2024-01-02"


def write_landing(landing, name, partition, df):
    d = landing / name / partition
    d.mkdir(parents=True, exist_ok=True)
    df.to_csv(d / "data.csv", index=True)  # leading index col like the reference


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wh")
    landing = tmp_path_factory.mktemp("landing")

    emp_p1 = pd.DataFrame(
        {
            "user_id": ["u1", "u2", None],
            "employee_no": ["1", "2", "3"],
            "name": ["x", "y", "z"],
            "user": [
                str([{"id": "ou_u1", "name": "O'Brien"}]),  # apostrophe → UDF fallback
                str([{"id": "ou_u2", "name": "Nguyễn Văn B"}]),
                str([{"id": "ou_u3", "name": "ghost"}]),
            ],
            "employee_type": ["ft", "ft", "ft"],
            "email": ["a@x", "b@x", "c@x"],
            "mobile": ["1", "2", "3"],
            "department_ids": [str(["dep1", "dep2"]), str(["dep1"]), None],
            "departments": ["d", "d", "d"],
            "leader": [None, str([{"id": "ou_u1", "name": "O'Brien"}]), None],
            "join_time": [ms("2023-06-01T00:00:00")] * 3,
            "job_title": ["eng", "pm", "qa"],
            "city": ["HN", "HN", "HN"],
            "gender": ["f", "m", "f"],
            # 'Parent items'/'Created By'/'Modified By' omitted → missing-col fill (P3)
            "Date Created": [T1, T1, T1],
            "Last Modified Date": [T1, T1, T1],
        }
    )
    write_landing(landing, "employee", P1, emp_p1)

    att_p1 = pd.DataFrame(
        {
            "User id": ["u1", "u2"],
            "Result id": ["a1", "a2"],
            "Date": [ms("2024-01-01T00:00:00")] * 2,
            "Employee": ["e", "e"],
            "Group name": ["g", "g"],
            "Shift name": ["s", "s"],
            "Check in record id": ["r1", "r2"],
            # u1: 01:00Z (+7h = 08:00) vs shift 08:30 → 30 early → late_time 30 (quirk)
            # u2: 02:00Z (+7h = 09:00) vs shift 08:30 → 30 late → clipped to 0
            "Check in time": [ms("2024-01-01T01:00:00"), ms("2024-01-01T02:00:00")],
            "Check in shift time": [ms("2024-01-01T08:30:00")] * 2,
            "Check in location name": ["o", "o"],
            "Check in - Is offsite": [True, None],  # None → False fill
            "Check in type": ["t", "t"],
            "Check in result": ["ok", "ok"],
            "Check in result supplement": ["", ""],
            "Check out record id": ["r3", "r4"],
            # u1: 10:00Z (+7h = 17:00) vs shift 17:30 → early_time 30
            "Check out time": [ms("2024-01-01T10:00:00"), None],
            "Check out shift time": [ms("2024-01-01T17:30:00")] * 2,
            "Check out location name": ["o", "o"],
            "Check out - Is offsite": [False, False],
            "Check out type": ["t", "t"],
            "Check out result": ["ok", "ok"],
            "Check out result supplement": ["", ""],
            "Employee type": ["ft", "ft"],
            "Nhân sự không đồng ý phiếu phạt": [False, False],
            "Đi muộn / về sớm": [True, False],
            "Muộn 20p/sớm 20p": [True, False],
            "Giá phạt đi muộn/ về sớm": [str([{"text": 50000}]), 0],  # repr cell (F7)
            "Phạt muộn 20p/sớm 20p": [20000, 0],
            "Tiền phạt": [70000, None],  # None → 0 fill
            "Lý do": ["đi muộn", ""],
        }
    )
    write_landing(landing, "attendance", P1, att_p1)

    rec_p1 = pd.DataFrame(
        {
            "User id": ["u1"],
            "Record id": ["rec1"],
            "Date": [ms("2024-01-01T00:00:00")],
            "Employee": ["e"],
            "Check time": [ms("2024-01-01T01:00:00")],
            "Check location name": ["office"],
            "Is offsite": [None],
        }
    )
    write_landing(landing, "attendance_record", P1, rec_p1)

    ven_p1 = pd.DataFrame(
        {
            "Vendor": [str([{"text": "VENDOR-01"}])],
            "Tên tài khoản": ["Công ty TNHH"],
            "Số tài khoản": ["123"],
            "Ngân hàng": ["VCB"],
            "QR code": [""],
            "Ghi chú": [""],
            "Date Created": [T1],
            "Last Modified Date": [T1],
        }
    )
    write_landing(landing, "vendor", P1, ven_p1)

    pay_p1 = pd.DataFrame(
        {
            "Payment": [str([{"text": "Lunch order"}])],
            "Loại chi phí": [str(["Ăn uống"])],
            "Ngày mua": [ms("2024-01-01T03:00:00")],
            "Tên dự án": ["proj"],
            "Hàng hóa": ["food"],
            "Đơn giá": [str([{"text": 200000}])],  # repr-wrapped numeric
            "Số lượng": [2],
            "Tổng tiền": [400000],
            "Hóa đơn": [""],
            "Minh chứng chuyển khoản": [""],
            "Thông tin người cần chuyển khoản": [str([{"text": "VENDOR-01"}])],
            "Số tài khoản": ["123"],
            "Ngân hàng": ["VCB"],
            "Người mua": [str({"id": "ou_u1", "name": "O'Brien"})],  # dict cell (F4)
            "Ghi chú": [""],
            "CEO duyệt": [True],
            "Kế toán đã thanh toán": [None],
            "Người mua đã nhận được tiền": [False],
            "Ngày CEO duyệt": [ms("2024-01-01T04:00:00")],
            "Ngày kế toán chuyển khoản": [None],
            "Ngày người mua nhận tiền": [None],
            "Payment_ID": [str([{"text": "PAY-001"}])],
        }
    )
    write_landing(landing, "payment", P1, pay_p1)

    # partition 2: u1 updated (new title, newer lmd), u3 net-new, u2 absent
    emp_p2 = emp_p1.iloc[[0]].copy()
    emp_p2["job_title"] = ["principal"]
    emp_p2["Last Modified Date"] = [T2]
    emp_p2["Date Created"] = [T1]
    u3 = emp_p1.iloc[[1]].copy()
    u3["user_id"] = ["u3"]
    u3["user"] = [str([{"id": "ou_u3", "name": "C"}])]
    u3["leader"] = [None]
    u3["Last Modified Date"] = [T2]
    write_landing(landing, "employee", P2, pd.concat([emp_p2, u3], ignore_index=True))

    # sixth, UNREGISTERED table → exercised by the S6 dynamic-discovery
    # tests; must be ingested to bronze with no code change
    proj_p1 = pd.DataFrame(
        {
            "Project Code": ["PRJ-1", "PRJ-2"],
            "Owner Name": ["u1", "u2"],
            "Ghi chú": ["", "x"],
        }
    )
    write_landing(landing, "project", P1, proj_p1)

    from demo_data_warehouse_spark.lark.notify import CollectingNotifier

    wh = Warehouse(spark, str(root))
    pipe = LarkPipeline(spark, wh, str(landing), notifier=CollectingNotifier())
    pipe.run(P1)
    pipe.run(P2)
    return wh, pipe


def test_bronze_null_key_dropped(pipeline_run):
    wh, _ = pipeline_run
    emp = wh.read("bronze", "lark_employee").toPandas()
    assert set(emp[emp.partition_value.astype(str) == P1].user_id) == {"u1", "u2"}


def test_bronze_missing_columns_filled(pipeline_run):
    wh, _ = pipeline_run
    emp = wh.read("bronze", "lark_employee").toPandas()
    assert emp.parent_items.isna().all() and emp.created_by.isna().all()


def test_bronze_messy_numeric_and_bool_fill(pipeline_run):
    wh, _ = pipeline_run
    att = wh.read("bronze", "lark_attendance").toPandas().set_index("attendance_id")
    assert att.loc["a1", "early_late_penalty_price"] == 50000  # [{'text':…}] cell
    assert att.loc["a2", "penalty"] == 0  # null → 0
    assert att.loc["a2", "check_in_is_offsite"] == False  # noqa: E712  null → False


def test_dim_employee_scd2(pipeline_run):
    wh, _ = pipeline_run
    dim = wh.read("silver", "dim_employee").toPandas()
    cur = dim[dim.is_current]
    assert cur.groupby("user_id").size().max() == 1
    assert set(cur.user_id) == {"u1", "u2", "u3"}
    u1 = dim[dim.user_id == "u1"]
    assert len(u1) == 2
    closed = u1[~u1.is_current].iloc[0]
    opened = u1[u1.is_current].iloc[0]
    # exact surrogate ids (F1)
    assert closed.employee_sur_id == md5_sur("u1", T1)
    assert opened.employee_sur_id == md5_sur("u1", T2)
    # closed keeps old attrs, datetime_updated overwritten, valid_from NULLed (quirk)
    assert closed.job_title == "eng"
    assert pd.isna(closed.valid_from)
    assert closed.valid_to == datetime.fromtimestamp(T2 // 1000)
    assert closed.datetime_updated == datetime.fromtimestamp(T2 // 1000)
    assert opened.job_title == "principal"
    assert str(opened.valid_to) == "2099-01-01 12:00:00"
    # apostrophe-bearing repr parsed via fallback (name from user cell);
    # bracket access: Series.name is the pandas index label, not the column
    assert opened["name"] == "O'Brien"
    assert list(opened.department_ids) == ["dep1", "dep2"]


def test_leader_lookup_batch_precedence(pipeline_run):
    wh, _ = pipeline_run
    dim = wh.read("silver", "dim_employee").toPandas()
    u2 = dim[(dim.user_id == "u2") & dim.is_current].iloc[0]
    # u2's leader is u1; resolved from the same batch → u1's T1 sur_id
    assert u2.leader_sur_id == md5_sur("u1", T1)


def test_fact_payment_nested_extraction(pipeline_run):
    wh, _ = pipeline_run
    pay = wh.read("silver", "fact_payment").toPandas().iloc[0]
    assert pay.payment_id == "PAY-001"
    assert pay.payment_name == "Lunch order"
    assert pay.payment_type == "Ăn uống"
    assert pay.buying_person_name == "O'Brien"
    assert pay.price_unit == 200000
    assert pay.employee_sur_id == md5_sur("u1", T1)  # via buying_person lark_id
    ven = wh.read("silver", "dim_vendor").toPandas().iloc[0]
    assert pay.vendor_sur_id == ven.vendor_sur_id
    assert ven.vendor_id == "VENDOR-01"


def test_gold_metrics_exact(pipeline_run):
    wh, _ = pipeline_run
    gold = wh.read("gold", "cube_attendance_report").toPandas().set_index("lark_hrm_code")
    u1, u2 = gold.loc["u1"], gold.loc["u2"]
    # early arrival reported as late_time (clip-abs quirk); actual late → 0
    assert u1.late_time_minute == 30 and u2.late_time_minute == 0
    assert u1.early_time_minute == 30
    assert u2.early_time_minute == 0  # null check_out → fillna(0)
    assert u1.working_duration_hours == 9
    assert u1.working_duration_benchmark == 9
    assert u1.penalty_amount == 70000 and u2.penalty_amount == 0
    assert u1.attendance_month == "2024-01"
    # attendance_date is +7h shifted
    assert str(u1.attendance_date) == "2024-01-01 07:00:00"
    assert u1["hrm_name"] == "O'Brien" and u1["job_title"] == "eng"


def test_replay_idempotent(pipeline_run, spark):
    """ST3/ST4/ST5: re-running partition 2 leaves every table unchanged."""
    wh, pipe = pipeline_run

    def snap():
        out = {}
        for db, t in [
            ("bronze", "lark_employee"),
            ("silver", "dim_employee"),
            ("silver", "fact_attendance"),
            ("gold", "cube_attendance_report"),
        ]:
            df = wh.read(db, t).drop("etl_inserted").toPandas()
            df = df.reindex(sorted(df.columns), axis=1)
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
                df[c] = df[c].astype(str)
            out[(db, t)] = df.sort_values(by=list(df.columns), ignore_index=True)
        return out

    before = snap()
    pipe.run(P2)
    after = snap()
    for k in before:
        pd.testing.assert_frame_equal(before[k], after[k]), k


def test_dynamic_discovery_ingests_unregistered_table(pipeline_run, spark):
    """S6 (reference dags/utils/lark.py:71-112 + lark_to_gcs.py:110-148):
    the module fixture dropped a sixth, unregistered table 'project'
    into landing before the runs — it must land in bronze with
    snake_cased columns and partition stamping, with NO code change."""
    wh, pipe = pipeline_run
    assert "project" in pipe.discover_tables(P1)
    proj = wh.read("bronze", "lark_project").toPandas()
    assert set(proj.project_code) == {"PRJ-1", "PRJ-2"}
    assert "owner_name" in proj.columns  # 'Owner Name' snake_cased
    assert set(proj.partition_value.astype(str)) == {P1}


def test_discover_tables_partition_filter(pipeline_run):
    _, pipe = pipeline_run
    all_t = set(pipe.discover_tables())
    assert {"employee", "attendance", "vendor", "payment", "project"} <= all_t
    # 'project' only has P1 data; P2 discovery must exclude it
    assert "project" not in set(pipe.discover_tables(P2))
    assert "employee" in set(pipe.discover_tables(P2))


def test_infer_bronze_spec_collision_safe():
    from demo_data_warehouse_spark.lark.schemas import infer_bronze_spec

    spec = infer_bronze_spec("x", ["A b", "a_b", "Ghi chú", ""])
    out = spec.out_columns
    assert out[0] == "a_b" and out[1] == "a_b_2"  # no silent column collision
    assert out[2] == "ghi_ch"  # non-ascii folded, not crashed
    assert out[3] == "col"
    assert spec.name == "lark_x"


def test_notifier_success_and_failure(pipeline_run, spark, tmp_path):
    """S11: the run outcome reaches the notifier hook — success per
    completed run, failure (then re-raise) when a stage blows up
    (reference dags/etl/run_etl.py:29-30)."""
    import pytest

    from demo_data_warehouse_spark.io import Warehouse
    from demo_data_warehouse_spark.lark.notify import CollectingNotifier
    from demo_data_warehouse_spark.lark.pipeline import LarkPipeline

    _, pipe = pipeline_run
    # ≥2 runs from the fixture (replay tests may add more) — all succeed
    assert len(pipe.notifier.events) >= 2
    assert all(kind == "success" for kind, _ in pipe.notifier.events)
    assert pipe.notifier.events[0][1]["partition"] == "2024-01-01"

    n = CollectingNotifier()
    broken = LarkPipeline(
        spark, Warehouse(spark, str(tmp_path / "wh")), str(tmp_path / "nolanding"), notifier=n
    )
    broken.build_bronze = lambda p: (_ for _ in ()).throw(RuntimeError("boom"))
    with pytest.raises(RuntimeError):
        broken.run("2024-01-01")
    assert [e[0] for e in n.events] == ["failure"]
    assert "boom" in n.events[0][1]["error"]


def test_scd2_null_dim_ts_classified_net_new(spark):
    """ADVICE parity fix: the reference classifies net-new by NULL
    datetime_updated_latest AFTER a pandas left merge — so a stored
    current dim row with NULL datetime_updated re-opens (no closing
    row), and NaN join keys match each other."""
    import datetime as dt

    from demo_data_warehouse_spark.lark.silver import _scd2_assemble

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    attr_cols = ["k", "sur", "datetime_updated"]
    batch = spark.createDataFrame(
        [("k1", "s1_new", t2), ("k2", "s2_new", t2), (None, "sn_new", t2)],
        "k string, sur string, datetime_updated timestamp",
    )
    dim = spark.createDataFrame(
        [("k1", "s1_old", None), ("k2", "s2_old", t1), (None, "sn_old", t1)],
        "k string, sur string, datetime_updated timestamp",
    )
    out = _scd2_assemble(batch, dim, "k", attr_cols).toPandas()
    by_key = out.groupby(out.k.fillna("<null>"))
    # k1: dim ts NULL → net-new → ONE open row, nothing closed
    k1 = out[out.k == "k1"]
    assert len(k1) == 1 and bool(k1.iloc[0].is_current)
    assert k1.iloc[0].sur == "s1_new"
    # k2: normal change → open + closed
    k2 = out[out.k == "k2"]
    assert len(k2) == 2 and set(k2.is_current) == {True, False}
    # NULL key: matches the NULL-key dim row (pandas NaN-merge parity)
    kn = out[out.k.isna()]
    assert len(kn) == 2 and set(kn.is_current) == {True, False}
    assert set(kn[~kn.is_current].sur) == {"sn_old"}
    del by_key
