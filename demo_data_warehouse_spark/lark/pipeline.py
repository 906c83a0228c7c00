"""LarkPipeline: the full medallion run (reference dags/utils/etl.py:106-131
and dags/etl/run_etl.py:36-56), Spark-first over a local Warehouse.

Per partition (one run of the 5-minute tick):
  1. bronze: landing CSVs → preprocess → partition-replace publish
  2. silver dims: read current snapshot → build SCD2 delta → MERGE →
     read the dims BACK so facts join the post-merge snapshot
     (mid-flight publish/read-back, reference etl.py:566-578)
  3. silver facts: join current dims → partition-replace publish
  4. gold: cube_attendance_report → partition-replace publish

Landing layout mirrors the lake layout:
  {landing}/{logical_name}/{partition}/data.csv
(reference gs://…/lark/<table_id>/<date>/data.csv,
dags/ingestion/lark_to_gcs.py:85; the opaque Lark table ids become
logical names here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Warehouse
from . import bronze as bronze_mod
from . import gold as gold_mod
from . import silver as silver_mod
from .schemas import (
    BRONZE_SPECS,
    DIM_EMPLOYEE,
    DIM_VENDOR,
    GOLD_SCHEMAS,
    SILVER_SCHEMAS,
    infer_bronze_spec,
)


class LarkPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: Warehouse,
        landing_dir: str,
        notifier=None,
    ):
        from .notify import LogNotifier

        self.spark = spark
        self.wh = warehouse
        self.landing = landing_dir
        self.notifier = notifier or LogNotifier()

    # -- bronze ------------------------------------------------------------

    def load_landing(self, name: str, partition: str) -> DataFrame | None:
        """S1: partition-addressed CSV read; missing object → None
        (reference dags/utils/common/data_helper.py:28-37). The landing
        CSVs carry a leading pandas index column (reference writes
        df.to_csv with index; reader uses index_col=0) — dropped here."""
        path = os.path.join(self.landing, name, partition, "data.csv")
        if not os.path.exists(path):
            return None
        df = self.spark.read.option("header", True).option("multiLine", True).option(
            "escape", '"'
        ).csv(path)
        first = df.columns[0]
        if first in ("", "_c0"):
            df = df.drop(first)
        return df

    def discover_tables(self, partition: str | None = None) -> list[str]:
        """S6: runtime source-catalog discovery over the landing dir —
        the local analog of the reference's paginated Bitable listing
        (dags/utils/lark.py:71-112 `get_tables`) that the ingestion DAG
        fans out over (dags/ingestion/lark_to_gcs.py:110-148
        `expand_kwargs`): a table newly dropped into the source is
        ingested with no code change. With `partition`, only tables
        that actually have data for that partition are returned."""
        if not os.path.isdir(self.landing):
            return []
        names = []
        for name in sorted(os.listdir(self.landing)):
            d = os.path.join(self.landing, name)
            if not os.path.isdir(d):
                continue
            if partition is not None and not os.path.exists(
                os.path.join(d, partition, "data.csv")
            ):
                continue
            names.append(name)
        return names

    def build_bronze(self, partition: str) -> dict[str, DataFrame | None]:
        """Bronze over the union of registered specs and discovered
        tables. Registered tables get their typed spec; discovered
        unregistered tables get an inferred all-string spec
        (infer_bronze_spec) so ingestion never needs a code change."""
        out: dict[str, DataFrame | None] = {}
        self._spec_names: dict[str, str] = {
            n: s.name for n, s in BRONZE_SPECS.items()
        }
        names = sorted(set(BRONZE_SPECS) | set(self.discover_tables(partition)))
        for name in names:
            raw = self.load_landing(name, partition)
            if raw is None or not raw.head(1):
                if name in BRONZE_SPECS:
                    out[name] = None
                continue
            spec = BRONZE_SPECS.get(name)
            if spec is None:
                spec = infer_bronze_spec(name, raw.columns)
                self._spec_names[name] = spec.name
            df = bronze_mod.preprocess_bronze(raw, spec)
            if name == "employee":
                # P5: dropna on the business key (reference etl.py:154)
                df = df.na.drop(subset=["user_id"])
            out[name] = df
        return out

    # -- orchestration -----------------------------------------------------

    def run(self, partition: str) -> None:
        """Full medallion pass; notifies the outcome either way
        (S11, reference dags/etl/run_etl.py:29-30)."""
        ctx = {"pipeline": "lark_etl", "partition": partition}
        try:
            self._run(partition)
        except Exception as e:
            self.notifier.on_failure({**ctx, "error": repr(e)})
            raise
        self.notifier.on_success(ctx)

    def _run(self, partition: str) -> None:
        bronze = self.build_bronze(partition)

        # publish bronze (S3 partition replace, reference etl.py:109) —
        # including dynamically discovered tables (S6)
        for name, df in bronze.items():
            if df is not None:
                self.wh.write_partition_replace(
                    df, "bronze", self._spec_names[name], partition
                )

        # silver dims: snapshot → delta → MERGE → read back (etl.py:525-614)
        dim_emp_cur = self._current("dim_employee", DIM_EMPLOYEE)
        if bronze["employee"] is not None:
            delta = silver_mod.build_dim_employee(bronze["employee"], dim_emp_cur)
            self.wh.merge_write(
                delta, "silver", "dim_employee", ["employee_sur_id"], partition,
                schema=DIM_EMPLOYEE,
            )
        dim_ven_cur = self._current("dim_vendor", DIM_VENDOR)
        if bronze["vendor"] is not None:
            delta = silver_mod.build_dim_vendor(bronze["vendor"], dim_ven_cur)
            self.wh.merge_write(
                delta, "silver", "dim_vendor", ["vendor_sur_id"], partition,
                schema=DIM_VENDOR,
            )
        # read-back: facts must see the post-merge snapshot (etl.py:566-578)
        dim_emp_cur = self._current("dim_employee", DIM_EMPLOYEE)
        dim_ven_cur = self._current("dim_vendor", DIM_VENDOR)

        # silver facts (partition replace)
        if bronze["attendance_record"] is not None:
            fact = silver_mod.build_fact_attendance_record(bronze["attendance_record"])
            self.wh.write_partition_replace(fact, "silver", "fact_attendance_record", partition)
        if bronze["attendance"] is not None:
            fact = silver_mod.build_fact_attendance(bronze["attendance"], dim_emp_cur)
            self.wh.write_partition_replace(fact, "silver", "fact_attendance", partition)
        if bronze["payment"] is not None:
            fact = silver_mod.build_fact_payment(bronze["payment"], dim_ven_cur, dim_emp_cur)
            self.wh.write_partition_replace(fact, "silver", "fact_payment", partition)

        # gold (etl.py:616-677) — over this partition's fact slice
        if bronze["attendance"] is not None and self.wh.exists("silver", "fact_attendance"):
            fact_att = self.wh.read("silver", "fact_attendance").where(
                F.col("partition_value") == F.lit(partition).cast("date")
            )
            report = gold_mod.build_cube_attendance_report(fact_att, dim_emp_cur)
            self.wh.write_partition_replace(report, "gold", "cube_attendance_report", partition)

    def _current(self, table: str, schema) -> DataFrame:
        """S2/P10: current-dim snapshot read with pushed-down flag filter
        (reference etl.py:535-536)."""
        return self.wh.read("silver", table, schema=schema).where(F.col("is_current"))


__all__ = ["LarkPipeline", "SILVER_SCHEMAS", "GOLD_SCHEMAS"]
