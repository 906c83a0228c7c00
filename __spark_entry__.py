"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over demo_data_warehouse_spark.queries — the registry holds
one entry per implemented operator from SURVEY.md §2 (plus the
training-data extensions), each with a DuckDB oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_data_warehouse_spark import queries as q  # noqa: E402
from demo_data_warehouse_spark.catalog import SMOKE_SF_DIR  # noqa: E402

q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Gold attendance-report shape (SURVEY §7.1 step 3): fact ⟕ dim →
    month bucket → grouped report, on orders ⟕ customer.
    """
    return q.QUERIES["flagship_report"](spark, SMOKE_SF_DIR)


def _driver_recorded() -> set[str]:
    """Names already green in some CORRECTNESS_r*.json driver snapshot.

    The driver records a fixed-size prefix of queries() per round, so we
    order never-recorded (or previously-failed) queries first: over
    successive rounds the recorded set converges to the full registry.
    """
    import glob
    import json

    root = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, bool] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            # latest round's record wins: a query green in r1 but failed in
            # r2 needs re-recording, so it must sort back into the window
            latest[name] = row.get("rows_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
    return {n for n, ok in latest.items() if ok}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    allq = dict(q.QUERIES)
    green = _driver_recorded()
    ordered = [n for n in allq if n not in green] + [n for n in allq if n in green]
    return {n: allq[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLES)
