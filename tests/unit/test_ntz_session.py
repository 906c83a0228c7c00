"""Driver-owned-session robustness: TIMESTAMP_NTZ-preferring configs.

The driver constructs its own SparkSession; with
spark.sql.timestampType=TIMESTAMP_NTZ the bare cast("timestamp") alias
resolves to NTZ, so catalog.table's normalization must target
"timestamp_ltz" explicitly and tune() must re-pin the LTZ default —
otherwise chrono builtins (unix_micros/unix_millis) fail analysis on the
events.ts column (observed as the only three CORRECTNESS_r02 failures).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import TimestampType

from demo_data_warehouse_spark.catalog import table
from demo_data_warehouse_spark.queries import QUERIES, load_all

load_all()

NTZ_SENSITIVE = ["fn_ts_millis", "window_lag_lead", "window_sessionize"]


@pytest.fixture
def ntz_preferring(spark):
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    yield spark
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")


def test_catalog_normalizes_ts_under_ntz_default(ntz_preferring, sf_dir):
    df = table(ntz_preferring, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)


@pytest.mark.parametrize("name", NTZ_SENSITIVE)
def test_chrono_queries_survive_ntz_default(spark, sf_dir, name):
    # re-pin NTZ before EACH query: the registry wrapper's tune() resets
    # the conf, and each query must succeed from the adversarial state
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        assert QUERIES[name](spark, sf_dir).count() > 0
    finally:
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")


def test_ts_millis_values_match_oracle_under_ntz_default(spark, sf_dir):
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        got = {
            r["event_id"]: r["ts_ms"]
            for r in QUERIES["fn_ts_millis"](spark, sf_dir).limit(50).collect()
        }
    finally:
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT event_id, epoch_ms(ts) FROM "
            f"'{sf_dir}/events.parquet' WHERE event_id IN "
            f"({','.join(str(k) for k in got)})"
        ).fetchall()
    )
    assert got == want
