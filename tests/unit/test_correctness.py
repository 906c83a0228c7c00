"""Every oracle-backed driver query must match DuckDB at sf0.001.

Mirrors the driver's t2 gate (row-count + columns + order-insensitive
values); the full-size run happens in scripts/check_correctness.py.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from demo_data_warehouse_spark.catalog import TABLES
from scripts.check_correctness import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_approx_distinct_within_tolerance(spark, sf_dir, duck):
    got = (
        QUERIES["agg_approx_distinct"](spark, sf_dir)
        .toPandas()
        .set_index("o_orderstatus")
        .n_cust_approx
    )
    exact = (
        duck.execute(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n FROM orders"
            " GROUP BY o_orderstatus"
        )
        .fetchdf()
        .set_index("o_orderstatus")
        .n
    )
    for status, n in exact.items():
        assert abs(got[status] - n) <= max(0.05 * n, 2), (status, got[status], n)


def test_approx_median_within_tolerance(spark, sf_dir, duck):
    got = (
        QUERIES["agg_approx_median"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    exact = (
        duck.execute(
            "SELECT event_type, quantile_cont(value, 0.5) AS p50,"
            " quantile_cont(value, 0.9) AS p90 FROM events GROUP BY event_type"
        )
        .fetchdf()
        .set_index("event_type")
    )
    for et in exact.index:
        for approx_col, exact_col in (("median_approx", "p50"), ("p90_approx", "p90")):
            a, e = got.loc[et, approx_col], exact.loc[et, exact_col]
            assert abs(a - e) <= max(0.02 * abs(e), 0.5), (et, approx_col, a, e)
