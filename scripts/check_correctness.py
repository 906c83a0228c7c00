"""Local mimic of the driver's t2 correctness gate.

Runs every queries()[name] on Spark and, where an oracle exists, the
oracle SQL on DuckDB over the same parquet tables; compares row count,
column names, and order-insensitive values. Rows-only queries are
checked for successful execution and row count >= 0.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from demo_data_warehouse_spark.catalog import TABLES  # noqa: E402
from demo_data_warehouse_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Pin the oracle session to UTC so a TIMESTAMPTZ-producing oracle (or
    # tz-typed parquet) reads instants identically on any host: digest
    # mode's epoch_us(CAST(c AS TIMESTAMP)) localizes TIMESTAMPTZ through
    # the session zone (probed: 7h shift under Asia/Ho_Chi_Minh without
    # the pin), and fetchdf() tz-aware frames canonicalize through the
    # same zone. Spark-side reads are already UTC-pinned by tune().
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            import datetime as _dt

            first = next((v for v in s if v is not None and not (isinstance(v, float) and math.isnan(v))), None)
            if isinstance(first, _dt.date) and not isinstance(first, _dt.datetime):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                import numpy as _np

                df[c] = s.map(
                    lambda v: tuple(v) if isinstance(v, (list, tuple, _np.ndarray)) else v
                )
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        return bool(a == b)
    except Exception:
        return False


def dtype_problems(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Driver-parity strictness (VERDICT r4 wrong #1/#2): the driver's
    value hash distinguishes 5 from 5.0 (DuckDB HUGEINT sums render as
    float64), and its canonicalizer crashes on list/ndarray cells. Both
    are invisible to a pure value-equality compare, so they are hard
    FAILs here.
    """
    import numpy as np

    problems = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        for side, s in (("spark", sdf[c]), ("oracle", odf[c])):
            if s.dtype == object and any(
                isinstance(v, (list, tuple, dict, np.ndarray)) for v in s
            ):
                problems.append(
                    f"col {c!r}: {side} side has list/map-typed cells — the "
                    "driver canonicalizer crashes on these; string-join the "
                    "array (concat_ws / array_to_string) on BOTH engines"
                )
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if (sk in "iu") != (ok in "iu") and {sk, ok} <= set("iuf"):
            problems.append(
                f"col {c!r}: dtype mismatch spark={sdf[c].dtype} "
                f"oracle={odf[c].dtype} — driver hash distinguishes 5 from "
                "5.0; CAST the oracle aggregate to BIGINT (or Spark to DOUBLE)"
            )
        if (sk == "b") != (ok == "b"):
            problems.append(
                f"col {c!r}: bool/non-bool dtype mismatch spark={sdf[c].dtype} "
                f"oracle={odf[c].dtype}"
            )
    return problems


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    problems.extend(dtype_problems(sdf, odf))
    if problems:
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {c!r}: {len(bad)}/{len(av)} mismatches; first @{i}: spark={x!r} oracle={y!r}"
            )
    return problems


def digest_compare(sdf_lazy, con, oracle: str) -> list[str]:
    """Order-insensitive ENGINE-SIDE digest compare for outputs too big
    to collect (e.g. dedup_simhash's 75M pairs at the 30× twin): each
    engine canonicalizes its own rows (columns in sorted-name order,
    NULL sentinel, \\x1f separator), hashes each row with the portable
    md5-60 (the repo's cross-engine hash pattern), and SUMS the hashes
    in exact decimal — commutative, so no ordering is materialized and
    nothing leaves the engine but (count, digest). This is also how a
    100 TB pipeline actually verifies parity: in-engine checksums,
    never a driver collect. Restricted to int/string/bool/date/timestamp
    columns — float formatting is not portable across engines, but
    timestamps ARE portable once canonicalized to epoch microseconds
    (Spark `unix_micros` and DuckDB `epoch_us` both read the stored
    UTC instant as an exact BIGINT, independent of session timezone
    and text formatting). TIMESTAMP_NTZ stays refused: its wall-clock
    reinterpretation under a shifted session TZ is exactly the
    ambiguity the full collect-compare path exists to canonicalize."""
    from pyspark.sql import functions as F

    cols = sorted(sdf_lazy.columns)
    kinds = dict(sdf_lazy.dtypes)
    ok_types = (
        "int", "bigint", "smallint", "tinyint", "string", "boolean", "date",
        "timestamp",
    )
    bad = [c for c in cols if kinds[c] not in ok_types]
    if bad:
        return [
            f"digest mode needs {'/'.join(ok_types)} columns; "
            f"not portable: {bad}"
        ]

    def s_col(c):
        base = (
            F.unix_micros(F.col(c)) if kinds[c] == "timestamp" else F.col(c)
        )
        return F.coalesce(base.cast("string"), F.lit("NULL"))

    s_parts = [s_col(c) for c in cols]
    srow = F.concat_ws("\x1f", *s_parts)
    h = F.conv(F.substring(F.md5(srow.cast("binary")), 1, 15), 16, 10).cast("long")
    sres = sdf_lazy.select(
        F.count("*").alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("digest"),
    ).collect()[0]

    def o_col(c):
        expr = (
            f"epoch_us(CAST({c} AS TIMESTAMP))"
            if kinds[c] == "timestamp"
            else c
        )
        return f"COALESCE(CAST({expr} AS VARCHAR), 'NULL')"

    o_parts = ", ".join(o_col(c) for c in cols)
    ores = con.execute(
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(concat('0x', substr(md5(concat_ws(chr(31), {o_parts})), 1, 15)) "
        f"AS BIGINT)) AS DECIMAL(38,0)) AS digest "
        f"FROM ({oracle})"
    ).fetchone()
    problems = []
    if int(sres["n"]) != int(ores[0]):
        problems.append(f"row count differs: spark={sres['n']} oracle={ores[0]}")
    elif str(sres["digest"]) != str(ores[1]):
        problems.append(
            f"digest differs: spark={sres['digest']} oracle={ores[1]}"
        )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--digest"]
    digest_mode = "--digest" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("ddw-check")
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if digest_mode and name in oracles:
            try:
                problems = digest_compare(fn(spark, sf_dir), con, oracles[name])
            except Exception as e:
                problems = [f"digest error: {type(e).__name__}: {str(e)[:300]}"]
            if problems:
                failures += 1
                print(f"FAIL  {name}: ({time.time()-t0:.1f}s)")
                for p in problems:
                    print(f"      - {p}")
            else:
                print(f"ok    {name}: engine-side digest match  ({time.time()-t0:.1f}s)")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only, {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"ok    {name}: {len(sdf)} rows match  ({time.time()-t0:.1f}s)")
    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL GREEN'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
