"""Testdata table access.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet per table under an
sf dir. Reads go through spark.read.parquet so Catalyst gets column
pruning + predicate pushdown for free (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # parquet TIMESTAMP(NANOS) read as long via nanosAsLong (session.py);
        # truncate ns → µs exactly as DuckDB/pyarrow do on their ns→µs path
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # parquet timestamps with isAdjustedToUTC=false surface as TIMESTAMP_NTZ;
    # several chrono builtins (unix_micros/unix_millis, tz conversions) only
    # accept TIMESTAMP. Session tz is pinned UTC (session.py), so casting
    # NTZ → TIMESTAMP_LTZ reinterprets the wall-clock as UTC — value-identical
    # to how the same files read under inferTimestampNTZ=false. The cast target
    # must be spelled "timestamp_ltz": under spark.sql.timestampType=
    # TIMESTAMP_NTZ (a driver-owned session may set it) the bare "timestamp"
    # alias resolves to NTZ and the normalization silently no-ops.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp_ltz"))
    return df
