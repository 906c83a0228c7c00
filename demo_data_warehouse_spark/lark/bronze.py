"""Bronze preprocessing (SURVEY §2.2 P1-P4, §2.8 F6-F8).

Spark re-expression of preprocess_bronze_data
(reference dags/utils/common/data_helper.py:125-150):

  1. missing source column → all-null ("lark: no data no column", :127-129)
  2. 'ts' columns: epoch-milliseconds → TIMESTAMP; int(item/1000) seconds
     truncation preserved (:132-137)
  3. 'b' columns: null → False (:139-140)
  4. 'i' columns: messy-numeric coercion, null → 0 (:142-145)
  5. project to schema order + cast (:147)
  6. rename raw → snake_case (:148)

All column expressions are native (codegen-friendly); the only Python
touches rows via the pyrepr fallback UDF inside messy_numeric, guarded
per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.nested import messy_numeric
from .schemas import BronzeSpec


def millis_to_ts(col):
    """Epoch-millis (possibly float/string) → TIMESTAMP.

    Mirrors datetime.fromtimestamp(int(item/1000)): divide, truncate to
    whole seconds, treat as UTC (reference data_helper.py:132-137).
    """
    secs = (col.try_cast("double") / 1000).try_cast("bigint")
    return F.timestamp_seconds(secs)


def preprocess_bronze(df: DataFrame, spec: BronzeSpec) -> DataFrame:
    cols = []
    present = set(df.columns)
    for raw, kind in spec.cols:
        src = F.col(f"`{raw}`") if raw in present else F.lit(None)
        if kind == "ts":
            e = millis_to_ts(src)
        elif kind == "b":
            e = F.coalesce(src.try_cast("boolean"), F.lit(False))
        elif kind == "i":
            e = messy_numeric(src).try_cast("bigint")
        else:
            e = src.cast("string")
        cols.append(e.alias(spec.renames.get(raw, raw)))
    return df.select(*cols)
