"""Emulated MERGE upsert (SURVEY §2.1 S4).

The reference's non-replace publish path loads a temp table and runs a
BigQuery ``MERGE INTO target USING temp ON pk… WHEN MATCHED UPDATE …
WHEN NOT MATCHED INSERT`` (reference dags/utils/common/data_helper.py:76-106).
With no Delta Lake in the environment, the relational equivalent over
plain DataFrames/parquet is:

    merged = target ANTI-JOIN source ON pk  ∪  source

i.e. source rows win on PK collision (UPDATE), non-colliding target
rows survive, new source rows append (INSERT). Idempotent: merging the
same source twice yields the same table (ST3 replay safety).

Scale: the anti-join shuffles both sides on the PK — same cost class
as any MERGE; if the source is a small delta, Spark/AQE broadcasts it
and the target is never shuffled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Return target MERGE source on keys, source winning on collision."""
    keys = list(keys)
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys missing from inputs: {missing}")
    survivors = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return survivors.unionByName(source.select(*target.columns))
