"""Warehouse sinks: partition-replace writer + emulated MERGE
(SURVEY §2.1 S3/S4, §2.9 ST4/ST5).

A Warehouse is a local parquet directory tree `root/{bronze,silver,gold}/
<table>/`. Two publish paths, mirroring the reference's
save_table_to_gbq (reference dags/utils/common/data_helper.py:48-106):

  partition replace   idempotent per-partition overwrite — Spark dynamic
                      partition overwrite replaces only the partitions
                      present in the frame (BigQuery `table$YYYYMMDD` +
                      WRITE_TRUNCATE analog)
  merge               anti-join ∪ delta, written to a staging dir then
                      swapped in — BigQuery `MERGE INTO` analog. On a
                      real deployment this staging+swap is a Delta/
                      Iceberg transactional commit; plain parquet has no
                      atomic commit so the swap is the local stand-in.

Both stamp etl_inserted + partition_value at publish
(reference dags/utils/etl.py:63-82).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .operators.merge import merge_upsert

DATABASES = ("bronze", "silver", "gold")


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        for db in DATABASES:
            os.makedirs(os.path.join(root, db), exist_ok=True)

    def path(self, db: str, table: str) -> str:
        return os.path.join(self.root, db, table)

    def exists(self, db: str, table: str) -> bool:
        p = self.path(db, table)
        return os.path.isdir(p) and any(
            not n.startswith((".", "_tmp")) for n in os.listdir(p)
        )

    def read(self, db: str, table: str, schema: StructType | None = None) -> DataFrame:
        """Read a table; missing table + declared schema → empty frame
        (lets the first pipeline run bootstrap dims from nothing)."""
        if self.exists(db, table):
            return self.spark.read.parquet(self.path(db, table))
        if schema is None:
            raise FileNotFoundError(f"{db}.{table} does not exist and no schema given")
        full = _with_publish_fields(schema)
        return self.spark.createDataFrame([], full)

    def _stamp(self, df: DataFrame, partition: str) -> DataFrame:
        out = df
        if "etl_inserted" not in df.columns:
            out = out.withColumn("etl_inserted", F.current_timestamp())
        if "partition_value" not in df.columns:
            out = out.withColumn("partition_value", F.lit(partition).cast("date"))
        return out

    def write_partition_replace(
        self, df: DataFrame, db: str, table: str, partition: str
    ) -> None:
        """S3/ST4: idempotent per-partition overwrite on partition_value."""
        if df is None:
            return
        self._stamp(df, partition).write.mode("overwrite").partitionBy(
            "partition_value"
        ).parquet(self.path(db, table))

    def write_bucketed(
        self,
        df: DataFrame,
        db: str,
        table: str,
        keys: list[str],
        buckets: int = 16,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Bucketed (hash-clustered) table — the co-located-join path.

        Two tables bucketed on the same key with the same bucket count
        join WITHOUT an Exchange on either side: the scan itself reports
        hashpartitioning(key, buckets). At 100 TB this is the difference
        between re-shuffling the fact table on every join and shuffling
        it once at write time. Bucket metadata lives in the session
        catalog (saveAsTable); data files land under the warehouse root.
        """
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", self.path(db, table))
            .bucketBy(buckets, *keys)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(f"{db}.{table}")

    def read_catalog_table(self, db: str, table: str) -> DataFrame:
        """Catalog read — required for bucketed tables (a raw parquet
        path read loses the bucket-spec and re-introduces the shuffle)."""
        return self.spark.table(f"{db}.{table}")

    def merge_write(
        self,
        delta: DataFrame,
        db: str,
        table: str,
        keys: list[str],
        partition: str,
        schema: StructType | None = None,
    ) -> None:
        """S4/ST5: MERGE delta into the table on `keys` (delta wins),
        via staging dir + swap. Idempotent under replay."""
        if delta is None:
            return
        delta = self._stamp(delta, partition)
        # missing target bootstraps from the delta's shape (MERGE auto-create)
        target = self.read(db, table, schema=schema or delta.schema)
        merged = merge_upsert(
            target.select(*delta.columns), delta.select(*delta.columns), keys
        )
        final = self.path(db, table)
        staging = os.path.join(self.root, db, f"_tmp-{table}-{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").partitionBy("partition_value").parquet(staging)
        old = final + ".old"
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(staging, final)
        shutil.rmtree(old, ignore_errors=True)


    def compact(
        self,
        db: str,
        table: str,
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> dict[str, int]:
        """Small-file compaction — warehouse maintenance for merge/
        streaming sinks, which fragment tables (every micro-batch MERGE
        rewrites with shuffle-partition-many files; at 100 TB a reader
        then pays per-file open cost and loses row-group locality).

        Rewrites each partition_value directory to
        ceil(bytes / target_file_bytes) files via the same staging+swap
        as merge_write (atomic-commit stand-in; Delta/Iceberg OPTIMIZE
        is the production analog). Data is byte-identical — only file
        layout changes. Returns {'files_before': n, 'files_after': m}.
        """
        final = self.path(db, table)
        files_before = sum(
            1
            for _dir, _sub, names in os.walk(final)
            for n in names
            if n.endswith(".parquet")
        )
        total_bytes = sum(
            os.path.getsize(os.path.join(d, n))
            for d, _sub, names in os.walk(final)
            for n in names
            if n.endswith(".parquet")
        )
        df = self.spark.read.parquet(final)
        partitioned = "partition_value" in df.columns
        n_files = max(1, -(-total_bytes // target_file_bytes))
        if partitioned:
            # spread within each partition dir; repartition by the
            # partition column so each output dir gets coalesced files
            out = df.repartition(int(n_files), "partition_value")
        else:
            out = df.repartition(int(n_files))
        staging = os.path.join(self.root, db, f"_tmp-{table}-{uuid.uuid4().hex[:8]}")
        w = out.write.mode("overwrite")
        if partitioned:
            w = w.partitionBy("partition_value")
        w.parquet(staging)
        old = final + ".old"
        os.rename(final, old)
        os.rename(staging, final)
        shutil.rmtree(old, ignore_errors=True)
        files_after = sum(
            1
            for _dir, _sub, names in os.walk(final)
            for n in names
            if n.endswith(".parquet")
        )
        return {"files_before": files_before, "files_after": files_after}


def _with_publish_fields(schema: StructType) -> StructType:
    from pyspark.sql.types import DateType, StructField, TimestampType

    names = {f.name for f in schema.fields}
    fields = list(schema.fields)
    if "etl_inserted" not in names:
        fields.append(StructField("etl_inserted", TimestampType()))
    if "partition_value" not in names:
        fields.append(StructField("partition_value", DateType()))
    return StructType(fields)
