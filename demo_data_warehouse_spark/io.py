"""Warehouse sinks: partition-replace writer + emulated MERGE
(SURVEY §2.1 S3/S4, §2.9 ST4/ST5).

A Warehouse is a local parquet directory tree `root/{bronze,silver,gold}/
<table>/`. Two publish paths, mirroring the reference's
save_table_to_gbq (reference dags/utils/common/data_helper.py:48-106):

  partition replace   idempotent per-partition overwrite — Spark dynamic
                      partition overwrite replaces only the partitions
                      present in the frame (BigQuery `table$YYYYMMDD` +
                      WRITE_TRUNCATE analog)
  merge               partition-scoped MERGE — BigQuery `MERGE INTO`
                      analog (reference merges the delta into the table;
                      it never rewrites the table). Only partitions the
                      delta touches (its own partition_values plus any
                      partition holding a matched key) are rewritten,
                      via dynamic partition overwrite; rows in untouched
                      partitions never move. On a real deployment this
                      is a Delta/Iceberg MERGE commit; dynamic partition
                      overwrite is the plain-parquet stand-in.

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


def zorder_key(dims: list[tuple], bits: int = 12):
    """Morton (Z-curve) key column: each (col, lo, hi) dimension is
    affine-ranked into [0, 2^bits) with clamping, then the ranks' bits
    are interleaved (dim d contributes bit i to position i·ndims + d).
    Pure per-row arithmetic — deterministic, engine-portable, and a
    single codegen chain of bits·ndims OR-free adds (terms are disjoint
    bits, so + ≡ |)."""
    ranks = []
    for col, lo, hi in dims:
        scaled = F.floor(
            (col.cast("double") - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(float(1 << bits))
        ).cast("bigint")
        ranks.append(F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1)))
    z = F.lit(0).cast("bigint")
    nd = len(ranks)
    for i in range(bits):
        for d, r in enumerate(ranks):
            z = z + F.shiftleft(
                F.shiftright(r, i).bitwiseAND(F.lit(1)).cast("bigint"), i * nd + d
            )
    return z


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        for db in DATABASES:
            os.makedirs(os.path.join(root, db), exist_ok=True)

    def path(self, db: str, table: str) -> str:
        return os.path.join(self.root, db, table)

    def exists(self, db: str, table: str) -> bool:
        self._recover(db, table)
        p = self.path(db, table)
        return os.path.isdir(p) and any(
            not n.startswith((".", "_tmp")) for n in os.listdir(p)
        )

    def _recover(self, db: str, table: str) -> None:
        """Heal a half-finished staging+swap (compact crash window).

        The swap is two renames: final → final.old, then staging →
        final. A crash between them leaves only `<table>.old`; without
        recovery the next read() would silently bootstrap an empty
        table from the delta's schema and prior history would be lost.
        Rules: .old alone → restore it; .old alongside final → the swap
        completed, .old is post-swap debris → drop it.
        """
        final = self.path(db, table)
        old = final + ".old"
        if not os.path.isdir(old):
            return
        if os.path.isdir(final):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, final)

    def read(
        self,
        db: str,
        table: str,
        schema: StructType | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Read a table; missing table + declared schema → empty frame
        (lets the first pipeline run bootstrap dims from nothing).

        merge_schema=True unions the footer schemas of all files — the
        required read mode after an evolving MERGE, where untouched
        partitions still carry the pre-evolution schema on disk (a
        sampled-file schema would randomly lose the new columns)."""
        if self.exists(db, table):
            reader = self.spark.read
            if merge_schema:
                reader = reader.option("mergeSchema", True)
            return reader.parquet(self.path(db, table))
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

    def write_clustered(
        self,
        df: DataFrame,
        db: str,
        table: str,
        cluster_cols: list[str],
        n_files: int = 8,
    ) -> None:
        """Range-clustered write — the file-skipping path for columns
        too fine-grained to partition by (timestamps, ids).

        repartitionByRange splits rows into n_files contiguous key
        ranges; sortWithinPartitions orders rows inside each file, so
        every parquet file AND row group carries tight, pairwise-
        disjoint min/max stats on the cluster columns. A range or
        point predicate then skips whole files via footer stats
        (ParquetFileFormat row-group filtering) instead of scanning —
        directory partitioning prunes coarse keys (dates), clustering
        prunes inside them. At 100 TB: partition by day, cluster by
        (ts, key) within each day; a narrow time-range query reads a
        handful of files total. Disjointness is pinned by
        tests/unit/test_clustered.py reading the footers back.

        Range boundaries come from Spark's reservoir sample of the
        cluster columns (spark.sql.execution.rangeExchange.sampleSizePerPartition)
        — no driver-side data collection.
        """
        out = df.repartitionByRange(n_files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
        out.write.mode("overwrite").parquet(self.path(db, table))

    def write_zordered(
        self,
        df: DataFrame,
        db: str,
        table: str,
        cluster_cols: list[tuple[str, float, float]],
        bits: int = 12,
        n_files: int = 8,
    ) -> None:
        """Z-order (Morton-interleaved) clustered write — multi-dimension
        file skipping where range clustering only serves one dimension.

        write_clustered sorts lexicographically, so files carry tight
        min/max stats on the FIRST cluster column only; a predicate on
        the second column alone (or a 2-D box) scans everything. The
        Z-curve interleaves the bit-ranks of all dimensions, so file
        boundaries cut space into hyper-rectangles that are tight in
        EVERY dimension at once — each parquet footer then carries a
        small min/max rectangle per column, and an N-dim box predicate
        skips any file whose rectangle misses the box. No zkey predicate
        is needed at read time: skipping rides the ordinary per-column
        footer stats, exactly like Delta/Iceberg OPTIMIZE ZORDER BY.

        cluster_cols is (name, lo, hi) per dimension — the fixed affine
        rank mapping (clamped floor((x-lo)/(hi-lo)·2^bits)) keeps the
        key a pure per-row expression: no sampling pass, deterministic
        across engines, and out-of-range values saturate into edge
        cells rather than erroring. The interleave is a once-per-row
        write-time expression, so its size only matters for codegen
        hygiene — keep bits·dims modest (24 here); skipping precision
        beyond the file count is wasted anyway.

        At 100 TB: partition by day, Z-order by (user, metric) inside
        each partition; selective multi-dim dashboards read a handful
        of files per day instead of the full day.
        """
        z = zorder_key([(F.col(c), lo, hi) for c, lo, hi in cluster_cols], bits)
        out = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        out.write.mode("overwrite").parquet(self.path(db, table))

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
        evolve_schema: bool = False,
    ) -> None:
        """S4/ST5: MERGE delta into the table on `keys` (delta wins).
        Partition-scoped and idempotent under replay.

        evolve_schema=True accepts a delta whose columns are a superset
        or subset of the table's (new columns only ever ADD — see
        operators/merge.py::align_schemas); the target is then read with
        footer-merged schemas because untouched partitions keep the old
        schema on disk. Default False: a delta whose schema drifted from
        the table fails loudly instead of silently nulling columns.

        Matches reference semantics (dags/utils/common/data_helper.py:76-106
        — BigQuery merges the delta into the table; it never rewrites the
        table): only *touched* partitions are rewritten. Touched =
        partitions the delta writes into ∪ partitions holding a row whose
        key the delta matches (a key can move partitions). The rewrite is
        a dynamic partition overwrite, so at 100 TB a 1-partition delta
        costs one partition's IO, not the table's; untouched partitions'
        files are never opened or moved.

        The touched-partition list is collected at the driver — it is a
        set of partition VALUES (dates), bounded by the table's partition
        count, never row data.
        """
        if delta is None:
            return
        delta = self._stamp(delta, partition)
        final = self.path(db, table)
        if not self.exists(db, table):
            # MERGE auto-create: first publish is a plain partitioned write
            delta.write.mode("overwrite").partitionBy("partition_value").parquet(final)
            return
        if evolve_schema:
            target = self.read(db, table, merge_schema=True)
        else:
            target = self.read(db, table, schema=schema or delta.schema)
        keys = list(keys)
        # delta keys are small relative to the target (a micro-batch /
        # daily increment) — broadcast so the target is never shuffled
        delta_keys = F.broadcast(delta.select(*keys).distinct())
        matched_parts = {
            r[0]
            for r in target.join(delta_keys, on=keys, how="left_semi")
            .select("partition_value")
            .distinct()
            .collect()
        }
        delta_parts = {
            r[0] for r in delta.select("partition_value").distinct().collect()
        }
        touched = matched_parts | delta_parts
        scoped = target.where(_partition_in(touched))
        if evolve_schema:
            merged = merge_upsert(scoped, delta, keys, evolve_schema=True)
        else:
            merged = merge_upsert(
                scoped.select(*delta.columns), delta.select(*delta.columns), keys
            )
        # dynamic partition overwrite replaces exactly the partitions
        # present in `merged` — but a touched partition can end up EMPTY
        # (all its rows matched keys that moved elsewhere); those are not
        # in the output, so their stale dirs are removed explicitly
        survivor_parts = {
            r[0]
            for r in scoped.join(delta_keys, on=keys, how="left_anti")
            .select("partition_value")
            .distinct()
            .collect()
        }
        merged.write.mode("overwrite").partitionBy("partition_value").parquet(final)
        for part in touched - (survivor_parts | delta_parts):
            shutil.rmtree(
                os.path.join(final, f"partition_value={_hive_part(part)}"),
                ignore_errors=True,
            )


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
        ceil(partition_bytes / target_file_bytes) files via a
        staging+swap (atomic-commit stand-in; Delta/Iceberg OPTIMIZE
        is the production analog). Data is byte-identical — only file
        layout changes. Returns {'files_before': n, 'files_after': m}.

        Per-partition file counts come from the on-disk partition dir
        sizes; rows are spread across that many reducers with a
        deterministic hash salt (pmod(xxhash64(all cols), n_i)), so a
        partition larger than target_file_bytes splits into multiple
        target-size files instead of collapsing to one.
        """
        self._recover(db, table)
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
            # per-partition target file count from the dir's actual bytes
            part_bytes: dict[str, int] = {}
            for name in os.listdir(final):
                d = os.path.join(final, name)
                if not (name.startswith("partition_value=") and os.path.isdir(d)):
                    continue
                b = sum(
                    os.path.getsize(os.path.join(dd, n))
                    for dd, _s, names in os.walk(d)
                    for n in names
                    if n.endswith(".parquet")
                )
                part_bytes[name.split("=", 1)[1]] = b
            nf_rows = [
                (v, max(1, -(-b // target_file_bytes))) for v, b in part_bytes.items()
            ]
            nf = self.spark.createDataFrame(nf_rows, ["_part_str", "_nf"])
            data_cols = [c for c in df.columns if c != "partition_value"]
            salted = (
                df.join(
                    F.broadcast(nf),
                    F.col("partition_value").cast("string") == F.col("_part_str"),
                    "left",
                )
                .withColumn(
                    "_salt",
                    F.pmod(F.xxhash64(*data_cols), F.coalesce("_nf", F.lit(1))),
                )
                .drop("_part_str", "_nf")
            )
            total_out = max(1, sum(n for _v, n in nf_rows))
            out = salted.repartition(
                int(total_out), F.col("partition_value"), F.col("_salt")
            ).drop("_salt")
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


    def repartition_layout(
        self,
        db: str,
        table: str,
        new_partition_expr,
        drop_old: bool = True,
    ) -> dict[str, int]:
        """Partition-scheme migration — rewrite the table under a NEW
        partition_value derived from the old one (day → month is the
        classic: a day-partitioned table that outgrew its partition
        count pays listing/small-file overhead on every scan; month
        partitions restore pruning granularity matched to the query
        patterns). Content is row-identical; only the directory layout
        (and thus which predicates prune) changes.

        Same staging + atomic-swap crash contract as compact(): the
        table is never observable half-migrated, and a crash before the
        swap leaves the original untouched (_recover reclaims the
        staging dir). At 100 TB this is the one legitimate full-table
        rewrite — a one-off layout migration, not a recurring sink.

        `new_partition_expr` is a Column over the old columns producing
        the new partition_value. Returns partition counts before/after.
        """
        self._recover(db, table)
        final = self.path(db, table)
        df = self.spark.read.parquet(final)
        parts_before = sum(
            1 for n in os.listdir(final)
            if n.startswith("partition_value=") and os.path.isdir(os.path.join(final, n))
        )
        data_cols = [c for c in df.columns if c != "partition_value"]
        out = df.select(*data_cols, new_partition_expr.alias("partition_value"))
        staging = os.path.join(self.root, db, f"_tmp-{table}-{uuid.uuid4().hex[:8]}")
        out.write.mode("overwrite").partitionBy("partition_value").parquet(staging)
        old = final + ".old"
        os.rename(final, old)
        os.rename(staging, final)
        if drop_old:
            shutil.rmtree(old, ignore_errors=True)
        parts_after = sum(
            1 for n in os.listdir(final)
            if n.startswith("partition_value=") and os.path.isdir(os.path.join(final, n))
        )
        return {"parts_before": parts_before, "parts_after": parts_after}

    def vacuum_partitions(self, db: str, table: str, keep_from: str) -> dict[str, int]:
        """Retention VACUUM — the deletion half of warehouse maintenance
        (compact() is the layout half): drop every partition_value
        directory strictly older than `keep_from` (a 'YYYY-MM-DD'
        cutoff). Partition-dir removal is metadata-scale work — no
        surviving row is read or rewritten, the same reason MERGE is
        partition-scoped — and crash-safety is per-directory: a partial
        vacuum leaves whole partitions either present or absent, never
        torn files (Delta/Iceberg VACUUM + retention policy is the
        production analog). Returns partition counts for audit logging,
        the number every retention job is asked to report.
        """
        import datetime
        import shutil

        cutoff = datetime.date.fromisoformat(keep_from)
        root = self.path(db, table)
        dropped = kept = 0
        for entry in sorted(os.listdir(root)):
            if not entry.startswith("partition_value="):
                continue
            part_date = datetime.date.fromisoformat(entry.split("=", 1)[1])
            if part_date < cutoff:
                shutil.rmtree(os.path.join(root, entry))
                dropped += 1
            else:
                kept += 1
        return {"partitions_dropped": dropped, "partitions_kept": kept}



class SnapshotLog:
    """Commit-log table format: snapshot isolation + time travel over
    plain parquet — the Delta/Iceberg transaction-log pattern reduced to
    its load-bearing core, completing the maintenance family (compact =
    layout, vacuum_partitions = retention, SnapshotLog = versioning).

    Layout:   root/v00000007/…parquet   immutable per-commit data dirs
              root/_log/00000007.json   one manifest per commit

    Each manifest records the commit's FULL file list (its own new files
    plus, for append commits, every file carried over from the parent
    version). Readers resolve version → files through the manifest only.

    Commit protocol: write the data dir FIRST, then publish with an
    atomic same-directory rename of the manifest temp file. A crash
    between the two leaves an orphan data dir no manifest references —
    invisible to every reader, reclaimed by vacuum(). Single-writer by
    design (the reference's publish path is a single Airflow task,
    dags/utils/common/data_helper.py:48-106); multi-writer needs the
    conditional-put primitive object stores expose, same as Delta.

    100 TB posture: a commit is one O(#files) manifest — never a table
    rewrite; append commits write only the delta's files (unchanged data
    is carried by reference); any historical version stays readable
    until vacuumed, which is what makes a training run reproducible —
    pin the snapshot id, not "whatever the table held that day".
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        os.makedirs(self.log_dir, exist_ok=True)

    # -- manifest plumbing ------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(n[:-5])
            for n in os.listdir(self.log_dir)
            if n.endswith(".json") and not n.startswith(".")
        )

    def _manifest(self, version: int) -> dict:
        import json

        with open(os.path.join(self.log_dir, f"{version:08d}.json")) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> int:
        import json

        version = manifest["version"]
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(self.log_dir, f"{version:08d}.json"))
        return version

    @staticmethod
    def _data_files(d: str) -> list[str]:
        return sorted(
            os.path.join(dd, n)
            for dd, _s, names in os.walk(d)
            for n in names
            if n.endswith(".parquet")
        )

    def _ref_path(self, abs_file: str) -> str:
        """Manifest entry for an absolute file path: files under this
        log's own root are stored RELATIVE (so vacuum() recognizes
        their v-dirs as referenced); foreign files (clone /
        fast-forward sources outside this root) stay absolute.

        Publishing a same-root file absolutely is the vacuum-corruption
        hazard: `fast_forward(branch)` where the branch was cloned FROM
        this log would otherwise re-reference this log's own v-dirs by
        absolute path, vacuum's first-component resolution would see
        '' instead of 'v0000000N', and a subsequent self-vacuum would
        delete data the live manifest still references."""
        rel = os.path.relpath(abs_file, self.root)
        return abs_file if rel.startswith(os.pardir) else rel

    # -- write path -------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "replace") -> int:
        """Write `df` as the next version. mode='replace' makes it the
        whole table; mode='append' adds its files to the parent
        version's file list (the delta-only write path — parent data is
        carried by reference, never rewritten)."""
        if mode not in ("replace", "append"):
            raise ValueError(f"unknown commit mode {mode!r}")
        existing = self.versions()
        version = (existing[-1] + 1) if existing else 0
        data_dir = os.path.join(self.root, f"v{version:08d}")
        df.write.mode("overwrite").parquet(data_dir)
        files = [os.path.relpath(p, self.root) for p in self._data_files(data_dir)]
        if mode == "append" and existing:
            files = self._manifest(existing[-1])["files"] + files
        return self._publish({"version": version, "mode": mode, "files": files})

    # -- read path --------------------------------------------------------

    def read(self, version: int | None = None, merge_schema: bool = False) -> DataFrame:
        """Snapshot read: latest committed version, or AS OF `version`.

        merge_schema=True unions the footer schemas across the
        version's files — required after an append commit whose delta
        ADDED columns (carried parent files keep the old schema on
        disk; a sampled-file schema would randomly lose the new
        columns — same contract as Warehouse.read)."""
        existing = self.versions()
        if not existing:
            raise FileNotFoundError(f"no commits under {self.root}")
        if version is None:
            version = existing[-1]
        if version not in existing:
            raise FileNotFoundError(f"version {version} not in {existing}")
        files = self._manifest(version)["files"]
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", True)
        return reader.parquet(*[os.path.join(self.root, f) for f in files])

    def clone(self, dest_root: str, version: int | None = None) -> "SnapshotLog":
        """Zero-copy SHALLOW CLONE (the Delta/Iceberg analog): the
        clone's v0 manifest references the source version's data files
        by absolute path — one O(#files) metadata write, no data read
        or copied, so cloning a 100 TB table costs the same as a 100 MB
        one. The clone then evolves independently: its own commits land
        under its own root; the source never sees them (and vice
        versa). This is what makes dev/test sandboxes and experiment
        branches free on a lakehouse.

        Hazard (same as Delta): vacuum() on the SOURCE does not know
        about clone references and can orphan the clone's files —
        sever with a deep copy (dest.commit(dest.read())) first.
        """
        existing = self.versions()
        if not existing:
            raise FileNotFoundError(f"no commits under {self.root}")
        if version is None:
            version = existing[-1]
        if version not in existing:
            raise FileNotFoundError(f"version {version} not in {existing}")
        dest = SnapshotLog(self.spark, dest_root)
        if dest.versions():
            raise FileExistsError(f"clone target {dest_root} already has commits")
        abs_files = [
            dest._ref_path(f if os.path.isabs(f) else os.path.join(self.root, f))
            for f in self._manifest(version)["files"]
        ]
        dest._publish(
            {
                "version": 0,
                "mode": "clone",
                "files": abs_files,
                "source": self.root,
                "source_version": version,
            }
        )
        return dest

    def fast_forward(self, branch: "SnapshotLog", version: int | None = None) -> int:
        """Adopt a branch's version as this log's next version by
        manifest reference — the PUBLISH step of write-audit-publish:
        data files written (and audited) under the branch become
        visible here in one O(#files) metadata commit; nothing is
        copied or rewritten, and until this commit lands no reader of
        this log can see the branch's writes. The inverse hazard of
        clone() applies: vacuum() on the branch can orphan files this
        log now references — deep-copy (commit(read())) to sever."""
        existing = branch.versions()
        if not existing:
            raise FileNotFoundError(f"no commits under {branch.root}")
        if version is None:
            version = existing[-1]
        abs_files = [
            self._ref_path(f if os.path.isabs(f) else os.path.join(branch.root, f))
            for f in branch._manifest(version)["files"]
        ]
        mine = self.versions()
        next_v = (mine[-1] + 1) if mine else 0
        return self._publish(
            {
                "version": next_v,
                "mode": "fast_forward",
                "files": abs_files,
                "source": branch.root,
                "source_version": version,
            }
        )

    # -- maintenance ------------------------------------------------------

    def vacuum(self, keep_last: int = 2) -> dict[str, int]:
        """Drop manifests older than the newest `keep_last`, then delete
        every data dir no surviving manifest references (this is also
        what reclaims crash-orphaned dirs). Directory-level work only —
        no surviving row is read or rewritten."""
        existing = self.versions()
        keep = set(existing[-keep_last:]) if keep_last > 0 else set()
        dropped_manifests = 0
        for v in existing:
            if v not in keep:
                os.remove(os.path.join(self.log_dir, f"{v:08d}.json"))
                dropped_manifests += 1
        # resolve absolute entries (older manifests predating _ref_path, or
        # hand-edited ones) back under root before taking the v-dir name;
        # files outside root can never name one of our v-dirs — skip them.
        referenced_dirs = set()
        for v in keep:
            for f in self._manifest(v)["files"]:
                if os.path.isabs(f):
                    f = os.path.relpath(f, self.root)
                    if f.startswith(os.pardir):
                        continue
                referenced_dirs.add(f.split(os.sep, 1)[0])
        dropped_dirs = 0
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("v") or name == "_log":
                continue
            if os.path.isdir(os.path.join(self.root, name)) and name not in referenced_dirs:
                shutil.rmtree(os.path.join(self.root, name))
                dropped_dirs += 1
        return {"manifests_dropped": dropped_manifests, "data_dirs_dropped": dropped_dirs}


def _hive_part(value) -> str:
    """Render a partition value the way Spark names its directory."""
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    return str(value)


def _partition_in(values: set):
    """Partition-pruning predicate for a set of partition values
    (NULL-safe: isin() never matches NULL, so NULL gets its own arm)."""
    non_null = [v for v in values if v is not None]
    cond = F.col("partition_value").isin(non_null) if non_null else F.lit(False)
    if None in values:
        cond = cond | F.col("partition_value").isNull()
    return cond


def _with_publish_fields(schema: StructType) -> StructType:
    from pyspark.sql.types import DateType, StructField, TimestampType

    names = {f.name for f in schema.fields}
    fields = list(schema.fields)
    if "etl_inserted" not in names:
        fields.append(StructField("etl_inserted", TimestampType()))
    if "partition_value" not in names:
        fields.append(StructField("partition_value", DateType()))
    return StructType(fields)


def parquet_footer_stats(spark: SparkSession, root: str, stat_col: str) -> DataFrame:
    """Distributed parquet-FOOTER statistics collection — the builder
    of every file-skipping index (Delta's add-file stats, Iceberg's
    manifest metrics): per data file, row count and `stat_col` min/max
    read from row-group metadata only. No data page is ever read — a
    footer is a few KB regardless of file size — and the file list is
    distributed through mapInPandas, so at 100 TB / 1M files this is a
    1M-row metadata job, not a table scan. The planner side of this
    contract (stats → pruned scans) is pinned by scan_clustered_skip /
    scan_zorder_skip; this exposes the producing half as a first-class
    maintenance verb.
    """
    import os as _os

    files = sorted(
        _os.path.join(d, n)
        for d, _s, names in _os.walk(root)
        for n in names
        if n.endswith(".parquet")
    )
    fdf = spark.createDataFrame([(p,) for p in files], "path string")

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.read_metadata(p)
                idx = md.schema.names.index(stat_col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                out.append((p, md.num_rows, min(mins), max(maxs)))
            yield pd.DataFrame(
                out, columns=["path", "n_rows", "min_v", "max_v"]
            )

    return fdf.mapInPandas(
        read_footers, "path string, n_rows bigint, min_v bigint, max_v bigint"
    )


class TransactionLog:
    """Atomic MULTI-TABLE transactions over plain parquet — the
    consistency primitive single-table logs (Delta, and SnapshotLog
    above) lack: one manifest names the file list of EVERY table in the
    transaction, and one atomic rename publishes them together. A
    reader therefore always sees a fact table and its dimensions from
    the SAME transaction — no torn read where the fact references dim
    versions that aren't visible yet (the failure mode of publishing
    medallion tables one Airflow task at a time, reference
    dags/etl/run_etl.py:36-56, where a crash mid-DAG leaves silver new
    and gold stale).

    Layout:   root/v00000003/<table>/…parquet   per-commit data dirs
              root/_log/00000003.json           one manifest per commit
    Manifest: {"version": v, "tables": {name: [files…]}} — a table
    absent from a commit carries its parent's files by reference
    (same delta-only contract as SnapshotLog append).

    Commit protocol (identical crash story to SnapshotLog): write every
    table's data dir first, then one same-directory manifest rename. A
    crash before the rename leaves orphan dirs no reader resolves;
    after it, all tables flip together. Single-writer by design; on an
    object store the rename becomes a conditional put — same as Delta.

    100 TB posture: commit cost is O(files written this txn) + one
    manifest; unchanged tables never move; any historical transaction
    stays readable until vacuumed — a training run pins one version id
    and gets a CONSISTENT multi-table snapshot forever.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        os.makedirs(self.log_dir, exist_ok=True)

    def versions(self) -> list[int]:
        return sorted(
            int(n[:-5])
            for n in os.listdir(self.log_dir)
            if n.endswith(".json") and not n.startswith(".")
        )

    def _manifest(self, version: int) -> dict:
        import json

        with open(os.path.join(self.log_dir, f"{version:08d}.json")) as f:
            return json.load(f)

    def commit(
        self,
        tables: dict[str, DataFrame],
        append: set[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Atomically publish new contents for `tables`; tables not in
        the dict carry forward from the parent version by reference.
        Tables named in `append` write only their delta's files and
        keep the parent's files too (the delta-only fact-append path).
        `meta` rides in the manifest — e.g. a streaming batch_id, which
        makes foreachBatch replays detectable (exactly-once sinks)."""
        existing = self.versions()
        version = (existing[-1] + 1) if existing else 0
        carried = self._manifest(existing[-1])["tables"] if existing else {}
        files: dict[str, list[str]] = dict(carried)
        for name, df in tables.items():
            data_dir = os.path.join(self.root, f"v{version:08d}", name)
            df.write.mode("overwrite").parquet(data_dir)
            new_files = [
                os.path.relpath(p, self.root)
                for p in SnapshotLog._data_files(data_dir)
            ]
            if append and name in append:
                files[name] = carried.get(name, []) + new_files
            else:
                files[name] = new_files
        import json

        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "tables": files, "meta": meta or {}}, f
            )
        os.rename(tmp, os.path.join(self.log_dir, f"{version:08d}.json"))
        return version

    def latest_meta(self) -> dict:
        existing = self.versions()
        return self._manifest(existing[-1]).get("meta", {}) if existing else {}

    def read(self, table: str, version: int | None = None) -> DataFrame:
        existing = self.versions()
        if not existing:
            raise FileNotFoundError(f"no commits under {self.root}")
        if version is None:
            version = existing[-1]
        if version not in existing:
            raise FileNotFoundError(f"version {version} not in {existing}")
        manifest = self._manifest(version)
        if table not in manifest["tables"]:
            raise FileNotFoundError(f"table {table!r} not in version {version}")
        files = manifest["tables"][table]
        return self.spark.read.parquet(*[os.path.join(self.root, f) for f in files])


def input_fingerprint(paths: list[str]) -> str:
    """Content fingerprint of a set of parquet inputs: sha-256 over the
    sorted (relative path, size, mtime_ns) of every data file. O(#files)
    metadata stats — no data read — which is exactly the granularity a
    lakehouse result cache needs: any append/replace/compaction changes
    a file entry and invalidates."""
    import hashlib

    entries = []
    for root in paths:
        if os.path.isfile(root):
            st = os.stat(root)
            entries.append((os.path.basename(root), st.st_size, st.st_mtime_ns))
            continue
        for d, _s, names in os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(d, n)
                    st = os.stat(p)
                    entries.append((os.path.relpath(p, root), st.st_size, st.st_mtime_ns))
    h = hashlib.sha256()
    for e in sorted(entries):
        h.update(repr(e).encode())
    return h.hexdigest()[:32]


def cached_result(spark, inputs: list[str], cache_root: str, compute, query_key: str = ""):
    """Query-result cache: serve a previously materialized result when
    the input fingerprint is unchanged (Snowflake/Databricks result
    cache, reduced to its core). Returns (DataFrame, hit: bool).

    The cache key is input_fingerprint(inputs) ⊕ query_key — so a hit
    costs one directory stat walk and zero scans, while ANY change to
    the inputs (new file, overwrite, compaction) misses and recomputes.
    `query_key` must identify the COMPUTATION (query text / plan
    fingerprint) whenever one cache_root is shared by more than one
    query: with the default empty key, two different queries over the
    same inputs would collide and cross-serve each other's results —
    only safe with a per-query cache_root. Results publish via
    write-then-rename, so a crashed fill never produces a readable
    half-entry; concurrent fillers race benignly (same key → same
    content). At 100 TB the win is the repeated dashboard/report
    query: seconds of metadata stat instead of a full scan."""
    import hashlib

    fp = input_fingerprint(inputs)
    if query_key:
        fp = hashlib.sha256((fp + "\x00" + query_key).encode()).hexdigest()[:32]
    dest = os.path.join(cache_root, fp)
    if os.path.isdir(dest):
        return spark.read.parquet(dest), True
    staging = os.path.join(cache_root, f".tmp-{uuid.uuid4().hex[:8]}")
    compute().write.mode("overwrite").parquet(staging)
    os.makedirs(cache_root, exist_ok=True)
    try:
        os.rename(staging, dest)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # lost a benign race
    return spark.read.parquet(dest), False


class MergeOnReadTable:
    """Merge-on-read DELETEs over plain parquet — the Iceberg-v2
    equality-delete-file pattern, the write-cheap half of the
    delete-design space:

      copy-on-write (Warehouse.merge_write)  rewrite touched partitions
                                             at delete time; reads stay
                                             plain scans
      merge-on-read (this)                   deletes land as O(delta)
                                             KEY FILES; every read
                                             anti-joins them until
                                             apply_deletes() compacts

    At 100 TB the difference is the GDPR/erasure workload: deleting a
    few million keys out of a petabyte costs a key-file append here vs
    a multi-TB partition rewrite there; the read tax (one broadcast
    anti-join while deletes are small) is paid until the next
    compaction window applies them for free alongside layout
    maintenance.

    Layout: root/data/…parquet, root/_deletes/d-*.parquet (key files).
    """

    def __init__(self, spark: SparkSession, root: str, key_col: str):
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.data_dir = os.path.join(root, "data")
        self.del_dir = os.path.join(root, "_deletes")

    def write(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.data_dir)

    def _recover(self) -> None:
        """Heal an apply_deletes crash window (same two-rename swap and
        rules as Warehouse._recover): data.old alone → restore it;
        data.old alongside data → post-swap debris → drop it. Without
        this, a crash between the renames leaves NO data_dir and every
        read fails until manual repair."""
        old = self.data_dir + ".old"
        if not os.path.isdir(old):
            return
        if os.path.isdir(self.data_dir):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, self.data_dir)

    def delete_keys(self, keys: DataFrame) -> None:
        """O(|keys|) append of an equality-delete file — no data moves."""
        keys.select(F.col(self.key_col)).write.mode("append").parquet(self.del_dir)

    def _deletes(self) -> DataFrame | None:
        if not os.path.isdir(self.del_dir) or not any(
            n.endswith(".parquet")
            for _d, _s, names in os.walk(self.del_dir)
            for n in names
        ):
            return None
        return self.spark.read.parquet(self.del_dir)

    def read(self) -> DataFrame:
        self._recover()
        df = self.spark.read.parquet(self.data_dir)
        dels = self._deletes()
        if dels is None:
            return df
        return df.join(F.broadcast(dels.distinct()), self.key_col, "left_anti")

    def apply_deletes(self) -> dict[str, int]:
        """Compaction: materialize the anti-join once, swap atomically,
        clear the delete files — subsequent reads are plain scans again.
        Same staging+rename crash contract as Warehouse.compact."""
        dels = self._deletes()
        n_del_files = (
            sum(
                1
                for _d, _s, names in os.walk(self.del_dir)
                for n in names
                if n.endswith(".parquet")
            )
            if dels is not None
            else 0
        )
        if dels is None:
            return {"delete_files_applied": 0}
        self._recover()
        staging = os.path.join(self.root, f"_tmp-{uuid.uuid4().hex[:8]}")
        self.read().write.mode("overwrite").parquet(staging)
        old = self.data_dir + ".old"
        os.rename(self.data_dir, old)
        os.rename(staging, self.data_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(self.del_dir, ignore_errors=True)
        return {"delete_files_applied": n_del_files}
