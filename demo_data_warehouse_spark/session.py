"""SparkSession factory and runtime tuning.

The reference pins everything to UTC and makes the +7h Asia/Ho_Chi_Minh
shift explicit (reference dags/utils/common/data_helper.py:137,
dags/utils/etl.py:631). We mirror that: session timezone UTC, explicit
INTERVAL arithmetic for local-time derivations.

Scale posture (100 TB north star, SURVEY §7.3 item 7):
  - AQE on (runtime coalesce, skew-join splitting, dynamic join strategy)
  - dynamic partition overwrite (idempotent per-partition re-publish, ST4)
  - Arrow for any pandas interchange (extension operators)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to set at runtime on an existing session (the
# driver owns session creation; every query entry point calls tune()).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # a driver-owned session may prefer TIMESTAMP_NTZ (making
    # cast("timestamp") a no-op NTZ→NTZ); pin LTZ so chrono builtins
    # (unix_micros/unix_millis, tz conversion) resolve everywhere and
    # timestamp literals compare against catalog-normalized columns
    "spark.sql.timestampType": "TIMESTAMP_LTZ",
    # more driver-owned-session insurance: resolve columns
    # case-insensitively (the default this codebase is written against),
    # parse datetimes with the modern proleptic calendar, and read
    # unadjusted parquet timestamps as LTZ directly (catalog.table's
    # NTZ cast then never fires, but both paths stay value-identical)
    "spark.sql.caseSensitive": "false",
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # partition-column type inference and ANSI mode are the defaults the
    # whole registry is verified under; a driver-owned session flipping
    # either changes comparison/overflow semantics mid-plan (the
    # inference-off case made a string-typed partition range compare
    # lexicographically — hidden_partition now also types its own
    # comparisons, but other partitioned reads deserve the same floor)
    "spark.sql.sources.partitionColumnTypeInference.enabled": "true",
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: keep row-group pruning + pushdown on (defaults, pinned)
    "spark.sql.parquet.filterPushdown": "true",
    # write timestamps as INT64 micros, not legacy INT96: INT96 carries
    # NO min/max column stats, which silently disables footer-based
    # file/row-group skipping on every ts predicate (io.py
    # write_clustered contract; pinned by tests/unit/test_clustered.py)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # testdata events.parquet stores TIMESTAMP(NANOS) which Spark rejects
    # by default; read as long ns and convert in catalog.table
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # pin the join-strategy defaults some queries override in-session
    # (join_bloom_runtime lowers the bloom thresholds and disables
    # broadcast to demonstrate the 100 TB shuffle-join shape): tune()
    # runs at the top of every query wrapper, so an override can never
    # leak into the NEXT query's plan
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    # scan_agg_pushdown flips parquet to the DSv2 path with aggregate
    # pushdown in-session; re-pin the defaults so the override cannot
    # leak into the next query's plan
    "spark.sql.sources.useV1SourceList": "avro,csv,json,kafka,orc,parquet,text",
    "spark.sql.parquet.aggregatePushdown": "false",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a session we did not create (driver-owned)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not runtime-settable on this build — best effort
    return spark


# DDW_ADVERSARIAL=1 creates the session with every semantics-changing
# conf flipped AWAY from the verified defaults — the strongest model of
# a driver-owned session. Queries must still pass the full oracle gate,
# because each wrapper's tune() re-pins the floor before planning.
_ADVERSARIAL_CONFS = {
    "spark.sql.session.timeZone": "Asia/Ho_Chi_Minh",
    "spark.sql.timestampType": "TIMESTAMP_NTZ",
    "spark.sql.caseSensitive": "true",
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def adversarial_enabled() -> bool:
    """Strict parse of DDW_ADVERSARIAL. "0"/"false"/"no"/unset must NOT
    silently flip a bench or gate run into the untuned,
    semantics-flipped session (ADVICE r6) — and an UNRECOGNIZED value
    must raise rather than quietly opt out: someone exporting
    DDW_ADVERSARIAL=on believes they are recording adversarial
    evidence, and a silently tuned session would make that artifact
    false confidence in the wrong direction."""
    raw = os.environ.get("DDW_ADVERSARIAL", "").strip().lower()
    if raw in ("1", "true", "yes"):
        return True
    if raw in ("", "0", "false", "no"):
        return False
    raise ValueError(
        f"DDW_ADVERSARIAL={raw!r} is not a recognized boolean; use "
        "1/true/yes to enable the adversarial session or 0/false/no/unset "
        "to disable it"
    )


def get_spark(app_name: str = "ddw-spark", master: str | None = None) -> SparkSession:
    """Create (or get) a tuned local session. Tests and bench use this."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    master = master or (f"local[{cpus}]" if cpus else "local[*]")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", os.environ.get("DDW_SHUFFLE_PARTITIONS", "32"))
        .config("spark.driver.memory", os.environ.get("DDW_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if adversarial_enabled():
        for k, v in _ADVERSARIAL_CONFS.items():
            b = b.config(k, v)
        return b.getOrCreate()  # deliberately NOT tuned: wrappers must rescue
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    return tune(b.getOrCreate())
