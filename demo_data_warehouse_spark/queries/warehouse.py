"""Warehouse-semantics driver queries: SCD2 delta + MERGE upsert
(SURVEY §2.1 S4, §2.3 J5-J7) exercised on the events table.

dim  = latest event per user with ts <= cutoff (the current snapshot)
batch = latest event per user with ts > cutoff (the incoming batch)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.diff import snapshot_diff
from ..operators.incremental import (
    distinct_state,
    finalize_distinct,
    finalize_quantile,
    finalize_rollup,
    merge_distinct_state,
    merge_partials,
    merge_quantile_state,
    quantile_state,
    rollup_partials,
)
from ..operators.merge import merge_delete, merge_upsert
from ..operators.scd2 import SENTINEL_TS, scd2_delta, surrogate_id
from . import query

CUTOFF = "2024-01-15 00:00:00"


def _latest_per_user(ev, predicate):
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.where(predicate)
        .withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .select("user_id", "ts", "value", "event_type")
    )


@query(
    "scd2_delta",
    oracle=f"""
    WITH dim_src AS (
        SELECT user_id, ts, value, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{CUTOFF}'
    ), dim AS (
        SELECT user_id,
               md5(concat(CAST(user_id AS VARCHAR), strftime(ts, '%Y-%m-%d %H:%M:%S'))) AS sur_id,
               value, event_type, ts, ts AS valid_from,
               TIMESTAMP '{SENTINEL_TS}' AS valid_to, TRUE AS is_current
        FROM dim_src WHERE rn = 1
    ), batch_src AS (
        SELECT user_id, ts, value, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts > TIMESTAMP '{CUTOFF}'
    ), batch AS (
        SELECT user_id, ts, value, event_type FROM batch_src WHERE rn = 1
    ), net_new AS (
        SELECT b.user_id,
               md5(concat(CAST(b.user_id AS VARCHAR), strftime(b.ts, '%Y-%m-%d %H:%M:%S'))) AS sur_id,
               b.value, b.event_type, b.ts, b.ts AS valid_from,
               TIMESTAMP '{SENTINEL_TS}' AS valid_to, TRUE AS is_current
        FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.user_id = b.user_id)
    ), changed AS (
        SELECT b.user_id, b.ts, b.value, b.event_type,
               d.sur_id AS dim_sur, d.valid_from AS dim_valid_from,
               d.value AS dim_value, d.event_type AS dim_event_type
        FROM batch b JOIN dim d ON b.user_id = d.user_id
        WHERE d.ts < b.ts
    ), new_ver AS (
        SELECT user_id,
               md5(concat(CAST(user_id AS VARCHAR), strftime(ts, '%Y-%m-%d %H:%M:%S'))) AS sur_id,
               value, event_type, ts, ts AS valid_from,
               TIMESTAMP '{SENTINEL_TS}' AS valid_to, TRUE AS is_current
        FROM changed
    ), closed AS (
        SELECT user_id, dim_sur AS sur_id, dim_value AS value,
               dim_event_type AS event_type, ts, dim_valid_from AS valid_from,
               ts AS valid_to, FALSE AS is_current
        FROM changed
    )
    SELECT user_id, sur_id, value, event_type, ts, valid_from, valid_to, is_current FROM net_new
    UNION ALL
    SELECT user_id, sur_id, value, event_type, ts, valid_from, valid_to, is_current FROM new_ver
    UNION ALL
    SELECT user_id, sur_id, value, event_type, ts, valid_from, valid_to, is_current FROM closed
    """,
)
def scd2_delta_query(spark, sf_dir):
    """SCD2 composite (J5+J6+J7+U1+F1+F16+F19; reference dags/utils/etl.py:274-354)."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")
    batch = _latest_per_user(ev, F.col("ts") > cutoff)
    dim = _latest_per_user(ev, F.col("ts") <= cutoff).select(
        "user_id",
        surrogate_id("user_id", "ts").alias("sur_id"),
        "value",
        "event_type",
        "ts",
        F.col("ts").alias("valid_from"),
        F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return scd2_delta(dim, batch, key="user_id", ts_col="ts", attr_cols=["value", "event_type"])


@query(
    "merge_upsert",
    oracle="""
    WITH target AS (
        SELECT event_id, user_id, value FROM events WHERE event_id % 10 < 8
    ), src AS (
        SELECT event_id, user_id, value * 2 AS value FROM events WHERE event_id % 10 >= 6
    )
    SELECT t.event_id, t.user_id, t.value FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.event_id = t.event_id)
    UNION ALL
    SELECT event_id, user_id, value FROM src
    """,
)
def merge_upsert_query(spark, sf_dir):
    """S4: emulated MERGE — updated rows win, survivors kept, new inserted
    (reference dags/utils/common/data_helper.py:76-106)."""
    ev = table(spark, sf_dir, "events")
    target = ev.where(F.col("event_id") % 10 < 8).select("event_id", "user_id", "value")
    src = ev.where(F.col("event_id") % 10 >= 6).select(
        "event_id", "user_id", (F.col("value") * 2).alias("value")
    )
    return merge_upsert(target, src, keys=["event_id"])


@query(
    "merge_schema_evolution",
    oracle="""
    WITH target AS (
        SELECT event_id, user_id, value FROM events WHERE event_id % 10 < 8
    ), src AS (
        SELECT event_id, user_id, value * 2 AS value, event_type
        FROM events WHERE event_id % 10 >= 6
    )
    SELECT t.event_id, t.user_id, t.value, CAST(NULL AS VARCHAR) AS event_type
    FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.event_id = t.event_id)
    UNION ALL
    SELECT event_id, user_id, value, event_type FROM src
    """,
)
def merge_schema_evolution_query(spark, sf_dir):
    """S4 + schema drift: the delta arrives with a NEW column (the
    upstream added a field — the reference's get_table_schema refreshes
    per run, dags/ingestion/lark_to_gcs.py:110-125, so new Bitable
    fields flow in without code changes). Evolution adds the column,
    nulls it for surviving rows, and never retypes or drops —
    operators/merge.py::align_schemas."""
    ev = table(spark, sf_dir, "events")
    target = ev.where(F.col("event_id") % 10 < 8).select("event_id", "user_id", "value")
    src = ev.where(F.col("event_id") % 10 >= 6).select(
        "event_id", "user_id", (F.col("value") * 2).alias("value"), "event_type"
    )
    return merge_upsert(target, src, keys=["event_id"], evolve_schema=True)


@query(
    "merge_delete",
    oracle="""
    SELECT event_id, user_id, value, event_type
    FROM events t
    WHERE NOT EXISTS (
        SELECT 1 FROM events d
        WHERE d.event_id % 997 = 0 AND d.user_id = t.user_id
    )
    """,
)
def merge_delete_query(spark, sf_dir):
    """MERGE … WHEN MATCHED DELETE: a delete-key feed (users named in a
    right-to-erasure request, here every user owning an event_id % 997 == 0
    event) removes all their rows from the target. One anti-join; the
    small distinct key set broadcasts so the target never shuffles —
    operators/merge.py::merge_delete. Complements merge_upsert's
    UPDATE/INSERT arms to cover the full MERGE verb set of the
    reference's publish path (dags/utils/common/data_helper.py:76-106)."""
    ev = table(spark, sf_dir, "events")
    target = ev.select("event_id", "user_id", "value", "event_type")
    deletes = ev.where(F.col("event_id") % 997 == 0).select("user_id")
    return merge_delete(target, deletes, keys=["user_id"])


@query(
    "agg_incremental",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
             AS avg_value,
           CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS min_value,
           CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_incremental(spark, sf_dir):
    """Incremental gold-rollup maintenance: the stored aggregate (facts
    up to the cutoff, kept as mergeable partial state) is updated from
    the post-cutoff delta WITHOUT re-reading history — partial-aggregate
    the delta, merge states, finalize. The oracle is the full recompute
    over all facts: incremental maintenance must be indistinguishable
    from it. Replaces the reference's rebuild-gold-every-run
    (dags/utils/etl.py:616-677) with the O(delta) plan that survives
    100 TB — operators/incremental.py."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")
    stored = rollup_partials(ev.where(F.col("ts") <= cutoff), ["event_type"], "value")
    delta = rollup_partials(ev.where(F.col("ts") > cutoff), ["event_type"], "value")
    return finalize_rollup(merge_partials(stored, delta, ["event_type"]), ["event_type"])


@query(
    "agg_incremental_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def agg_incremental_distinct(spark, sf_dir):
    """Incremental EXACT distinct-count maintenance — distinct is the
    one common aggregate with no algebraic merge, so the state is the
    distinct (group, value) pair set; merging a delta is union ∪
    distinct (idempotent under replay), finalize counts per group. The
    oracle is the full COUNT(DISTINCT) recompute. The constant-state
    alternative (HLL sketches via hll_sketch_agg / hll_union_agg) is
    operators/incremental.py::hll_partials — the 100 TB default when
    ~1% error is acceptable."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")
    stored = distinct_state(ev.where(F.col("ts") <= cutoff), ["event_type"], "user_id")
    delta = distinct_state(ev.where(F.col("ts") > cutoff), ["event_type"], "user_id")
    return finalize_distinct(merge_distinct_state(stored, delta), ["event_type"])


@query(
    "agg_incremental_quantile",
    oracle="""
    WITH state AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(floor((value - 0.0) / 0.5) AS BIGINT), 0), 999) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM state
    )
    SELECT event_type,
           CAST(MIN((bin + 0.5) * 0.5 + 0.0) AS DOUBLE) AS p50_est
    FROM cum WHERE cum * 2 >= total * 1
    GROUP BY event_type
    """,
)
def agg_incremental_quantile(spark, sf_dir):
    """Incremental MEDIAN maintenance via mergeable fixed-bin histogram
    state (operators/incremental.py::quantile_state): exact quantiles
    don't merge, so the state is per-group counts over 1000 equal-width
    value bins; a delta is histogrammed alone and count-merged — O(delta)
    plus a |groups·bins|-bounded shuffle, history never re-read. The
    estimate (first-bin-midpoint crossing q·total, integer-exact
    comparison) is deterministic, so the oracle replays the identical
    binning in SQL — unlike percentile_approx, whose sketch is
    implementation-defined. Error bound = width/2 (±0.25 here).
    Replaces rebuild-gold-every-run for percentile KPIs
    (reference dags/utils/etl.py:616-677)."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")
    lo, width, nbins = 0.0, 0.5, 1000
    stored = quantile_state(
        ev.where(F.col("ts") <= cutoff), ["event_type"], "value", lo, width, nbins
    )
    delta = quantile_state(
        ev.where(F.col("ts") > cutoff), ["event_type"], "value", lo, width, nbins
    )
    merged = merge_quantile_state(stored, delta, ["event_type"])
    return finalize_quantile(merged, ["event_type"], lo, width, alias="p50_est")


@query(
    "table_diff",
    oracle="""
    WITH old_snap AS (
        SELECT event_id, value, event_type FROM events WHERE event_id % 11 <> 0
    ), new_snap AS (
        SELECT event_id,
               CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END AS value,
               event_type
        FROM events WHERE event_id % 13 <> 0
    ), j AS (
        SELECT COALESCE(o.event_id, n.event_id) AS event_id,
               CASE WHEN o.event_id IS NULL THEN 'inserted'
                    WHEN n.event_id IS NULL THEN 'deleted'
                    WHEN NOT (o.value IS NOT DISTINCT FROM n.value
                              AND o.event_type IS NOT DISTINCT FROM n.event_type)
                         THEN 'updated' END AS change_type,
               o.value AS old_value, o.event_type AS old_event_type,
               n.value AS new_value, n.event_type AS new_event_type
        FROM old_snap o FULL OUTER JOIN new_snap n ON o.event_id = n.event_id
    )
    SELECT event_id, change_type, old_value, old_event_type, new_value, new_event_type
    FROM j WHERE change_type IS NOT NULL
    """,
)
def table_diff(spark, sf_dir):
    """Snapshot reconciliation: classify rows between two published
    table versions as inserted / deleted / updated (null-safe value
    compare), dropping the unchanged majority — the audit a warehouse
    runs over a MERGE sink, and the same classification the reference's
    SCD2 build performs inline (dags/utils/etl.py:274-354) —
    operators/diff.py::snapshot_diff."""
    ev = table(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") % 11 != 0).select("event_id", "value", "event_type")
    new = ev.where(F.col("event_id") % 13 != 0).select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.col("value") * 2)
        .otherwise(F.col("value"))
        .alias("value"),
        "event_type",
    )
    return snapshot_diff(old, new, keys=["event_id"], compare_cols=["value", "event_type"])


@query(
    "agg_incremental_topk",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
    FROM events GROUP BY user_id
    ORDER BY SUM(CAST(round(value * 100) AS BIGINT)) DESC, user_id
    LIMIT 10
    """,
)
def agg_incremental_topk(spark, sf_dir):
    """Incrementally-maintained leaderboard: top-k is NOT mergeable from
    per-partition top-k lists (a key just below k in every shard can be
    global top-1), so the maintained state is the FULL per-key partial
    sums (operators/incremental.py::rollup_partials — exact integer
    cents, O(delta) updates), and top-k is a cheap finalize over state:
    TakeOrdered on |keys| rows, never a fact re-read. The oracle is the
    full recompute. Ties break toward the lower key, pinned in both
    engines by sorting on the EXACT integer sum (a double sort key
    could not distinguish sums differing below 1 ulp)."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")
    stored = rollup_partials(ev.where(F.col("ts") <= cutoff), ["user_id"], "value")
    delta = rollup_partials(ev.where(F.col("ts") > cutoff), ["user_id"], "value")
    state = merge_partials(stored, delta, ["user_id"])
    return (
        state.orderBy(F.desc("sum_c"), "user_id")
        .limit(10)
        .select(
            "user_id",
            (F.col("sum_c").cast("double") / 100.0).alias("total_value"),
        )
    )


@query(
    "maintenance_compact",
    oracle="""
    SELECT event_id, user_id,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    """,
)
def maintenance_compact(spark, sf_dir):
    """OPTIMIZE as a registry verb: a deliberately fragmented table
    (64-way repartition before a partition-replace publish — the
    file-count shape every micro-batch MERGE sink produces) is
    compacted to target-size files (io.py::compact — per-partition
    staging+swap with crash healing), then read back. The oracle is
    the source content: compaction must be byte-identical, only the
    layout changes. The file-count drop is asserted here so a
    compaction that silently does nothing fails the gate too."""
    from ..io import Warehouse
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wh = Warehouse(spark, scratch_dir("compact_q"))
    wh.write_partition_replace(ev.repartition(64), "silver", "ev_frag", "2024-01-01")
    stats = wh.compact("silver", "ev_frag", target_file_bytes=512 * 1024 * 1024)
    assert stats["files_after"] < stats["files_before"], stats
    return wh.read("silver", "ev_frag").select("event_id", "user_id", "cents")


@query(
    "maintenance_vacuum",
    oracle="""
    SELECT event_id, user_id,
           CAST(ts AS DATE) AS partition_value,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
    """,
)
def maintenance_vacuum(spark, sf_dir):
    """Retention VACUUM as a registry verb (the deletion half of
    maintenance, pairing maintenance_compact's layout half): publish a
    date-partitioned table, drop every partition older than the
    retention cutoff via io.py::vacuum_partitions — metadata-scale
    directory removal, no surviving row read or rewritten — and read
    the table back. The oracle is the source filtered to the retention
    window: vacuum must equal a clean cutoff filter, and the dropped/
    kept partition counts are asserted in-query so a vacuum that
    silently deletes nothing (or everything) fails the gate."""
    from ..io import Warehouse
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("date").alias("pday"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wh = Warehouse(spark, scratch_dir("vacuum_q"))
    path = wh.path("silver", "ev_retain")
    # one hive partition dir per day, partition_value derived from data
    ev.withColumnRenamed("pday", "partition_value").write.mode(
        "overwrite"
    ).partitionBy("partition_value").parquet(path)
    stats = wh.vacuum_partitions("silver", "ev_retain", keep_from="2024-01-16")
    assert stats["partitions_dropped"] > 0 < stats["partitions_kept"], stats
    return (
        spark.read.parquet(path)
        .select("event_id", "user_id", "partition_value", "cents")
    )


@query(
    "maintenance_time_travel",
    oracle="""
    WITH v0 AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 3 = 0
    ), delta AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) + 100 AS cents
        FROM orders WHERE o_orderkey % 6 = 0
    ), v1 AS (
        SELECT * FROM v0 WHERE o_orderkey % 6 <> 0
        UNION ALL SELECT * FROM delta
    )
    SELECT CAST(0 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents FROM v0
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT) FROM v1
    """,
)
def maintenance_time_travel(spark, sf_dir):
    """Snapshot isolation + time travel as a registry verb
    (io.py::SnapshotLog — the commit-log/versioning leg of maintenance,
    beside compact and vacuum): commit a base snapshot, MERGE a
    re-priced delta (operators/merge.py semantics, delta wins) and
    commit the result as version 1, then read BOTH versions back
    through the log and aggregate each. The oracle recomputes the two
    table states from the source — a log that let the new commit bleed
    into the old snapshot (or vice versa) changes a version's row count
    or exact cents sum and fails the hash. At 100 TB the read path is
    what matters: a training run pins `read(version=k)` and is
    reproducible against any later commits; a commit is one manifest
    write, never a table rewrite."""
    from ..io import SnapshotLog
    from ..operators.merge import merge_upsert
    from ..streaming.pipeline import scratch_dir

    o = table(spark, sf_dir, "orders")
    v0 = o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    delta = o.where(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.round(F.col("o_totalprice") * 100).cast("bigint") + 100).alias("cents"),
    )
    log = SnapshotLog(spark, scratch_dir("timetravel_q"))
    log.commit(v0)
    log.commit(merge_upsert(log.read(), delta, keys=["o_orderkey"]))
    assert log.versions() == [0, 1], log.versions()

    def state(version):
        return log.read(version=version).agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        )

    return state(0).unionAll(state(1))


@query(
    "maintenance_snapshot_cdf",
    oracle="""
    WITH v0 AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 3 = 0
    ), delta AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) + 100 AS cents
        FROM orders WHERE o_orderkey % 5 = 0
    ), v1 AS (
        SELECT * FROM v0 WHERE o_orderkey % 5 <> 0
        UNION ALL SELECT * FROM delta
    ), v2 AS (
        SELECT * FROM v1 WHERE o_orderkey % 9 <> 0
    ), j AS (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                    WHEN n.o_orderkey IS NULL THEN 'deleted'
                    WHEN NOT (o.cents IS NOT DISTINCT FROM n.cents)
                         THEN 'updated' END AS change_type,
               o.cents AS old_cents, n.cents AS new_cents
        FROM v0 o FULL OUTER JOIN v2 n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey, change_type, old_cents, new_cents
    FROM j WHERE change_type IS NOT NULL
    """,
)
def maintenance_snapshot_cdf(spark, sf_dir):
    """Change data feed between committed snapshots — SnapshotLog (S41)
    composed with snapshot_diff (table_diff's operator): commit a base
    version, MERGE a re-priced delta (insert+update), MERGE a key-feed
    delete, then derive inserted/updated/deleted rows BETWEEN version 0
    and version 2 by reading both through the log. This is
    Delta/Iceberg's table_changes() re-expressed: the feed is computed
    from immutable snapshots, so it is replayable for any version pair
    forever (until vacuum) — at 100 TB the diff is one co-partitioned
    full-outer join on the key, and unchanged rows never leave their
    executors. The oracle recomputes all three states from source."""
    from ..io import SnapshotLog
    from ..streaming.pipeline import scratch_dir

    o = table(spark, sf_dir, "orders")
    v0 = o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    delta = o.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 100).cast("bigint") + 100).alias("cents"),
    )
    deletes = o.where(F.col("o_orderkey") % 9 == 0).select("o_orderkey")
    log = SnapshotLog(spark, scratch_dir("cdf_q"))
    log.commit(v0)
    log.commit(merge_upsert(log.read(), delta, keys=["o_orderkey"]))
    log.commit(merge_delete(log.read(), deletes, keys=["o_orderkey"]))
    return snapshot_diff(
        log.read(version=0), log.read(version=2), keys=["o_orderkey"], compare_cols=["cents"]
    )


@query(
    "merge_cdc_apply",
    oracle="""
    WITH target AS (
      SELECT user_id, cents FROM (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 3 = 0
      ) t WHERE rn = 1
    ), feed AS (
      SELECT user_id, event_id AS seq,
             CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_id % 3 <> 0
    ), latest AS (
      SELECT user_id, op, cents FROM (
        SELECT f.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
        FROM feed f
      ) x WHERE rn = 1
    )
    SELECT user_id, cents FROM target
    WHERE user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id, cents FROM latest WHERE op <> 'D'
    """,
)
def merge_cdc_apply(spark, sf_dir):
    """APPLY CHANGES INTO (operators/merge.py::apply_changes): a CDC
    feed keyed by user with a sequence column is applied to a base
    snapshot — per key only the highest-seq row acts, 'D' deletes the
    key, anything else upserts. The per-key latest is a single
    max-over-struct aggregate (map-side combinable — no window sort
    over the feed), so at 100 TB the feed collapses before it shuffles;
    replay/out-of-order convergence is property-tested. The oracle
    replays the same resolution with a window."""
    from ..operators.merge import apply_changes

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    target = (
        ev.where(F.col("event_id") % 3 == 0)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    )
    feed = ev.where(F.col("event_id") % 3 != 0).select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 11 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return apply_changes(target, feed, keys=["user_id"], seq_col="seq", op_col="op")


@query(
    "agg_incremental_join",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_incremental_join(spark, sf_dir):
    """Incremental maintenance of a JOIN view (SPJ+aggregate IVM — the
    materialized-view algebra: Δ(fact ⋈ dims) = Δfact ⋈ dims when dims
    are stable): per-nation revenue is maintained as stored partials
    from the historical fact slice plus a delta computed by joining
    ONLY the new lineitems (shipdate past the cutoff) through
    orders→customer→nation; the two partial sets merge by key
    (operators/incremental.py::merge_partials). At 100 TB the
    historical fact is never re-scanned and never re-joined — each
    refresh costs Δfact ⋈ broadcast-dims + a |nations|-sized merge.
    The oracle is the full recompute over all facts, proving
    partial+merge equals batch semantics exactly (integer cents)."""
    from ..operators.incremental import merge_partials, rollup_partials

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cutoff = F.lit("1995-06-01").cast("timestamp")

    def partials(fact):
        joined = (
            fact.join(F.broadcast(o), fact.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        )
        return rollup_partials(joined, ["n_name"], "l_extendedprice")

    stored = partials(li.where(F.col("l_shipdate") <= cutoff))
    delta = partials(li.where(F.col("l_shipdate") > cutoff))
    merged = merge_partials(stored, delta, ["n_name"])
    return merged.select(
        "n_name",
        F.col("n_rows").cast("bigint").alias("n_items"),
        F.col("sum_c").cast("bigint").alias("revenue_cents"),
    )


@query(
    "maintenance_file_stats",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS partition_value,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events GROUP BY 1
    """,
)
def maintenance_file_stats(spark, sf_dir):
    """File-skipping statistics as a registry verb
    (io.py::parquet_footer_stats): events publish date-partitioned with
    one file per partition, then per-file row counts and cents min/max
    are collected FROM FOOTERS ONLY (distributed metadata job — no data
    page read) and keyed back to the partition. The oracle recomputes
    the same numbers from the data: footer statistics that drift from
    the data they describe would silently break every skipping
    optimization downstream, which is exactly what this hash gate would
    catch."""
    from .. import io as _io
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("date").alias("partition_value"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    root = scratch_dir("file_stats_q")
    ev.repartition("partition_value").write.mode("overwrite").partitionBy(
        "partition_value"
    ).parquet(root)
    stats = _io.parquet_footer_stats(spark, root, "cents")
    return stats.select(
        F.regexp_extract("path", r"partition_value=([^/]+)", 1).alias("partition_value"),
        "n_rows",
        F.col("min_v").alias("min_cents"),
        F.col("max_v").alias("max_cents"),
    )


@query(
    "maintenance_clone",
    oracle="""
    WITH base AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 0
    ), clone_delta AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 1 AND event_type = 'click'
    ), source_delta AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 1 AND event_type = 'view'
    )
    SELECT 'source' AS origin, event_id, event_type, cents FROM base
    UNION ALL
    SELECT 'source', event_id, event_type, cents FROM source_delta
    UNION ALL
    SELECT 'clone', event_id, event_type, cents FROM base
    UNION ALL
    SELECT 'clone', event_id, event_type, cents FROM clone_delta
    """,
)
def maintenance_clone(spark, sf_dir):
    """Zero-copy SHALLOW CLONE (io.py::SnapshotLog.clone — the
    dev-sandbox / experiment-branch verb of the lakehouse family):
    clone a committed snapshot by manifest reference (no data copied),
    then append DIFFERENT deltas to clone and source and read both
    back. Isolation is the hash contract: a clone whose commits bleed
    into the source (or vice versa) changes the per-origin row sets.
    At 100 TB the clone costs one O(#files) manifest write."""
    from ..io import SnapshotLog
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    base = ev.where(F.col("event_id") % 2 == 0)
    src = SnapshotLog(spark, scratch_dir("clone_src"))
    src.commit(base)
    dup = src.clone(scratch_dir("clone_dst"))
    dup.commit(
        ev.where((F.col("event_id") % 2 == 1) & (F.col("event_type") == "click")),
        mode="append",
    )
    src.commit(
        ev.where((F.col("event_id") % 2 == 1) & (F.col("event_type") == "view")),
        mode="append",
    )
    return (
        src.read().select(F.lit("source").alias("origin"), "event_id", "event_type", "cents")
        .unionAll(
            dup.read().select(F.lit("clone").alias("origin"), "event_id", "event_type", "cents")
        )
    )


@query(
    "maintenance_repartition",
    oracle="""
    SELECT event_id, user_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS partition_value
    FROM events
    """,
)
def maintenance_repartition(spark, sf_dir):
    """Partition-scheme migration as a registry verb (io.py::
    Warehouse.repartition_layout): a day-partitioned table whose
    partition count outgrew its query patterns is rewritten under
    week partitions — content row-identical (the oracle recomputes it
    from source; any lost/duplicated row breaks the hash), only the
    layout and therefore pruning granularity changes. Staging +
    atomic swap: never observable half-migrated. The partition-count
    drop is asserted in-query so a no-op migration fails the gate."""
    from ..io import Warehouse
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.to_date("ts").alias("partition_value"),
    )
    wh = Warehouse(spark, scratch_dir("repart_q"))
    wh.write_partition_replace(ev, "silver", "ev_day", "2024-01-01")
    stats = wh.repartition_layout(
        "silver", "ev_day", F.trunc(F.col("partition_value"), "week")
    )
    assert stats["parts_after"] < stats["parts_before"], stats
    return wh.read("silver", "ev_day").select(
        "event_id", "user_id", "cents", "partition_value"
    )


@query(
    "maintenance_transaction",
    oracle="""
    WITH dim0 AS (
      SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer WHERE c_custkey % 3 = 0
    ), fact0 AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_custkey % 3 = 0 AND o_orderkey % 2 = 0
    ), dim1 AS (
      SELECT c_custkey, cents + 100 AS cents FROM dim0
    ), fact1 AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_custkey % 3 = 0
    )
    SELECT CAST(0 AS BIGINT) AS version, 'dim' AS tbl, c_custkey AS key, cents FROM dim0
    UNION ALL
    SELECT 0, 'fact', o_orderkey, cents FROM fact0
    UNION ALL
    SELECT 1, 'dim', c_custkey, cents FROM dim1
    UNION ALL
    SELECT 1, 'fact', o_orderkey, cents FROM fact1
    """,
)
def maintenance_transaction(spark, sf_dir):
    """Atomic MULTI-TABLE transactions (io.py::TransactionLog): fact and
    dimension publish under ONE manifest rename, so a reader can never
    see a fact referencing dim versions that aren't visible yet — the
    torn-read failure of publishing medallion tables one task at a time
    (reference dags/etl/run_etl.py:36-56, where a crash mid-DAG leaves
    silver new and gold stale). Two transactions are committed (v1
    reprices the dim AND extends the fact together); the query reads
    both tables AT BOTH versions — a log that let one table's change
    bleed across versions, or published the pair non-atomically,
    changes some version's row set and fails the hash."""
    from ..io import TransactionLog
    from ..streaming.pipeline import scratch_dir

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    dim0 = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents")
    )
    fact0 = orders.where(
        (F.col("o_custkey") % 3 == 0) & (F.col("o_orderkey") % 2 == 0)
    ).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    fact1 = orders.where(F.col("o_custkey") % 3 == 0).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    txn = TransactionLog(spark, scratch_dir("txn_q"))
    txn.commit({"dim": dim0, "fact": fact0})
    dim1 = txn.read("dim").select("c_custkey", (F.col("cents") + 100).alias("cents"))
    txn.commit({"dim": dim1, "fact": fact1})
    assert txn.versions() == [0, 1], txn.versions()

    def state(version, tbl, key_col):
        return txn.read(tbl, version=version).select(
            F.lit(version).cast("bigint").alias("version"),
            F.lit(tbl).alias("tbl"),
            F.col(key_col).alias("key"),
            "cents",
        )

    return (
        state(0, "dim", "c_custkey")
        .unionAll(state(0, "fact", "o_orderkey"))
        .unionAll(state(1, "dim", "c_custkey"))
        .unionAll(state(1, "fact", "o_orderkey"))
    )


@query(
    "maintenance_bitemporal",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS key,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer WHERE c_custkey % 2 = 0
    ), v0 AS (
      SELECT key, cents,
             TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             TIMESTAMP '2099-01-01 12:00:00' AS valid_to
      FROM base
    ), v1 AS (
      -- repriced keys: old row closed at 2024-06-01, new current row
      SELECT key, cents, valid_from,
             CASE WHEN key % 4 = 0 THEN TIMESTAMP '2024-06-01 00:00:00'
                  ELSE valid_to END AS valid_to
      FROM v0
      UNION ALL
      SELECT key, cents + 500, TIMESTAMP '2024-06-01 00:00:00',
             TIMESTAMP '2099-01-01 12:00:00'
      FROM v0 WHERE key % 4 = 0
    ), probes AS (
      SELECT * FROM (VALUES
        (0, TIMESTAMP '2024-03-01 00:00:00'),
        (1, TIMESTAMP '2024-03-01 00:00:00'),
        (1, TIMESTAMP '2024-09-01 00:00:00')) t(sys_version, valid_at)
    ), states AS (
      SELECT 0 AS sys_version, * FROM v0
      UNION ALL SELECT 1, * FROM v1
    )
    SELECT p.sys_version, p.valid_at,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(s.cents) AS BIGINT) AS cents_checksum
    FROM probes p JOIN states s
      ON s.sys_version = p.sys_version
     AND s.valid_from <= p.valid_at AND p.valid_at < s.valid_to
    GROUP BY p.sys_version, p.valid_at
    """,
)
def maintenance_bitemporal(spark, sf_dir):
    """BITEMPORAL query — the two time axes composed: VALID time from
    the SCD2 interval columns (what was true in the world at time t)
    and SYSTEM time from SnapshotLog versions (what the warehouse
    believed as of commit v). "What did we believe at v about t" is
    the audit/backtest question neither axis answers alone — and the
    label-leakage guard for training on revisioned features. Commit v0
    (initial SCD2 state) and v1 (a reprice closing old rows), then
    probe three (system, valid) pairs through the log; the oracle
    recomputes every state, so version bleed on EITHER axis breaks the
    hash. Reads are manifest-resolved + interval-filtered — no history
    rewrite, any (v, t) pair stays answerable until vacuum."""
    from ..io import SnapshotLog
    from ..streaming.pipeline import scratch_dir

    SENT = "2099-01-01 12:00:00"
    base = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 2 == 0)
        .select(
            F.col("c_custkey").alias("key"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        )
    )
    v0 = base.select(
        "key",
        "cents",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(SENT).cast("timestamp").alias("valid_to"),
    )
    closed = v0.withColumn(
        "valid_to",
        F.when(
            F.col("key") % 4 == 0, F.lit("2024-06-01 00:00:00").cast("timestamp")
        ).otherwise(F.col("valid_to")),
    )
    reprice = (
        v0.where(F.col("key") % 4 == 0)
        .select(
            "key",
            (F.col("cents") + 500).alias("cents"),
            F.lit("2024-06-01 00:00:00").cast("timestamp").alias("valid_from"),
            F.lit(SENT).cast("timestamp").alias("valid_to"),
        )
    )
    log = SnapshotLog(spark, scratch_dir("bitemporal_q"))
    log.commit(v0)
    log.commit(closed.unionByName(reprice))

    def probe(sys_version, valid_at):
        return (
            log.read(version=sys_version)
            .where(
                (F.col("valid_from") <= F.lit(valid_at).cast("timestamp"))
                & (F.lit(valid_at).cast("timestamp") < F.col("valid_to"))
            )
            .agg(
                F.lit(sys_version).cast("bigint").alias("sys_version"),
                F.lit(valid_at).cast("timestamp").alias("valid_at"),
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("cents_checksum"),
            )
        )

    return (
        probe(0, "2024-03-01 00:00:00")
        .unionAll(probe(1, "2024-03-01 00:00:00"))
        .unionAll(probe(1, "2024-09-01 00:00:00"))
    )


@query(
    "maintenance_result_cache",
    oracle="""
    WITH agg AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events GROUP BY event_type
    ), agg3 AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM (SELECT * FROM events
            UNION ALL SELECT * FROM events WHERE event_type = 'error')
      GROUP BY event_type)
    SELECT CAST(1 AS BIGINT) AS run, * FROM agg
    UNION ALL SELECT 2, * FROM agg
    UNION ALL SELECT 3, * FROM agg3
    """,
)
def maintenance_result_cache(spark, sf_dir):
    """Query-result cache keyed on an input-file fingerprint
    (io.py::cached_result): run 1 computes and fills, run 2 must HIT
    (asserted — zero scans, metadata stat only), and appending a file
    to the input table must MISS and recompute (asserted) — the
    Snowflake/Databricks result-cache contract of serve-while-
    unchanged, invalidate-on-any-change. All three runs' results are
    hash-checked, so a stale hit after the append would fail the gate."""
    import os
    import shutil

    from ..io import cached_result
    from ..streaming.pipeline import scratch_dir

    src = os.path.join(sf_dir, "events.parquet")
    tbl = scratch_dir("rcache_tbl")
    shutil.copyfile(src, os.path.join(tbl, "part-0.parquet"))
    cache = scratch_dir("rcache_store")

    def compute():
        return (
            spark.read.parquet(tbl)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
            )
        )

    r1, hit1 = cached_result(spark, [tbl], cache, compute)
    r1 = r1.select(F.lit(1).cast("bigint").alias("run"), "event_type", "n", "sum_cents")
    _, hit2 = cached_result(spark, [tbl], cache, compute)
    r2, _ = cached_result(spark, [tbl], cache, compute)
    r2 = r2.select(F.lit(2).cast("bigint").alias("run"), "event_type", "n", "sum_cents")
    assert not hit1 and hit2, (hit1, hit2)

    # append: the error slice lands as a second file → fingerprint miss
    spark.read.parquet(src).where(F.col("event_type") == "error").write.mode(
        "append"
    ).parquet(tbl)
    r3, hit3 = cached_result(spark, [tbl], cache, compute)
    assert not hit3
    r3 = r3.select(F.lit(3).cast("bigint").alias("run"), "event_type", "n", "sum_cents")
    return r1.unionAll(r2).unionAll(r3)


@query(
    "merge_on_read_delete",
    oracle="""
    WITH survivors AS (
      SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_id % 7 <> 0
    )
    SELECT 'mor' AS phase, event_id, event_type, cents FROM survivors
    UNION ALL
    SELECT 'applied', event_id, event_type, cents FROM survivors
    """,
)
def merge_on_read_delete(spark, sf_dir):
    """Merge-on-read DELETE (io.py::MergeOnReadTable — the Iceberg-v2
    equality-delete-file pattern): erasing keys writes an O(delta) key
    file, reads anti-join it, and the next compaction applies deletes
    and clears the files. The gate reads the table in BOTH phases —
    merge-on-read (delete files live) and post-apply (plain scan) —
    and both must equal the survivor set: a leaked deleted row, a lost
    survivor, or a stale read after apply all fail the hash. The
    delete-file count applied is asserted in-query."""
    import os

    from ..io import MergeOnReadTable
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t = MergeOnReadTable(spark, scratch_dir("mor_q"), "event_id")
    t.write(ev)
    # two erasure batches (GDPR requests arrive in waves)
    t.delete_keys(ev.where((F.col("event_id") % 7 == 0) & (F.col("event_id") % 2 == 0)))
    t.delete_keys(ev.where((F.col("event_id") % 7 == 0) & (F.col("event_id") % 2 == 1)))
    mor = t.read().select(
        F.lit("mor").alias("phase"), "event_id", "event_type", "cents"
    )
    # materialize the merge-on-read result BEFORE apply: its lazy plan
    # references the delete files that apply_deletes() removes
    mor = mor.localCheckpoint(eager=True)
    mor_rows = mor.count()
    stats = t.apply_deletes()
    assert stats["delete_files_applied"] >= 2, stats
    applied = t.read().select(
        F.lit("applied").alias("phase"), "event_id", "event_type", "cents"
    )
    assert not os.path.isdir(t.del_dir)
    assert applied.count() == mor_rows
    return mor.unionAll(applied)


@query(
    "maintenance_mv_rewrite",
    oracle="""
    WITH cents AS (
      SELECT event_type, user_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    q1 AS (
      SELECT event_type AS grp,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(c) AS DOUBLE) / 100.0 AS sum_value,
             CAST(SUM(c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_value
      FROM cents GROUP BY event_type),
    q2 AS (
      SELECT CAST(user_id % 10 AS VARCHAR) AS grp,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1)
    SELECT CAST(1 AS BIGINT) AS run, grp, n_rows, sum_value, avg_value FROM q1
    UNION ALL
    SELECT 2, grp, n_rows, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM q2
    """,
)
def maintenance_mv_rewrite(spark, sf_dir):
    """Materialized-view query rewrite + incremental maintenance
    (operators/mv.py): the MV keeps mergeable partial state per
    (event_type, day); history up to the cutoff is materialized once,
    the post-cutoff delta is merged in O(delta) (history never
    re-read). A dashboard query grouped by a SUBSET of the view keys
    with derivable aggregates (here avg — the not-self-maintainable
    case, derived as sum/count) is rewritten to scan ONLY the view's
    state files (asserted on inputFiles); a query grouped outside the
    view keys transparently falls back to the base scan (asserted).
    Both answers are hash-checked against the direct recompute — the
    rewrite must be semantically invisible. Replaces the reference's
    rebuild-gold-every-run consumers (dags/utils/etl.py:616-677) with
    the O(|groups|) read path that survives 100 TB."""
    from ..operators.mv import MaterializedView
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    cutoff = F.lit(CUTOFF).cast("timestamp")
    mv = MaterializedView(
        spark, scratch_dir("mv_root"), ["event_type", "day"], "value"
    )
    mv.refresh_full(ev.where(F.col("ts") <= cutoff))
    mv.refresh_incremental(ev.where(F.col("ts") > cutoff))

    q1, used1 = mv.answer(["event_type"], ["count", "sum", "avg"])
    assert used1
    files = q1.inputFiles()
    assert files and all(mv.state_path in f for f in files), files[:3]

    base = ev.withColumn("bucket", (F.col("user_id") % 10).cast("string"))
    q2, used2 = mv.answer(["bucket"], ["count"], base=base)
    assert not used2
    assert any("events" in f for f in q2.inputFiles())

    one = q1.select(
        F.lit(1).cast("bigint").alias("run"),
        F.col("event_type").alias("grp"),
        "n_rows", "sum_value", "avg_value",
    )
    two = q2.select(
        F.lit(2).cast("bigint").alias("run"),
        F.col("bucket").alias("grp"),
        "n_rows",
        F.lit(None).cast("double").alias("sum_value"),
        F.lit(None).cast("double").alias("avg_value"),
    )
    return one.unionAll(two)


@query(
    "maintenance_analyze_cbo",
    oracle="""
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name
    """,
)
def maintenance_analyze_cbo(spark, sf_dir):
    """ANALYZE TABLE statistics + cost-based optimization wiring: the
    star join is registered as catalog tables (external, CTAS LOCATION
    — no warehouse dir dependency), column/table stats are computed
    (`ANALYZE ... COMPUTE STATISTICS FOR ALL COLUMNS`), CBO and
    stats-driven join reorder are enabled, and the optimized plan is
    asserted to carry a cardinality estimate (stats().rowCount()
    defined — absent in size-only mode). This is the planner leg the
    file-skipping work (scan_clustered_skip, footer stats) doesn't
    cover: at 100 TB accurate row counts and NDVs are what let the
    optimizer pick broadcast sides, reorder a star join
    smallest-first, and budget shuffle partitions. The revenue rollup
    over the analyzed tables is hash-checked, so the stats path can't
    silently change semantics."""
    from ..streaming.pipeline import fresh_name, scratch_dir

    names = {}
    for t in ("orders", "customer", "nation", "region"):
        nm = fresh_name(f"cbo_{t}")
        loc = scratch_dir(f"cbo_loc_{t}")
        table(spark, sf_dir, t).write.mode("overwrite").parquet(loc)
        spark.sql(f"CREATE TABLE {nm} USING parquet LOCATION '{loc}'")
        spark.sql(f"ANALYZE TABLE {nm} COMPUTE STATISTICS FOR ALL COLUMNS")
        names[t] = nm
    # restore the CALLER's conf values, not hardcoded 'false' — a session
    # that deliberately enabled CBO must not come out of this query with
    # it silently disabled
    prior = {
        k: spark.conf.get(k)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        df = spark.sql(
            f"""
            SELECT r_name,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM {names["orders"]} o
            JOIN {names["customer"]} c ON o.o_custkey = c.c_custkey
            JOIN {names["nation"]} n ON c.c_nationkey = n.n_nationkey
            JOIN {names["region"]} r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name
            """
        )
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), "CBO stats missing from plan"
        df = df.localCheckpoint(eager=True)  # pin rows before confs reset
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)
        # drop the per-run catalog entries (external tables: metadata
        # only, the scratch parquet stays for the checkpointed read) —
        # repeated runs must not leak cbo_* tables into the catalog
        for nm in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {nm}")
    return df


@query(
    "maintenance_wap",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    """,
)
def maintenance_wap(spark, sf_dir):
    """Write-Audit-Publish (io.py::SnapshotLog.fast_forward): deltas
    land on a zero-copy BRANCH (clone), a DQ audit runs against the
    branch's full view, and only a passing audit publishes — one
    manifest fast-forward, no data copied; a failing audit leaves the
    branch stranded and main's readers never see a byte of it (both
    arms asserted in-query, final table hash-checked). This is the
    quarantine pattern (dq_quarantine) lifted from row level to
    COMMIT level — the production shape for 'don't let a bad load
    into the table a 1000-dashboard fleet reads'. The reference's
    all-or-nothing Airflow retry (dags/etl/run_etl.py:22) approximates
    this with task boundaries; WAP gives the same guarantee inside
    the table format."""
    from ..io import SnapshotLog
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cutoff_ids = ev.where(
        F.col("event_id") % 4 != 0
    )  # "history" already in main
    delta_good = ev.where(F.col("event_id") % 4 == 0)
    delta_bad = delta_good.withColumn(
        "event_type",
        F.when(F.col("event_id") % 8 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )

    def audit(df):
        return df.where(F.col("event_type").isNull()).count() == 0

    main = SnapshotLog(spark, scratch_dir("wap_main"))
    main.commit(cutoff_ids)

    # arm 1: good delta → branch, audit passes, fast-forward publishes
    b1 = main.clone(scratch_dir("wap_b1"))
    b1.commit(delta_good, mode="append")
    assert audit(b1.read())
    main.fast_forward(b1)
    assert main.read().count() == ev.count()

    # arm 2: corrupted delta → audit fails → never published
    b2 = main.clone(scratch_dir("wap_b2"))
    b2.commit(delta_bad, mode="append")
    assert not audit(b2.read())
    # no fast_forward: main must be byte-identical to the good publish
    assert main.read().count() == ev.count()
    assert main.read().where(F.col("event_type").isNull()).count() == 0

    return main.read()


@query(
    "maintenance_repair",
    oracle="""
    SELECT event_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           event_type
    FROM events
    """,
)
def maintenance_repair(spark, sf_dir):
    """Anti-entropy replica repair (operators/diff.py::repair_replica):
    a replica that diverged from the authority — 1/13 of rows missing,
    1/7 with corrupted values, plus phantom rows the authority never
    had — is converged by diff→patch, touching ONLY divergent keys
    (the convergence move of a cross-region sync / disaster-recovery
    backfill, built on table_diff's classification). Asserted
    in-query: the re-diff after repair is EMPTY (fixed point), and the
    repaired table hash-matches the authority bit-for-bit."""
    from ..operators.diff import repair_replica, snapshot_diff

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_type",
    )
    phantom = ev.where(F.col("event_id") % 17 == 0).select(
        (F.col("event_id") + 1000000).alias("event_id"), "cents", "event_type"
    )
    replica = (
        ev.where(F.col("event_id") % 13 != 0)  # lost rows
        .select(
            "event_id",
            F.when(F.col("event_id") % 7 == 0, F.col("cents") + 1)
            .otherwise(F.col("cents"))
            .alias("cents"),  # corrupted values
            "event_type",
        )
        .unionByName(phantom)  # rows the authority never had
    )
    repaired, diff = repair_replica(
        ev, replica, keys=["event_id"], compare_cols=["cents", "event_type"]
    )
    assert diff.count() > 0
    rediff = snapshot_diff(
        repaired, ev, keys=["event_id"], compare_cols=["cents", "event_type"]
    )
    assert rediff.count() == 0  # repair is a fixed point
    return repaired


@query(
    "maintenance_lifecycle",
    oracle="""
    SELECT 'mv' AS section, event_type AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'lookup', CAST(event_id AS VARCHAR), CAST(1 AS BIGINT),
           CAST(round(value * 100) AS BIGINT)
    FROM events WHERE event_id = 42
    """,
)
def maintenance_lifecycle(spark, sf_dir):
    """Lakehouse-lifecycle capstone — the round-7 primitives composed
    as one pipeline, every seam hash-gated: history lands on a
    SnapshotLog, the delta goes through WRITE-AUDIT-PUBLISH (branch +
    fast-forward; audit asserted), the published snapshot is laid out
    with HIDDEN PARTITIONING (days(ts)), a MATERIALIZED VIEW is
    refreshed from it and the dashboard rollup is answered by QUERY
    REWRITE (state files only, asserted), and a point lookup goes
    through the file-level BLOOM INDEX (pruned, asserted). One
    authority (the raw events), five engine features, one oracle."""
    from ..io import SnapshotLog
    from ..operators.bloom_index import bloom_point_lookup, build_bloom_index
    from ..operators.hidden_partition import HiddenPartitionTable
    from ..operators.mv import MaterializedView
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    cutoff = F.lit(CUTOFF).cast("timestamp")

    # 1. history + write-audit-publish of the delta
    main = SnapshotLog(spark, scratch_dir("lc_main"))
    main.commit(ev.where(F.col("ts") <= cutoff))
    branch = main.clone(scratch_dir("lc_branch"))
    branch.commit(ev.where(F.col("ts") > cutoff), mode="append")
    assert branch.read().where(F.col("event_id").isNull()).count() == 0
    main.fast_forward(branch)
    published = main.read()

    # 2. hidden-partitioned serving layout
    hp = HiddenPartitionTable(
        spark, scratch_dir("lc_hp"), [{"kind": "days", "col": "ts"}]
    )
    hp.write(published)

    # 3. materialized view + rewrite
    mv = MaterializedView(
        spark,
        scratch_dir("lc_mv"),
        ["event_type"],
        "value",
    )
    mv.refresh_full(hp.scan([]))
    rollup, used = mv.answer(["event_type"], ["count", "sum"])
    assert used and all(mv.state_path in f for f in rollup.inputFiles())
    mv_rows = rollup.select(
        F.lit("mv").alias("section"),
        F.col("event_type").alias("grp"),
        "n_rows",
        F.round(F.col("sum_value") * 100).cast("bigint").alias("val"),
    )

    # 4. bloom-indexed point lookup on the serving files
    idx = scratch_dir("lc_bloom")
    build_bloom_index(spark, hp.data, "event_id", idx)
    hit, n_read, n_total = bloom_point_lookup(
        spark, hp.data, idx, "event_id", 42
    )
    assert 1 <= n_read < n_total, (n_read, n_total)
    lk_rows = hit.select(
        F.lit("lookup").alias("section"),
        F.col("event_id").cast("string").alias("grp"),
        F.lit(1).cast("bigint").alias("n_rows"),
        F.round(F.col("value") * 100).cast("bigint").alias("val"),
    )
    return mv_rows.unionAll(lk_rows)
