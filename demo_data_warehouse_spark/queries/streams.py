"""Streaming driver queries (SURVEY §2.9 ST1-ST5 + event-time extensions).

These run real Structured Streaming plans drained with
trigger(availableNow=True), so the driver's batch-oriented correctness
gate can hash-compare their (finite, deterministic) results against
DuckDB oracles — the strongest check available for streaming operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..io import Warehouse
from ..streaming.pipeline import (
    fresh_name,
    merge_batch_sink,
    partition_replace_sink,
    read_landing_stream,
    rollup_merge_sink,
    run_available_now,
    scratch_dir,
    stateful_user_progress,
    tumbling_agg,
)
from . import query


def _write_batched_landing(tagged, prefix, n_batches=3):
    """Write a `batch`-tagged frame as one parquet file per batch with
    strictly increasing mtimes, so a file-source stream under
    maxFilesPerTrigger=1 processes the batches in deterministic order —
    the harness every multi-batch streaming-semantics query shares."""
    import os
    import shutil

    landing = scratch_dir(prefix)
    t0 = 1_700_000_000
    for i in range(n_batches):
        tmp = scratch_dir(f"{prefix}_tmp{i}")
        tagged.where(F.col("batch") == i).drop("batch").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = os.path.join(landing, f"b{i}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + 60 * i, t0 + 60 * i))
        shutil.rmtree(tmp, ignore_errors=True)
    return landing


def _events_stream(spark, sf_dir):
    """readStream over events.parquet, normalizing the TIMESTAMP(NANOS)
    ts column exactly like catalog.table does for batch reads."""
    # file-stream sources require a directory basePath: stream the sf
    # dir with a glob pinning the one table file
    stream = read_landing_stream(
        spark, sf_dir, fmt="parquet", pathGlobFilter="events.parquet"
    )
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # event-time watermarks require TIMESTAMP; session tz is UTC so
        # the cast is value-identical (same rule as catalog.table —
        # spelled timestamp_ltz so an NTZ-preferring timestampType conf
        # cannot turn it into a no-op)
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return stream


@query(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling(spark, sf_dir):
    """ST1 + watermarked tumbling window, executed as a real stream
    (readStream → withWatermark → window agg → availableNow drain).

    Complete output mode so the finite run emits every window (append
    mode holds windows the watermark has not passed; production sinks
    use update/append + foreachBatch)."""
    agg = tumbling_agg(_events_stream(spark, sf_dir))
    sink = fresh_name("stream_tumbling")
    run_available_now(agg, memory_table=sink, output_mode="complete")
    return spark.table(sink).select("win_start", "event_type", "sum_value", "n")


@query(
    "stream_merge_upsert",
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
def stream_merge_upsert(spark, sf_dir):
    """ST5: streaming MERGE — micro-batches foreachBatch-merged into a
    warehouse table (reference dags/utils/common/data_helper.py:76-106
    as a streaming sink). Target pre-seeded batch-side; the source
    stream upserts over it; result read back from the warehouse."""
    ev = table(spark, sf_dir, "events")
    wh = Warehouse(spark, scratch_dir("stream_merge"))
    target = ev.where("event_id % 10 < 8").select("event_id", "user_id", "value")
    wh.merge_write(
        target, "silver", "events_upsert", ["event_id"], "2024-01-01",
        schema=target.schema,
    )

    src = (
        _events_stream(spark, sf_dir)
        .where("event_id % 10 >= 6")
        .select("event_id", "user_id", (F.col("value") * 2).alias("value"))
    )
    run_available_now(
        src,
        batch_fn=merge_batch_sink(wh, "silver", "events_upsert", ["event_id"], "2024-01-01"),
        output_mode="append",
    )
    return wh.read("silver", "events_upsert").select("event_id", "user_id", "value")


@query(
    "stream_incremental_rollup",
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
def stream_incremental_rollup(spark, sf_dir):
    """Streaming materialized-view maintenance: micro-batches are
    partially aggregated and state-merged into a stored gold rollup
    (foreachBatch → rollup_merge_sink, exactly-once via a batch-id
    marker committed atomically with the state swap). After the drain,
    finalizing the state equals the full batch recompute — the same
    oracle as agg_incremental, now maintained by a stream."""
    from ..operators.incremental import finalize_rollup

    wh = Warehouse(spark, scratch_dir("stream_rollup"))
    src = _events_stream(spark, sf_dir).select("event_type", "value")
    run_available_now(
        src,
        batch_fn=rollup_merge_sink(wh, "gold", "events_rollup", ["event_type"], "value"),
        output_mode="append",
    )
    return finalize_rollup(wh.read("gold", "events_rollup"), ["event_type"])


@query(
    "stream_sliding",
    oracle="""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS win_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value FROM events
    )
    SELECT win_start,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM expanded GROUP BY win_start
    """,
)
def stream_sliding(spark, sf_dir):
    """Sliding event-time windows (1h/30m) as a real stream — every
    event lands in two overlapping windows; state per (window) group,
    complete-mode drain. Same oracle as the batch agg_sliding (the two
    forms must agree exactly)."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("win_start"), "sum_value", "n")
    )
    sink = fresh_name("stream_sliding")
    run_available_now(agg, memory_table=sink, output_mode="complete")
    return spark.table(sink)


@query(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY user_id, event_type
    """,
)
def stream_dedup(spark, sf_dir):
    """Streaming exactly-once dedup: dropDuplicates over an unbounded
    key set, state in the checkpoint store — the streaming form of the
    training pipeline's exact dedup (first-seen wins across
    micro-batches). Distinct (user_id, event_type) pairs counted after
    a finite drain; every n must be 1 by construction."""
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type")
    deduped = ev.dropDuplicates(["user_id", "event_type"])
    sink = fresh_name("stream_dedup")
    run_available_now(deduped, memory_table=sink, output_mode="append")
    return (
        spark.table(sink)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "stream_partition_replace",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
    """,
)
def stream_partition_replace(spark, sf_dir):
    """ST4 as a stream: micro-batches published through the idempotent
    dynamic-partition-overwrite sink (foreachBatch → Warehouse), then
    read back from the warehouse. Replaying a batch overwrites its
    partition exactly — the reference's WRITE_TRUNCATE partition
    decorator semantics (dags/utils/common/data_helper.py:61-74)."""
    wh = Warehouse(spark, scratch_dir("stream_pr"))
    src = (
        _events_stream(spark, sf_dir)
        .where("event_type = 'purchase'")
        .select("event_id", "user_id", "event_type")
    )
    run_available_now(
        src,
        batch_fn=partition_replace_sink(wh, "bronze", "purchases", "2024-01-01"),
        output_mode="append",
    )
    return wh.read("bronze", "purchases").select("event_id", "user_id", "event_type")


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS sess_start,
           MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session(spark, sf_dir):
    """Streaming session windows: session_window + watermark executed as
    a real stream (state merges sessions across micro-batches, closed
    sessions emitted once the watermark passes). Finite drain in
    complete mode → deterministic, hash-matched against the same batch
    oracle as agg_session."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "sum_value",
            "n",
        )
    )
    sink = fresh_name("stream_session")
    run_available_now(agg, memory_table=sink, output_mode="complete")
    return spark.table(sink)


@query(
    "stream_stateful",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_stateful(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running count + latest event time across micro-batches.
    After a finite availableNow drain the newest emission per key equals
    the batch aggregate — counts/timestamps are exact under any batch
    split, so this streams yet still hash-matches a SQL oracle."""
    out = stateful_user_progress(_events_stream(spark, sf_dir))
    sink = fresh_name("stream_stateful")
    run_available_now(out, memory_table=sink, output_mode="update")
    # update mode appends one row per key per batch; the final state per
    # key is the row with the highest running count
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("last_ts").alias("last_ts"))
    )


@query(
    "agg_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS sess_start,
           MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def agg_session(spark, sf_dir):
    """Event-time sessionization with a 30-minute inactivity gap —
    native session_window (JVM-side state merge, no UDF), the batch
    form of the streaming session operator. A new session starts when
    an event arrives >= gap after the previous one (Spark merges
    sessions whose [ts, ts+gap) intervals overlap)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "sum_value",
            "n",
        )
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join: click→purchase
    attribution within 30 minutes, both sides real readStream sources.

    The time-range condition + watermarks bound the join state: Spark
    keeps only the last watermark-delay's worth of each side instead of
    the full history — the property that makes a stream-stream join
    runnable forever at 100 TB/day. Inner-join matches are emitted
    deterministically (append mode), so the finite availableNow drain
    hash-compares against the batch oracle."""
    clicks = (
        _events_stream(spark, sf_dir)
        .where("event_type = 'click'")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    buys = (
        _events_stream(spark, sf_dir)
        .where("event_type = 'purchase'")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("buy_user"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "1 hour")
    )
    j = clicks.join(
        buys,
        (F.col("user_id") == F.col("buy_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = j.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("buy_ts") - F.unix_timestamp("click_ts"))
        .cast("bigint")
        .alias("lag_s"),
    )
    sink = fresh_name("stream_ssj")
    run_available_now(out, memory_table=sink, output_mode="append")
    return spark.table(sink)


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment,
           CAST(round(e.value * 100) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static enrichment: the event stream joined to a batch
    dimension. Stateless (no watermark, no join state — each micro-
    batch joins against the current dim snapshot) and the dim side is
    broadcast, so the stream is never shuffled — the canonical
    dimension-enrichment topology at any scale."""
    ev = _events_stream(spark, sf_dir)
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    out = ev.join(F.broadcast(dim), ev["user_id"] == dim["c_custkey"]).select(
        "event_id",
        "user_id",
        "c_mktsegment",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    sink = fresh_name("stream_enrich")
    run_available_now(out, memory_table=sink, output_mode="append")
    return spark.table(sink)


@query(
    "stream_late_data",
    oracle="""
    WITH batched AS (
      SELECT event_id, ts, value,
             CASE WHEN event_id % 97 = 0 THEN 2 ELSE b0 END AS batch
      FROM (
        SELECT *,
               LEAST(CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                                / 86400000000) AS BIGINT) // 10, 2) AS b0
        FROM events
      )
    ), wm AS (
      -- Spark >= 3.4 splits the watermark: LATE-EVENT filtering in batch
      -- N uses the watermark published for batch N-1 (data through
      -- N-2); EVICTION/emission uses the batch-N watermark (data
      -- through N-1). Hence 2 PRECEDING here, and emission is checked
      -- against the final watermark below.
      SELECT batch,
             MAX(bts) OVER (ORDER BY batch
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
               - INTERVAL 1 HOUR AS w
      FROM (SELECT batch, MAX(ts) AS bts FROM batched GROUP BY batch)
    ), kept AS (
      SELECT t.value, date_trunc('hour', t.ts) AS ws
      FROM batched t JOIN wm ON t.batch = wm.batch
      WHERE wm.w IS NULL OR date_trunc('hour', t.ts) + INTERVAL 1 HOUR > wm.w
    )
    SELECT ws AS win_start,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM kept
    WHERE ws + INTERVAL 1 HOUR
            <= (SELECT MAX(ts) FROM batched) - INTERVAL 1 HOUR
    GROUP BY ws
    """,
)
def stream_late_data(spark, sf_dir):
    """ST3 done honestly: append-mode watermark semantics — late rows
    DROPPED, open windows WITHHELD — verified against a SQL replay of
    the micro-batch schedule.

    The event month is split into three files (ts-thirds by day, with
    every 97th event diverted to the LAST file as a straggler), written
    with strictly increasing mtimes so the file source processes them
    in order under maxFilesPerTrigger=1. Spark then applies the real
    rules — including the SPARK-40925 split verified empirically here:
    late-event filtering in batch N uses the watermark PUBLISHED FOR
    batch N-1 (max event time through batch N-2, minus delay), while
    eviction/emission uses batch N's own watermark (through N-1). So a
    day-3 straggler arriving in batch 2 is dropped (its window end is
    behind max(batch 0) - 1h), while one arriving in batch 1 is still
    admitted; windows newer than final-max - delay never appear at all
    (append mode withholds open windows). The oracle replays exactly
    that schedule in SQL — the lagged late-watermark via a 2-PRECEDING
    running max — a bit-for-bit check of streaming semantics, not a
    rows-only smoke.

    Scale: state is bounded by the watermark horizon (windows older
    than W are evicted on emit), so a 100 TB backlog drains in bounded
    memory; the straggler pattern is the real-world shape (mostly
    ordered, sparse stragglers) that makes watermark tuning matter."""
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "value")
    base_us = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    day = ((F.unix_micros("ts") - base_us) / F.lit(86400000000)).cast("bigint")
    b0 = F.least(F.floor(day / 10).cast("bigint"), F.lit(2))
    batch = F.when(F.col("event_id") % 97 == 0, F.lit(2)).otherwise(b0)
    landing = _write_batched_landing(ev.withColumn("batch", batch), "late_landing")

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("win_start"), "sum_value", "n")
    )
    sink = fresh_name("stream_late")
    run_available_now(agg, memory_table=sink, output_mode="append")
    return spark.table(sink)


@query(
    "stream_stream_outer_join",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT event_id AS purchase_id, user_id, ts AS buy_ts
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT c.click_id, p.purchase_id, c.user_id,
             CAST(date_diff('second', c.click_ts, p.buy_ts) AS BIGINT) AS lag_s
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.buy_ts >= c.click_ts
       AND p.buy_ts <= c.click_ts + INTERVAL 30 MINUTE
    ), w AS (
      SELECT LEAST((SELECT MAX(click_ts) FROM c), (SELECT MAX(buy_ts) FROM p))
               - INTERVAL 1 HOUR AS wm
    )
    SELECT click_id, purchase_id, user_id, lag_s FROM m
    UNION ALL
    SELECT c.click_id, NULL AS purchase_id, c.user_id, CAST(NULL AS BIGINT) AS lag_s
    FROM c, w
    WHERE c.click_ts + INTERVAL 30 MINUTE < w.wm
      AND NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = c.user_id
          AND p.buy_ts >= c.click_ts
          AND p.buy_ts <= c.click_ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_stream_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join — the semantics inner
    joins hide: a null-padded left row may only emit once the state
    watermark PROVES no future right row can match (click_ts + 30min
    behind the global watermark, which under the default min policy is
    the LEAST of the two sides' max event times minus delay). Clicks
    younger than that horizon at end-of-stream never emit their null —
    withholding is correct, not missing data. The oracle replays
    exactly that rule: inner matches ∪ null rows for match-less clicks
    whose window is fully closed by the final watermark (emitted by the
    terminal no-data batch). State stays watermark-bounded on both
    sides — the 100 TB/day property."""
    clicks = (
        _events_stream(spark, sf_dir)
        .where("event_type = 'click'")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    buys = (
        _events_stream(spark, sf_dir)
        .where("event_type = 'purchase'")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("buy_user"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "1 hour")
    )
    j = clicks.join(
        buys,
        (F.col("user_id") == F.col("buy_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    out = j.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("buy_ts") - F.unix_timestamp("click_ts"))
        .cast("bigint")
        .alias("lag_s"),
    )
    sink = fresh_name("stream_ssoj")
    run_available_now(out, memory_table=sink, output_mode="append")
    return spark.table(sink)


@query(
    "stream_topk_windowed",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS win_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY date_trunc('hour', ts), event_type
    ), ranked AS (
      SELECT win_start, event_type, n,
             CAST(row_number() OVER (
               PARTITION BY win_start ORDER BY n DESC, event_type) AS BIGINT) AS rk
      FROM counts
    )
    SELECT win_start, event_type, n, rk FROM ranked WHERE rk <= 3
    """,
)
def stream_topk_windowed(spark, sf_dir):
    """Trending-items query: top-3 event types per hourly window, the
    stream half computed as a REAL watermarked streaming aggregation
    (readStream → window count → availableNow drain). Ranking is not
    expressible inside an incremental streaming plan (a late row can
    demote an already-emitted rank), so the rank runs as a tiny batch
    window over the drained per-window counts — the
    stream-aggregates / batch-serves split every production leaderboard
    uses (foreachBatch would do the same per micro-batch). The heavy
    data only ever flows through the streaming count; the ranked set is
    |windows|×|types|."""
    from pyspark.sql import Window

    ev = _events_stream(spark, sf_dir)
    counts = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )
    sink = fresh_name("stream_topk")
    run_available_now(counts, memory_table=sink, output_mode="complete")
    w = Window.partitionBy("win_start").orderBy(F.desc("n"), "event_type")
    return (
        spark.table(sink)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select("win_start", "event_type", "n", "rk")
    )


@query(
    "stream_cdc_apply",
    oracle="""
    WITH target AS (
      SELECT user_id, CAST(event_id AS BIGINT) AS seq, 'U' AS op, cents FROM (
        SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 3 = 0
      ) t WHERE rn = 1
    ), feed AS (
      SELECT user_id, CAST(event_id AS BIGINT) AS seq,
             CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_id % 3 <> 0
    ), resolved AS (
      SELECT user_id, seq, op, cents FROM (
        SELECT u.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
        FROM (SELECT * FROM target UNION ALL SELECT * FROM feed) u
      ) x WHERE rn = 1
    )
    SELECT user_id, seq, cents FROM resolved WHERE op <> 'D'
    """,
)
def stream_cdc_apply(spark, sf_dir):
    """Streaming CDC with tombstones — the convergent form of
    merge_cdc_apply: the feed arrives as micro-batches that are NOT
    seq-ordered (batched by event_id % 3 here, deliberately), and each
    batch folds into a tombstone-retaining state table via
    operators/merge.py::apply_changes_versioned — a commutative
    idempotent per-key max, so any batching reaches the same state
    (property-tested over random batchings). Every micro-batch commits
    the new state as a SnapshotLog version: a crash between batches
    leaves the previous committed snapshot readable (exactly-once
    publish), and the state history is time-travelable. The result is
    the live view (tombstones filtered); the oracle resolves the whole
    feed at once."""
    from pyspark.sql import Window

    from ..io import SnapshotLog
    from ..operators.merge import apply_changes_versioned, cdc_current
    from ..streaming.pipeline import run_available_now, scratch_dir

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    target = (
        ev.where(F.col("event_id") % 3 == 0)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "user_id",
            F.col("event_id").cast("bigint").alias("seq"),
            F.lit("U").alias("op"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    log = SnapshotLog(spark, scratch_dir("stream_cdc"))
    log.commit(target)

    feed = ev.where(F.col("event_id") % 3 != 0).select(
        "user_id",
        F.col("event_id").cast("bigint").alias("seq"),
        F.when(F.col("event_id") % 11 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.col("event_id") % 3).alias("batch"),
    )
    landing = _write_batched_landing(feed.where("batch > 0").withColumn("batch", F.col("batch") - 1), "cdc_feed", n_batches=2)
    stream = spark.readStream.schema(
        "user_id bigint, seq bigint, op string, cents bigint"
    ).option("maxFilesPerTrigger", 1).parquet(landing)

    def fold(batch_df, batch_id):
        new_state = apply_changes_versioned(
            log.read(), batch_df, keys=["user_id"], seq_col="seq", op_col="op"
        )
        log.commit(new_state)

    run_available_now(stream, batch_fn=fold, output_mode="update")
    return cdc_current(log.read(), op_col="op").select("user_id", "seq", "cents")


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT user_id, event_type FROM events GROUP BY user_id, event_type
    """,
)
def stream_dedup_watermark(spark, sf_dir):
    """Bounded-state streaming dedup: dropDuplicatesWithinWatermark
    keeps a key's state only until the watermark passes it — the
    100 TB-viable variant of stream_dedup, whose dropDuplicates state
    grows with the UNBOUNDED distinct-key count forever. Here the
    45-day delay covers the whole 30-day event span, so within-horizon
    dedup equals global dedup and the exact distinct-pairs oracle
    applies; in production the horizon is the dedup contract (a key
    re-appearing after the window is a new row) and state stays
    O(keys-per-window). Only the key columns are emitted — which
    duplicate survives is arrival-order-dependent, the keys are not."""
    ev = (
        _events_stream(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", "45 days")
    )
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    sink = fresh_name("stream_dedup_wm")
    run_available_now(deduped, memory_table=sink, output_mode="append")
    return spark.table(sink)


@query(
    "stream_python_datasource",
    oracle="""
    SELECT record_id,
           CAST(record_id // 20 AS BIGINT) AS page_id,
           CASE record_id % 3 WHEN 0 THEN 'active' WHEN 1 THEN 'inactive'
                ELSE 'pending' END AS status,
           CAST((record_id * 2654435761) % 100000 AS BIGINT) AS amount_cents
    FROM range(0, 120) t(record_id)
    """,
)
def stream_python_datasource(spark, sf_dir):
    """The reference's 5-minute incremental API pull as a REAL streaming
    source (lark/pydatasource.py::PagedApiStreamingDataSource): the page
    cursor is the stream offset, persisted in the checkpoint — each
    drain advances it, and every restart resumes exactly where the last
    stopped (the Airflow-Variable watermark of
    dags/ingestion/lark_to_gcs.py:43-70, made crash-safe and
    exactly-once by Spark's offset log instead of a hand-rolled state
    doc). Three restarts × one 2-page batch each drain pages 0-5 into a
    parquet sink; the oracle replays the page arithmetic — duplicate or
    skipped pages after any restart break the hash."""
    from ..lark.pydatasource import PagedApiStreamingDataSource

    spark.dataSource.register(PagedApiStreamingDataSource)
    ckpt = scratch_dir("pyds_stream_ckpt")
    out = scratch_dir("pyds_stream_out")
    for _ in range(3):
        df = (
            spark.readStream.format("paged_api_stream")
            .option("n_pages", 10)
            .option("page_size", 20)
            .option("pages_per_batch", 2)
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out)


@query(
    "stream_transaction",
    oracle="""
    SELECT 'stored' AS src, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'derived', event_type, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY event_type
    """,
)
def stream_transaction(spark, sf_dir):
    """Exactly-once multi-sink streaming fan-out: every micro-batch
    commits the RAW delta (append-by-reference) and the refreshed
    AGGREGATE under ONE TransactionLog manifest, with the batch_id in
    the manifest meta making replays idempotent (a replayed foreachBatch
    sees batch_id ≤ committed and skips). After a 3-batch drain the
    stored aggregate must equal the aggregate derived from the stored
    raw — both are emitted and hash-checked against the source, so a
    torn raw/agg publish, a lost batch, or a double-applied replay all
    fail the gate. This is the multi-sink upgrade of
    stream_incremental_rollup's single-table marker."""
    from ..io import TransactionLog

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.col("event_id") % 3).alias("batch"),
    )
    landing = _write_batched_landing(ev, "stream_txn", n_batches=3)
    txn = TransactionLog(spark, scratch_dir("stream_txn_log"))

    def batch_fn(batch_df, batch_id):
        last = txn.latest_meta().get("batch_id")
        if last is not None and batch_id <= last:
            return  # replayed batch — already committed atomically
        batch_df.persist()
        try:
            if txn.versions():
                raw = txn.read("raw").unionByName(batch_df)
            else:
                raw = batch_df
            agg = raw.groupBy("event_type").agg(
                F.count("*").alias("n"), F.sum("cents").alias("sum_cents")
            )
            txn.commit(
                {"raw": batch_df, "agg": agg},
                append={"raw"},
                meta={"batch_id": batch_id},
            )
        finally:
            batch_df.unpersist()

    stream = read_landing_stream(
        spark, landing, fmt="parquet", maxFilesPerTrigger="1",
        schema="event_id bigint, event_type string, cents bigint",
    )
    run_available_now(stream, batch_fn=batch_fn, output_mode="append")
    # replay the LAST batch deliberately: the idempotence guard must
    # no-op (a second apply would double the tail batch in raw)
    batch_fn(stream.sparkSession.read.parquet(landing + "/b2.parquet"), 2)

    stored = txn.read("agg").select(
        F.lit("stored").alias("src"), "event_type", "n", "sum_cents"
    )
    derived = (
        txn.read("raw")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("sum_cents"))
        .select(F.lit("derived").alias("src"), "event_type", "n", "sum_cents")
    )
    return stored.unionAll(derived)


@query(
    "stream_snapshot_source",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS version, o_orderkey AS key,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 1, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 2, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 2
    """,
)
def stream_snapshot_source(spark, sf_dir):
    """The table format AS a streaming source (the Delta streaming-
    source analog, closing the loop: SnapshotLog already serves batch
    reads, time travel, CDF, clones — now downstream pipelines can
    SUBSCRIBE to it): commit version = stream offset, each commit's
    delta files = one micro-batch, checkpoint offset log = exactly-once
    across restarts (lark/pydatasource.py::
    SnapshotLogStreamingDataSource). Three append commits are drained
    across TWO checkpointed runs with a commit landing between them —
    every row must arrive exactly once with its version."""
    from ..io import SnapshotLog
    from ..lark.pydatasource import SnapshotLogStreamingDataSource

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    log = SnapshotLog(spark, scratch_dir("snapstream_q"))
    log.commit(o.where(F.col("key") % 3 == 0))
    log.commit(o.where(F.col("key") % 3 == 1), mode="append")

    spark.dataSource.register(SnapshotLogStreamingDataSource)
    ckpt = scratch_dir("snapstream_ckpt")
    out = scratch_dir("snapstream_out")

    def drain():
        q = (
            spark.readStream.format("snapshot_stream")
            .option("root", log.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # emits version 0
    drain()  # emits version 1
    log.commit(o.where(F.col("key") % 3 == 2), mode="append")
    drain()  # restart discovers version 2 — and must NOT re-emit 0/1
    return spark.read.parquet(out)


@query(
    "stream_python_sink",
    oracle="""
    SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    """,
)
def stream_python_sink(spark, sf_dir):
    """The STREAMING half of the pluggable sink surface
    (lark/pydatasource.py::JsonlStreamSinkWriter): readStream →
    writeStream.format("jsonl_sink") with availableNow drain. Each
    epoch commits under its batchId in the manifest; a replayed epoch
    (Structured Streaming's at-least-once execution) must commit as a
    no-op — exercised here by re-invoking commit for an
    already-committed batchId with freshly staged files and asserting
    nothing new became visible. The manifest-resolved read-back is
    hash-checked, so staging, per-epoch commit, idempotent replay, and
    JSON round-tripping are all under the oracle. Completes the DSv2
    matrix: batch/stream read (paged_api, snapshot_stream) and
    batch/stream write (jsonl_sink)."""
    import json
    import os

    from ..lark.pydatasource import (
        JsonlSinkDataSource,
        JsonlStreamSinkWriter,
        read_jsonl_sink,
    )
    from ..streaming.pipeline import scratch_dir

    spark.dataSource.register(JsonlSinkDataSource)
    out = scratch_dir("jsonl_stream_sink")
    ckpt = scratch_dir("jsonl_stream_ckpt")
    stream = _events_stream(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    with open(os.path.join(out, "_manifest.json")) as fh:
        state = json.load(fh)
    committed = list(state["batches"])
    n_files = len(state["files"])
    assert committed, state

    # simulate the replayed epoch: same batchId, fresh staged file
    w = JsonlStreamSinkWriter(out)
    staging = os.path.join(out, ".staging")
    os.makedirs(staging, exist_ok=True)
    ghost = os.path.join(staging, "replay-ghost.jsonl")
    with open(ghost, "w") as fh:
        fh.write('{"event_id": -1, "event_type": "ghost", "cents": 0}\n')

    class _Msg:
        staged = ghost
        rows = 1

    w.commit([_Msg()], committed[-1])
    with open(os.path.join(out, "_manifest.json")) as fh:
        after = json.load(fh)
    assert after["batches"] == committed and len(after["files"]) == n_files
    assert not os.path.exists(ghost)

    return read_jsonl_sink(
        spark, out, "event_id bigint, event_type string, cents bigint"
    )
