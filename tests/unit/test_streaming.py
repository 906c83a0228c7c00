"""Structured Streaming layer tests (SURVEY §2.9 ST1-ST5).

Prove the semantics the reference's cron loop provides — incremental
file pickup with durable offsets (the Airflow-Variable watermark
analog), micro-batch merge upsert, and watermarked window aggs — on a
real multi-batch stream, not just the availableNow single drain.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from demo_data_warehouse_spark.io import Warehouse
from demo_data_warehouse_spark.streaming.pipeline import (
    merge_batch_sink,
    read_landing_stream,
    run_available_now,
    tumbling_agg,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [Row(**r) for r in rows],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(path)


def _rows(*specs):
    return [
        dict(event_id=e, user_id=u, ts=__import__("datetime").datetime(2024, 1, 1, 10, m), value=v)
        for (e, u, m, v) in specs
    ]


def test_incremental_merge_with_checkpoint_resume(spark, tmp_path):
    """ST1+ST2+ST5: two landing files drain as micro-batches into a
    MERGE sink; a third file added later is picked up from the same
    checkpoint without reprocessing the first two (durable offsets =
    the reference's high-watermark, lark_to_gcs.py:43-70)."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    _write_batch(spark, landing, _rows((1, 1, 0, 1.0), (2, 2, 1, 2.0)))
    _write_batch(spark, landing, _rows((2, 2, 2, 20.0), (3, 3, 3, 3.0)))

    wh = Warehouse(spark, str(tmp_path / "wh"))
    schema = spark.read.parquet(landing).schema
    batches: list[int] = []

    def sink(batch, batch_id):
        batches.append(batch.count())
        merge_batch_sink(wh, "silver", "ev", ["event_id"], "2024-01-01")(batch, batch_id)

    stream = read_landing_stream(
        spark, landing, schema=schema, maxFilesPerTrigger=1
    )
    run_available_now(stream, batch_fn=sink, checkpoint=ckpt, output_mode="append")

    assert len(batches) == 2 and sum(batches) == 4
    got = {r["event_id"]: r["value"] for r in wh.read("silver", "ev").collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}

    # late third file: resume from the same checkpoint → only 1 batch more
    _write_batch(spark, landing, _rows((3, 3, 4, 30.0), (4, 4, 5, 4.0)))
    batches.clear()
    stream2 = read_landing_stream(spark, landing, schema=schema, maxFilesPerTrigger=1)
    run_available_now(stream2, batch_fn=sink, checkpoint=ckpt, output_mode="append")

    assert len(batches) == 1 and batches == [2]
    got = {r["event_id"]: r["value"] for r in wh.read("silver", "ev").collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 30.0, 4: 4.0}


def test_merge_sink_idempotent_replay(spark, tmp_path):
    """ST3/ST4: re-delivering the same micro-batch (checkpoint rollback
    replay) leaves the table unchanged — merge, not append."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [(1, 1, 5.0), (2, 2, 6.0)], "event_id bigint, user_id bigint, value double"
    )
    sink = merge_batch_sink(wh, "silver", "ev", ["event_id"], "2024-01-01")
    wh.merge_write(batch, "silver", "ev", ["event_id"], "2024-01-01", schema=batch.schema)
    sink(batch, 0)
    sink(batch, 0)  # replay
    assert wh.read("silver", "ev").count() == 2


def test_tumbling_agg_streaming_matches_batch(spark, tmp_path):
    """Watermarked streaming window agg over a finite landing dir equals
    the batch groupBy(window) result."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    rows = _rows((1, 1, 0, 1.0), (2, 1, 5, 2.0), (3, 2, 59, 4.0))
    _write_batch(spark, landing, rows)

    stream = read_landing_stream(spark, landing, schema=spark.read.parquet(landing).schema)
    agg = tumbling_agg(
        stream.withColumn("event_type", F.lit("t")),
        window="10 minutes",
        watermark="5 minutes",
    )
    run_available_now(agg, memory_table="tumbling_test", output_mode="complete")
    got = {
        (r["win_start"].minute, r["event_type"]): (r["sum_value"], r["n"])
        for r in spark.table("tumbling_test").collect()
    }
    assert got == {(0, "t"): (3.0, 2), (50, "t"): (4.0, 1)}


def test_stateful_operator_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: per-key running counts accumulate across
    micro-batches AND across a checkpoint stop/resume — the state store
    is the durable analog of the reference's warehouse-resident SCD2
    state (SURVEY ST5), with no read-back round trip."""
    from demo_data_warehouse_spark.streaming.pipeline import stateful_user_progress

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    _write_batch(spark, landing, _rows((1, 1, 0, 1.0), (2, 1, 1, 2.0), (3, 2, 2, 3.0)))

    schema = spark.read.parquet(landing).schema
    emitted: list = []

    def sink(batch, _bid):
        emitted.extend(batch.collect())

    out = stateful_user_progress(read_landing_stream(spark, landing, schema=schema))
    run_available_now(out, batch_fn=sink, checkpoint=ckpt, output_mode="update")
    got = {r.user_id: r.n_events for r in emitted}
    assert got == {1: 2, 2: 1}

    # one more file, same checkpoint: user 1 continues from n=2, not 0
    _write_batch(spark, landing, _rows((4, 1, 3, 4.0)))
    emitted.clear()
    out2 = stateful_user_progress(read_landing_stream(spark, landing, schema=schema))
    run_available_now(out2, batch_fn=sink, checkpoint=ckpt, output_mode="update")
    got2 = {r.user_id: (r.n_events, r.last_ts.minute) for r in emitted}
    assert got2 == {1: (3, 3)}  # only the updated key re-emits; count resumed


def test_stream_requires_schema_or_inference(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _write_batch(spark, landing, _rows((1, 1, 0, 1.0)))
    s = read_landing_stream(spark, landing)  # schema inferred via batch read
    assert s.isStreaming
    assert dict(s.dtypes)["value"] == "double"


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """ST3's limit, made explicit: once the watermark passes a window,
    a late row for that window is DROPPED (not merged) — the streaming
    trade-off vs the reference's same-day replay re-read. Two files →
    two micro-batches (maxFilesPerTrigger=1); batch 1 closes the 10:00
    window by advancing the watermark 2h; batch 2's late 10:10 row must
    not reopen it."""
    import datetime as dt

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def rows_at(*specs):
        return [
            dict(event_id=e, user_id=1, ts=dt.datetime(2024, 1, 1, h, m), value=v)
            for (e, h, m, v) in specs
        ]

    # run 1: one row in the 10:00 window + one at 13:00 pushing the
    # 1h watermark to 12:00 (past the 10:00-11:00 window end); the
    # watermark is persisted in the checkpoint
    _write_batch(spark, landing, rows_at((1, 10, 5, 1.0), (2, 13, 0, 8.0)))

    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple] = []

    def collect(batch, _bid):
        emitted.extend(
            (r["win_start"].hour, r["n"], r["sum_value"]) for r in batch.collect()
        )

    schema = spark.read.parquet(landing).schema

    def drain():
        stream = read_landing_stream(spark, landing, schema=schema)
        agg = tumbling_agg(
            stream.withColumn("event_type", F.lit("t")),
            window="1 hour",
            watermark="1 hour",
        )
        run_available_now(agg, batch_fn=collect, checkpoint=ckpt, output_mode="append")

    drain()
    # run 2 (same checkpoint → watermark restored at 12:00): a LATE row
    # for the already-closed 10:00 window
    _write_batch(spark, landing, rows_at((3, 10, 10, 99.0)))
    drain()

    got = set(emitted)
    # the 10:00 window was emitted with ONLY the on-time row; the late
    # 99.0 never appears anywhere
    assert (10, 1, 1.0) in got, got
    assert not any(abs(s - 99.0) < 1e-9 or n == 2 for (_h, n, s) in got), got


def test_stateful_operator_ignores_all_null_ts_batch(spark, tmp_path):
    """A micro-batch whose ts values are all NULL must count its events
    but NOT corrupt last_ts (NaT→INT64_MIN under astype('int64'))."""
    import datetime as dt

    from demo_data_warehouse_spark.streaming.pipeline import stateful_user_progress

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    # batch 1: valid ts; batch 2 (separate file): null ts for the same key
    _write_batch(spark, landing, _rows((1, 1, 5, 1.0)))
    spark.createDataFrame(
        [Row(event_id=2, user_id=1, ts=None, value=2.0)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(landing)

    emitted: list = []

    def sink(batch, _bid):
        emitted.extend(batch.collect())

    schema = spark.read.parquet(landing).schema
    out = stateful_user_progress(
        read_landing_stream(spark, landing, schema=schema, maxFilesPerTrigger=1)
    )
    run_available_now(out, batch_fn=sink, checkpoint=ckpt, output_mode="update")
    final = {r.user_id: (r.n_events, r.last_ts) for r in emitted}[1]
    n_events, last_ts = final
    assert n_events == 2  # null-ts event still counted
    assert last_ts == dt.datetime(2024, 1, 1, 10, 5)  # not INT64_MIN garbage


def test_transform_with_state_environment_ceiling():
    """SURVEY §7.3.8: Spark 4's `transformWithStateInPandas` (timers/TTL
    keyed state) is present in the API, but its state-server protocol
    needs the `google.protobuf` Python package, which this sandbox lacks
    (no pip) — the query dies with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. Custom stateful
    streaming therefore ships on `applyInPandasWithState`
    (queries/streams.py::stream_stateful), which covers the same
    keyed-state semantics minus timers.

    This test IS the documented skip: while protobuf is absent the
    ceiling is real and the skip states the cause; the moment the
    environment gains protobuf it fails loudly instead, so the gap
    cannot silently outlive its justification (VERDICT r6 item 8)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip(
            "google.protobuf absent: transformWithStateInPandas cannot "
            "initialize its state server in this environment (SURVEY "
            "§7.3.8); keyed stateful streaming is covered via "
            "applyInPandasWithState instead"
        )
    pytest.fail(
        "google.protobuf is now importable — the documented environment "
        "ceiling on transformWithStateInPandas no longer holds. Add real "
        "coverage (timers/TTL state) and retire this sentinel."
    )
