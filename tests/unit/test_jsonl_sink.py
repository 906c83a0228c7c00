"""jsonl_sink DataSource writer contract: append accumulates, overwrite
sweeps old generations, a failed write changes nothing visible (abort),
and visibility is manifest-only."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.lark.pydatasource import (
    JsonlSinkDataSource,
    read_jsonl_sink,
)
from demo_data_warehouse_spark.streaming.pipeline import scratch_dir

SCHEMA = "id bigint, name string"


def _write(df, path, mode):
    df.write.format("jsonl_sink").option("path", path).mode(mode).save()


@pytest.fixture()
def sink(spark):
    spark.dataSource.register(JsonlSinkDataSource)
    return scratch_dir("jsonl_sink_t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def test_append_accumulates_and_roundtrips(spark, sink):
    _write(_df(spark, 0, 10), sink, "append")
    _write(_df(spark, 10, 15), sink, "append")
    got = {(r.id, r.name) for r in read_jsonl_sink(spark, sink, SCHEMA).collect()}
    assert got == {(i, f"n{i}") for i in range(15)}


def test_overwrite_sweeps_previous_generation(spark, sink):
    _write(_df(spark, 0, 10), sink, "append")
    _write(_df(spark, 100, 103), sink, "overwrite")
    got = {r.id for r in read_jsonl_sink(spark, sink, SCHEMA).collect()}
    assert got == {100, 101, 102}
    # old generation files physically swept, not just unreferenced
    data_files = [f for f in os.listdir(sink) if f.endswith(".jsonl")]
    with open(os.path.join(sink, "_manifest.json")) as fh:
        live = {e["file"] for e in json.load(fh)["files"]}
    assert set(data_files) == live


def test_stream_commit_sweeps_crash_debris(spark, sink):
    """An epoch that crashes between its file renames and the manifest
    swap leaves renamed-but-unpublished files; the replayed epoch stages
    under fresh uuids, so without a sweep the debris lives forever.
    Readers never see it (manifest-resolved), but the NEXT commit must
    physically remove it — same rule as the batch writer."""
    from demo_data_warehouse_spark.lark.pydatasource import (
        JsonlStreamSinkWriter,
        _JsonlCommit,
    )

    w = JsonlStreamSinkWriter(sink)
    staging = os.path.join(sink, ".staging")
    os.makedirs(staging, exist_ok=True)
    staged = os.path.join(staging, "task0.jsonl")
    with open(staged, "w") as fh:
        fh.write('{"id": 1, "name": "n1"}\n')
    # crash debris: a file a previous attempt renamed into place before
    # dying (plus a torn manifest temp from the same crash)
    for debris in ("deadbeef.jsonl", "_manifest.json.tmp-dead"):
        with open(os.path.join(sink, debris), "w") as fh:
            fh.write('{"id": 99, "name": "ghost"}\n')
    w.commit([_JsonlCommit(staged, 1)], batchId=0)
    on_disk = {f for f in os.listdir(sink) if f != "_manifest.json"}
    with open(os.path.join(sink, "_manifest.json")) as fh:
        live = {e["file"] for e in json.load(fh)["files"]}
    assert on_disk == live  # debris and torn temps physically gone
    got = {(r.id, r.name) for r in read_jsonl_sink(spark, sink, SCHEMA).collect()}
    assert got == {(1, "n1")}


def test_batch_append_preserves_stream_epoch_ledger(spark, sink):
    """Exactly-once for the stream sink rides on the manifest's
    'batches' list; a batch-mode APPEND into the same path must carry
    that ledger forward, or an epoch replay after the append would
    double-publish its rows (ADVICE r6). Overwrite resets the manifest
    by design — truncation invalidates old epochs."""
    from demo_data_warehouse_spark.lark.pydatasource import (
        JsonlStreamSinkWriter,
        _JsonlCommit,
    )

    def _stage(name, payload):
        staging = os.path.join(sink, ".staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, name)
        with open(staged, "w") as fh:
            fh.write(payload)
        return staged

    w = JsonlStreamSinkWriter(sink)
    w.commit([_JsonlCommit(_stage("e0.jsonl", '{"id": 1, "name": "n1"}\n'), 1)], batchId=0)
    _write(_df(spark, 10, 12), sink, "append")  # batch append, same path
    with open(os.path.join(sink, "_manifest.json")) as fh:
        assert json.load(fh)["batches"] == [0]  # ledger survived the append
    # epoch-0 replay after the batch append: still a no-op
    w.commit([_JsonlCommit(_stage("e0r.jsonl", '{"id": 1, "name": "n1"}\n'), 1)], batchId=0)
    got = sorted(r.id for r in read_jsonl_sink(spark, sink, SCHEMA).collect())
    assert got == [1, 10, 11]  # no double-publish
    _write(_df(spark, 100, 101), sink, "overwrite")
    with open(os.path.join(sink, "_manifest.json")) as fh:
        assert "batches" not in json.load(fh)  # overwrite resets the ledger


def test_failed_write_is_invisible(spark, sink):
    _write(_df(spark, 0, 10), sink, "append")
    before = {(r.id, r.name) for r in read_jsonl_sink(spark, sink, SCHEMA).collect()}

    @F.udf("bigint")
    def boom(x):
        if x >= 20:
            raise ValueError("injected task failure")
        return x

    bad = spark.range(18, 25).select(boom("id").alias("id"), F.lit("x").alias("name"))
    with pytest.raises(Exception):
        _write(bad, sink, "append")
    after = {(r.id, r.name) for r in read_jsonl_sink(spark, sink, SCHEMA).collect()}
    assert after == before
    # The visibility contract is manifest-only: staging may transiently
    # hold straggler files (Spark cancels sibling tasks of a failed job
    # ASYNCHRONOUSLY, so a task can re-create .staging after abort()'s
    # sweep — asserting empty-after-abort is a race). The durable
    # guarantee is that the NEXT successful commit sweeps all orphans
    # and exposes only committed rows.
    _write(_df(spark, 30, 32), sink, "append")
    got = {(r.id, r.name) for r in read_jsonl_sink(spark, sink, SCHEMA).collect()}
    assert got == before | {(30, "n30"), (31, "n31")}
    assert not os.path.isdir(os.path.join(sink, ".staging")) or not any(
        os.scandir(os.path.join(sink, ".staging"))
    )
    data_files = {f for f in os.listdir(sink) if f.endswith(".jsonl")}
    with open(os.path.join(sink, "_manifest.json")) as fh:
        live = {e["file"] for e in json.load(fh)["files"]}
    assert data_files == live
