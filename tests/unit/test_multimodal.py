"""Multimodal binary-column plumbing: schema, batching, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, "hello world"), (2, "x" * 1000), (3, None)]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    return multimodal.to_media_table(df, "doc_id", "payload")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "n_bytes"]
    assert media.schema["content"].dataType.simpleString() == "binary"


def test_fake_features_deterministic(spark, media):
    a = multimodal.extract_features(media, fake=True).toPandas().sort_values("media_id")
    b = multimodal.extract_features(media, fake=True).toPandas().sort_values("media_id")
    assert a.equals(b)
    row = a[a.media_id == 1].iloc[0]
    assert row.n_bytes == len(b"hello world")
    assert 1 <= row.fake_width <= 640 and 1 <= row.fake_height <= 480


def test_null_payload_survives(media):
    out = multimodal.extract_features(media, fake=True).where(F.col("media_id") == 3).collect()
    assert out[0].n_bytes == 0


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real image/audio decode" in str(ei.value)


def test_resize_size_contract(media):
    out = multimodal.resize(media, 8, 4, fake=True).toPandas().sort_values("media_id")
    assert list(out.columns) == ["media_id", "out_width", "out_height", "content", "n_bytes"]
    assert (out.n_bytes == 32).all()  # every payload resized to exactly w*h
    assert (out.out_width == 8).all() and (out.out_height == 4).all()
    # deterministic: content is the input bytes cycled
    row = out[out.media_id == 1].iloc[0]
    assert bytes(row.content) == (b"hello world" * 3)[:32]


def test_frame_sample_fanout(media):
    out = multimodal.frame_sample(media, 4, fake=True).toPandas()
    assert len(out) == 3 * 4  # every media row fans out to exactly n_frames
    g = out.groupby("media_id").frame_idx.apply(list).to_dict()
    assert all(v == [0, 1, 2, 3] for v in g.values())
    # frames of media 2 ("x"*1000): even 250-byte chunks
    f2 = out[out.media_id == 2]
    assert (f2.n_bytes == 250).all()
    # null payload → empty frames, not a crash
    f3 = out[out.media_id == 3]
    assert (f3.n_bytes == 0).all()


def test_resize_real_is_stubbed(spark, media):
    with pytest.raises(Exception) as ei:
        multimodal.resize(media, 8, 4, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real image resize" in str(ei.value)


def test_perceptual_hash_and_pairs_exact(spark):
    from demo_data_warehouse_spark.operators import multimodal

    # 60-byte payloads: p1 == p2, p3 differs in one high byte (hamming
    # 1 vs p1), p4 unrelated, p5 too short → NULL hash, excluded
    base = ("a" * 30 + "z" * 30).encode()
    p3 = ("a" * 29 + "z" * 31).encode()
    rows = [(1, base), (2, base), (3, p3), (4, (b"az" * 30)), (5, b"short")]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    hashes = multimodal.perceptual_hash(df, n_pixels=60, fake=True)
    got = {r["media_id"]: r["phash"] for r in hashes.collect()}
    assert got[1] == got[2] and got[5] is None
    assert bin(got[1] ^ got[3]).count("1") == 1
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.phash_dup_pairs(hashes, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert all(a != 4 and b != 4 for a, b in pairs)
