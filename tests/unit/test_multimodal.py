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
