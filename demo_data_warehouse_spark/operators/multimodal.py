"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind ``fake=True`` (real decode raises
NotImplementedError, clearly marked). Everything Spark-side is real and
tested: schema, Arrow-batched mapInPandas, batch shapes, partitioning.

At scale: binary payloads ride in parquet binary columns; mapInPandas
streams Arrow batches so one partition never materializes fully as
Python objects beyond a batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("fake_width", LongType(), True),
        StructField("fake_height", LongType(), True),
        StructField("fake_checksum", LongType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap any column as an opaque binary media table with typed metadata."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    fake=True computes deterministic pseudo-features (sizes + checksum)
    so the distributed plumbing is fully exercised and testable. The
    closure is self-contained so workers don't need this package on
    their PYTHONPATH.
    """

    def _decode_real(payload):
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present in "
            "this environment; use fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf["content"].map(_decode_real)  # raises — clearly-marked stub
            content = pdf["content"]
            n_bytes = content.map(lambda b: 0 if b is None else len(b)).astype("int64")
            checksum = content.map(
                lambda b: 0 if b is None else sum(b[:64]) % 1_000_003
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "fake_width": (checksum % 640) + 1,
                    "fake_height": (checksum % 480) + 1,
                    "fake_checksum": checksum,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
