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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", LongType(), False),
        StructField("out_height", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize images to width×height via Arrow-batched mapInPandas.

    fake=True produces a deterministic payload: the input bytes cycled
    to exactly width*height bytes (a stand-in for a w×h grayscale
    buffer) — size contracts and batch plumbing are real. Real decode+
    resample needs codec libs absent here → NotImplementedError.
    """

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires codec libraries not present in "
                    "this environment; use fake=True for the deterministic stub"
                )

            def _cycle(b):
                if b is None or len(b) == 0:
                    return bytes(target)
                reps = -(-target // len(b))  # ceil
                return (bytes(b) * reps)[:target]

            out = pdf["content"].map(_cycle)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "out_width": width,
                    "out_height": height,
                    "content": out,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def frame_sample(media: DataFrame, n_frames: int, fake: bool = True) -> DataFrame:
    """Sample n_frames evenly from each video payload (1→N fan-out).

    mapInPandas is the right shape for row-multiplying decode: one Arrow
    batch in, a frames batch out, no driver involvement, and the fan-out
    never materializes a whole partition of decoded frames at once.
    fake=True slices the raw payload into n_frames even chunks.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real video frame extraction requires codec libraries not "
                    "present in this environment; use fake=True for the stub"
                )
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                b = b if b is not None else b""
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    chunk = bytes(b[i * step : (i + 1) * step])
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "n_bytes": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), True),
    ]
)


def perceptual_hash(media: DataFrame, n_pixels: int = 60, fake: bool = True) -> DataFrame:
    """(media_id, phash) — average-hash perceptual fingerprint of the
    decoded payload, Arrow-batched.

    Real path (stubbed — no codec libs in this environment): decode,
    resize to a tiny grid, hash = bits 'pixel above grid mean'. Fake
    path: the first `n_pixels` payload BYTES are the grid, so the hash
    pipeline — mean threshold, bit packing, downstream hamming
    bucketing — runs bit-for-bit real. n_pixels defaults to 60 so the
    packed hash stays a non-negative bigint (the same 60-bit register
    convention as dedup.hash60). The mean is an integer floor; payloads
    shorter than the grid hash to NULL (callers filter) rather than a
    padded pretend-image.
    """

    def _decode_real(payload):
        raise NotImplementedError(
            "real image decode requires codec libraries not present in "
            "this environment; use fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf["content"].map(_decode_real)  # raises — clearly-marked stub

            def _hash(b):
                if b is None or len(b) < n_pixels:
                    return None
                px = b[:n_pixels]
                mean = sum(px) // n_pixels
                h = 0
                for i, v in enumerate(px):
                    if v > mean:
                        h |= 1 << i
                return h

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "phash": pdf["content"].map(_hash).astype("Int64"),
                }
            )

    return media.mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_dup_pairs(hashes: DataFrame, max_hamming: int = 3, n_blocks: int = 4) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate media pairs by perceptual
    hash, candidates from BLOCK BUCKETING (pigeonhole: hamming ≤ k over
    n_blocks ≥ k+1 blocks forces ≥1 identical block), the same
    discipline as the simhash dedup: candidates are an equi-join on
    (block_idx, block_value), never all pairs; the exact popcount of
    the XOR verifies."""
    bits_per = 60 // n_blocks
    mask = (1 << bits_per) - 1
    h = hashes.where(F.col("phash").isNotNull())
    blocks = h.select(
        "media_id",
        "phash",
        F.explode(F.array(*[F.lit(j) for j in range(n_blocks)])).alias("j"),
    ).withColumn(
        "bkey", F.expr(f"shiftright(phash, j * {bits_per}) & {mask}")
    )
    a = blocks.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("ha"), "j", "bkey"
    )
    b = blocks.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("hb"), "j", "bkey"
    )
    return (
        a.join(b, ["j", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("bit_count(ha ^ hb)").cast("bigint").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
