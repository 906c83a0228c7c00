"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode paths:
  - ``fake=True`` (default for the synthetic testdata, whose payloads
    are not valid images): deterministic pseudo-decode, so the
    distributed plumbing — schema, Arrow-batched mapInPandas, batch
    shapes, partitioning — is fully exercised and testable.
  - ``fake=False``: REAL decode. Netpbm (P5/P6), uncompressed 24-bit
    BMP, and 8-bit non-interlaced PNG (gray/RGB/palette/alpha; stdlib
    zlib inflate + numpy unfiltering, all five spec filters) are
    decoded in pure numpy (no codec library needed — tested in-repo);
    any other format falls through to PIL when it is installed, else
    raises NotImplementedError naming the gap. WAV PCM audio (8/16-bit)
    decodes in pure numpy too (decode_audio_bytes/audio_features).
    ``frame_sample`` additionally treats a payload of CONCATENATED
    netpbm images as a frame stream — exactly the byte format ffmpeg's
    ``-f image2pipe -vcodec ppm`` emits — so real video frame sampling
    works wherever a PPM pipe can be materialized, codec-free.

The real-path closures reference this module's decoder functions, so
the package must be importable on executors (standard deployment:
--py-files / pip-installed image), unlike the fake paths, which stay
self-contained.

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

# ---------------------------------------------------------------------------
# real decoders (pure numpy; PIL only as optional fallback)


def _netpbm_header(b: bytes, off: int = 0):
    """Parse a netpbm binary header starting at `off`: returns
    (magic, width, height, maxval, data_offset). Comments (#...) and
    arbitrary whitespace between tokens per the spec; exactly one
    whitespace byte after maxval."""
    magic = bytes(b[off : off + 2])
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload at {off}: {magic!r}")
    i, tokens = off + 2, []
    n = len(b)
    while len(tokens) < 3:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace byte separating header from raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    return magic, w, h, maxval, i


def decode_image_bytes(b):
    """bytes -> uint8 ndarray, H×W (grayscale P5) or H×W×3 (P6 / BMP /
    PIL-decoded). Pure numpy for netpbm and uncompressed 24-bit BMP;
    other formats require PIL (optional)."""
    import numpy as np

    if b is None or len(b) < 2:
        raise ValueError("empty payload")
    b = bytes(b)
    magic = b[:2]
    if magic in (b"P5", b"P6"):
        m, w, h, _maxval, off = _netpbm_header(b)
        ch = 3 if m == b"P6" else 1
        need = w * h * ch
        raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
        arr = raster.reshape(h, w, ch)
        return arr[:, :, 0] if ch == 1 else arr
    png_err = None
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            return _decode_png(b)
        except ValueError as e:
            # variant outside the pure-python envelope (16-bit, interlaced,
            # truncated): fall through to PIL, which handles the exotic
            # cases and raises its own error on genuinely corrupt bytes
            png_err = e
    if magic == b"BM":
        data_off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bitcount = int.from_bytes(b[28:30], "little")
        compression = int.from_bytes(b[30:34], "little")
        if bitcount != 24 or compression != 0:
            raise ValueError(
                f"only uncompressed 24-bit BMP supported ({bitcount}-bit, "
                f"compression {compression})"
            )
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = ((w * 3 + 3) // 4) * 4  # rows padded to 4 bytes
        rows = np.frombuffer(
            b, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return rgb[::-1] if flip else rgb
    try:
        import io as _io

        from PIL import Image
    except ImportError:
        detail = f" ({png_err})" if png_err is not None else ""
        raise NotImplementedError(
            f"no pure-python decoder for image magic {magic!r}{detail} and "
            "PIL is not installed; install Pillow for compressed formats"
        ) from png_err
    return np.asarray(Image.open(_io.BytesIO(b)).convert("RGB"))


def _png_unfilter(raw, h: int, stride: int, bpp: int):
    """Reverse PNG per-row filtering (spec §9, public): `raw` is the
    zlib-decompressed byte stream, one filter-type byte then `stride`
    filtered bytes per row. Returns uint8 (h, stride). Filters None/Up
    are fully vectorized and Sub vectorizes as a per-lane cumsum (our
    own encoder emits None only, so repo-produced payloads never leave
    the vectorized path); Average/Paeth are inherently sequential in
    the left neighbor and fall back to a per-byte loop."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] — cumsum per lane
            cur = np.cumsum(row.reshape(-1, bpp), axis=0).reshape(-1) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # Average
            cur = row
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b_up = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b_up - c
                pa, pb, pc = abs(p - a), abs(p - b_up), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b_up
                else:
                    pred = c
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(b: bytes):
    """Pure numpy + stdlib-zlib PNG decode (no codec library): 8-bit
    grayscale (0), RGB (2), palette (3), gray+alpha (4), RGBA (6),
    non-interlaced. Alpha is dropped (PIL's convert('RGB') contract).
    Raises ValueError on anything outside that envelope so callers can
    fall through to PIL when present."""
    import zlib

    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    n = len(b)
    while pos + 8 <= n:
        length = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR or IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced PNG supported (depth {bit_depth}, "
            f"interlace {interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color_type == 0:
        return px[:, :, 0]
    if color_type == 2:
        return px
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[px[:, :, 0]]
    if color_type == 4:
        return px[:, :, 0]  # drop alpha
    return px[:, :, :3]  # RGBA: drop alpha


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(arr) -> bytes:
    """uint8 H×W or H×W×3 ndarray -> PNG bytes (8-bit gray/RGB, filter
    None on every row, stdlib zlib). Counterpart of _decode_png for
    tests and payload assembly; compressed bytes are zlib-version
    dependent, so contracts must compare DECODED pixels, never the
    encoded stream."""
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type, stride = 0, w
    else:
        h, w, ch = arr.shape
        if ch != 3:
            raise ValueError(f"expected 3 channels, got {ch}")
        color_type, stride = 2, w * 3
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    flat = arr.reshape(h, stride)
    raster = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raster))
        + _png_chunk(b"IEND", b"")
    )


def encode_ppm(arr) -> bytes:
    """uint8 H×W or H×W×3 ndarray -> binary netpbm bytes (P5/P6)."""
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        return b"P5 %d %d 255\n" % (w, h) + arr.tobytes()
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError(f"expected 3 channels, got {ch}")
    return b"P6 %d %d 255\n" % (w, h) + arr.tobytes()


def iter_netpbm_frames(b):
    """Yield uint8 arrays for each image in a CONCATENATED netpbm
    stream (ffmpeg image2pipe ppm output format)."""
    import numpy as np

    b = bytes(b)
    off = 0
    while off < len(b):
        m, w, h, _maxval, data = _netpbm_header(b, off)
        ch = 3 if m == b"P6" else 1
        need = w * h * ch
        raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=data)
        arr = raster.reshape(h, w, ch)
        yield arr[:, :, 0] if ch == 1 else arr
        off = data + need


def _to_gray(arr):
    """Integer ITU-R 601 luma — deterministic, no float rounding."""
    import numpy as np

    if arr.ndim == 2:
        return arr
    a = arr.astype(np.int64)
    return (
        (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000
    ).astype(np.uint8)


def _nn_resize(arr, width: int, height: int):
    """Nearest-neighbor resample by exact integer index mapping."""
    import numpy as np

    h, w = arr.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return arr[yi][:, xi]

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
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("checksum", LongType(), True),
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
    in a self-contained closure (workers don't need this package).
    fake=False REALLY decodes (netpbm/BMP in pure numpy, PIL fallback)
    and emits actual width/height plus the integer pixel-sum checksum.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            n_bytes = content.map(lambda b: 0 if b is None else len(b)).astype("int64")
            if fake:
                checksum = content.map(
                    lambda b: 0 if b is None else sum(b[:64]) % 1_000_003
                ).astype("int64")
                width = (checksum % 640) + 1
                height = (checksum % 480) + 1
            else:
                arrs = content.map(decode_image_bytes)
                width = arrs.map(lambda a: a.shape[1]).astype("int64")
                height = arrs.map(lambda a: a.shape[0]).astype("int64")
                checksum = arrs.map(
                    lambda a: int(a.sum(dtype="int64")) % 1_000_003
                ).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "checksum": checksum,
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
    buffer) — size contracts and batch plumbing are real. fake=False
    REALLY decodes, nearest-neighbor resamples by exact integer index
    mapping (deterministic — no resampling-kernel float variance), and
    re-encodes as binary netpbm.
    """

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:

                def _one(b):
                    if b is None or len(b) == 0:
                        return bytes(target)
                    reps = -(-target // len(b))  # ceil
                    return (bytes(b) * reps)[:target]

            else:

                def _one(b):
                    return encode_ppm(_nn_resize(decode_image_bytes(b), width, height))

            out = pdf["content"].map(_one)
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
    fake=False REALLY parses the payload as a concatenated netpbm
    stream (the ffmpeg ``image2pipe -vcodec ppm`` byte format), samples
    n_frames evenly across the decoded frames, and re-emits each as a
    standalone netpbm image.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                b = b if b is not None else b""
                if fake:
                    step = max(len(b) // n_frames, 1)
                    chunks = [
                        bytes(b[i * step : (i + 1) * step]) for i in range(n_frames)
                    ]
                else:
                    decoded = list(iter_netpbm_frames(b))
                    # even temporal sampling: frame j comes from position
                    # floor(j * n_decoded / n_frames); an empty payload
                    # yields zero frames for this media_id, not a crash
                    chunks = [
                        encode_ppm(decoded[(i * len(decoded)) // n_frames])
                        for i in range(n_frames)
                    ] if decoded else []
                for i, chunk in enumerate(chunks):
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

    Real path (fake=False): decode (netpbm/BMP pure numpy, PIL
    fallback), integer-luma grayscale, nearest-neighbor resample to a
    10×6 grid — the classic average-hash, sized to 60 bits. Fake path:
    the first `n_pixels` payload BYTES are the grid, so the hash
    pipeline — mean threshold, bit packing, downstream hamming
    bucketing — runs bit-for-bit real either way. n_pixels defaults to
    60 so the packed hash stays a non-negative bigint (the same 60-bit
    register convention as dedup.hash60). The mean is an integer floor;
    fake-path payloads shorter than the grid hash to NULL (callers
    filter) rather than a padded pretend-image.
    """
    if n_pixels < 10 or n_pixels % 10 != 0:
        # the 10-wide grid only tiles exactly for multiples of 10; any
        # other size would silently hash fewer bits than requested and
        # bias the mean threshold (ADVICE r4)
        raise ValueError(f"n_pixels must be a multiple of 10 and >= 10, got {n_pixels}")
    grid_w, grid_h = 10, n_pixels // 10

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:

            def _grid(b):
                if fake:
                    if b is None or len(b) < n_pixels:
                        return None
                    return bytes(b[:n_pixels])
                return bytes(
                    _nn_resize(_to_gray(decode_image_bytes(b)), grid_w, grid_h)
                    .reshape(-1)
                    .tobytes()
                )

            def _hash(b):
                px = _grid(b)
                if px is None:
                    return None
                mean = sum(px) // len(px)  # divisor = actual grid size
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
