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
    assert 1 <= row.width <= 640 and 1 <= row.height <= 480


def test_null_payload_survives(media):
    out = multimodal.extract_features(media, fake=True).where(F.col("media_id") == 3).collect()
    assert out[0].n_bytes == 0


def test_real_decode_rejects_non_image_payloads(spark, media):
    # the media fixture payloads are text, not images: the REAL path
    # must fail loudly (unknown magic, PIL absent), never silently
    # fall back to pseudo-features
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, fake=False).collect()
    assert "decoder" in str(ei.value) or "ValueError" in str(ei.value)


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


def test_resize_real_rejects_non_image_payloads(spark, media):
    with pytest.raises(Exception) as ei:
        multimodal.resize(media, 8, 4, fake=False).collect()
    assert "netpbm" in str(ei.value) or "decoder" in str(ei.value) or "empty" in str(ei.value)


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


# ---------------------------------------------------------------------------
# REAL decode paths (pure-numpy netpbm/BMP — no codec library involved)


def _ppm_bytes(arr):
    return multimodal.encode_ppm(arr)


def _gradient(w, h):
    import numpy as np

    x = np.arange(w, dtype=np.uint8)
    img = np.stack(
        [
            np.tile(x, (h, 1)),
            np.tile((x[::-1]), (h, 1)),
            np.full((h, w), 7, dtype=np.uint8),
        ],
        axis=-1,
    )
    return img


def _bmp_bytes(arr):
    """Hand-roll an uncompressed 24-bit bottom-up BMP from H×W×3 RGB."""
    import numpy as np

    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixel_data = rows.tobytes()
    data_off = 14 + 40
    size = data_off + len(pixel_data)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + pixel_data


def test_decode_ppm_and_bmp_roundtrip():
    import numpy as np

    img = _gradient(5, 3)
    got_ppm = multimodal.decode_image_bytes(_ppm_bytes(img))
    assert got_ppm.shape == (3, 5, 3) and (got_ppm == img).all()
    got_bmp = multimodal.decode_image_bytes(_bmp_bytes(img))
    assert got_bmp.shape == (3, 5, 3) and (got_bmp == img).all()
    # P5 grayscale with header comments
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p5 = b"P5\n# a comment\n4 3\n255\n" + gray.tobytes()
    got_p5 = multimodal.decode_image_bytes(p5)
    assert got_p5.shape == (3, 4) and (got_p5 == gray).all()


def test_decode_unknown_magic_names_pil_gap():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: compressed formats decode for real")
    except ImportError:
        pass
    # genuinely unsupported magics: JPEG and GIF87a have no pure-python path
    for blob in (b"\xff\xd8\xff\xe0" + b"\x00" * 16, b"GIF87a" + b"\x00" * 16):
        with pytest.raises(NotImplementedError, match="PIL"):
            multimodal.decode_image_bytes(blob)
    # PNG outside the pure-python envelope falls through to the PIL gap
    # (ADVICE r4: decode_image_bytes catches _decode_png's ValueError)
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_truncated_png_raises_value_error():
    # the pure decoder itself reports corruption as ValueError; the
    # PIL fall-through in decode_image_bytes is layered on top of it
    with pytest.raises(ValueError, match="truncated PNG"):
        multimodal._decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_extract_features_real_dimensions(spark):
    rows = [(1, _ppm_bytes(_gradient(6, 4))), (2, _bmp_bytes(_gradient(10, 2)))]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    out = (
        multimodal.extract_features(df, fake=False)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (6, 4)
    assert (out.loc[2, "width"], out.loc[2, "height"]) == (10, 2)
    img = _gradient(6, 4)
    assert out.loc[1, "checksum"] == int(img.sum()) % 1_000_003


def test_resize_real_nearest_neighbor(spark):
    import numpy as np

    img = _gradient(8, 4)
    df = spark.createDataFrame([(1, _ppm_bytes(img))], "media_id bigint, content binary")
    out = multimodal.resize(df, 4, 2, fake=False).collect()[0]
    resized = multimodal.decode_image_bytes(bytes(out.content))
    assert resized.shape == (2, 4, 3)
    # exact integer index mapping: out[y][x] = in[y*4//2... -> (y*h)//H]
    yi = (np.arange(2) * 4) // 2
    xi = (np.arange(4) * 8) // 4
    assert (resized == img[yi][:, xi]).all()


def test_frame_sample_real_ppm_stream(spark):
    # three concatenated PPM frames (the ffmpeg image2pipe byte format),
    # sampled down to 2: frames 0 and 1 of 3 at even spacing
    frames = [_gradient(4, 2), _gradient(4, 2) + 1, _gradient(4, 2) + 2]
    stream = b"".join(_ppm_bytes(f) for f in frames)
    df = spark.createDataFrame([(1, stream)], "media_id bigint, content binary")
    out = multimodal.frame_sample(df, 2, fake=False).toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 1]
    got0 = multimodal.decode_image_bytes(bytes(out.iloc[0].frame))
    got1 = multimodal.decode_image_bytes(bytes(out.iloc[1].frame))
    assert (got0 == frames[0]).all()
    assert (got1 == frames[(1 * 3) // 2]).all()


def test_perceptual_hash_real_images(spark):
    import numpy as np

    rng_img = _gradient(40, 24)
    # same image at a different size hashes identically (grid-resample
    # invariance — the point of a perceptual hash)
    bigger = rng_img.repeat(2, axis=0).repeat(2, axis=1)
    flat = np.full((24, 40, 3), 128, dtype=np.uint8)
    rows = [
        (1, _ppm_bytes(rng_img)),
        (2, _ppm_bytes(bigger)),
        (3, _ppm_bytes(flat)),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {
        r["media_id"]: r["phash"]
        for r in multimodal.perceptual_hash(df, fake=False).collect()
    }
    assert got[1] == got[2]
    assert got[1] is not None and got[1] >= 0
    assert got[3] == 0  # flat image: no pixel above the mean


def test_codec_roundtrip_property():
    # property: encode->decode is identity for arbitrary small images
    # (both channels counts), and resize geometry always lands exactly
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 23),
        h=st.integers(1, 17),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**31 - 1),
        ow=st.integers(1, 9),
        oh=st.integers(1, 9),
    )
    def check(w, h, ch, seed, ow, oh):
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, size=(h, w) if ch == 1 else (h, w, 3)).astype(
            np.uint8
        )
        blob = multimodal.encode_ppm(arr)
        back = multimodal.decode_image_bytes(blob)
        assert back.shape == arr.shape and (back == arr).all()
        rs = multimodal._nn_resize(arr, ow, oh)
        assert rs.shape[:2] == (oh, ow)
        # every resized pixel exists in the source (nearest-neighbor law)
        again = multimodal.decode_image_bytes(multimodal.encode_ppm(rs))
        assert (again == rs).all()

    check()


def test_bmp_padding_property():
    # BMP rows pad to 4 bytes: widths 1..8 exercise every padding case
    import numpy as np

    for w in range(1, 9):
        arr = np.arange(w * 2 * 3, dtype=np.uint8).reshape(2, w, 3)
        got = multimodal.decode_image_bytes(_bmp_bytes(arr))
        assert got.shape == (2, w, 3) and (got == arr).all(), w


def test_decoder_rejects_garbage_without_hanging():
    # fuzz the header parser: arbitrary byte soup must raise a clean
    # ValueError / NotImplementedError, never hang, overread, or return
    # an array (only a structurally-valid payload may decode)
    import numpy as np
    import pytest as _pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=64))
    def check(blob):
        try:
            out = multimodal.decode_image_bytes(blob)
        except (ValueError, NotImplementedError):
            return
        # decoded: must be a real array whose raster fit in the payload
        assert isinstance(out, np.ndarray) and out.size <= len(blob)

    check()


def _png_forward_filter(arr, ft, bpp):
    """Apply the PNG forward filter `ft` to recon rows (h, stride) —
    the test-side inverse of multimodal._png_unfilter."""
    import numpy as np

    h, stride = arr.shape
    out = b""
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = arr[y].astype(np.int32)
        f = np.zeros(stride, dtype=np.uint8)
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (a + up) >> 1
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
            f[i] = (int(cur[i]) - pred) & 0xFF
        out += bytes([ft]) + f.tobytes()
        prev = cur
    return out


def _png_bytes(color_type, w, h, raster, plte=None):
    import zlib

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color_type, 0, 0, 0])
    )
    blob = b"\x89PNG\r\n\x1a\n" + multimodal._png_chunk(b"IHDR", ihdr)
    if plte is not None:
        blob += multimodal._png_chunk(b"PLTE", plte)
    return (
        blob
        + multimodal._png_chunk(b"IDAT", zlib.compress(raster))
        + multimodal._png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_encode_decode():
    import numpy as np

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(5, 7)).astype(np.uint8)
    rgb = rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    assert (multimodal.decode_image_bytes(multimodal.encode_png(gray)) == gray).all()
    assert (multimodal.decode_image_bytes(multimodal.encode_png(rgb)) == rgb).all()


def test_png_filters_and_color_types_property():
    # fuzz the decoder over every filter type (0-4) and color type
    # (gray / RGB / palette / gray+alpha / RGBA): forward-filter known
    # pixels in the test, decode must reconstruct them exactly
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 11),
        h=st.integers(1, 9),
        ft=st.integers(0, 4),
        color_type=st.sampled_from([0, 2, 3, 4, 6]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, ft, color_type, seed):
        rng = np.random.RandomState(seed)
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        stride = w * channels
        px = rng.randint(0, 256, size=(h, stride)).astype(np.uint8)
        plte = None
        if color_type == 3:
            plte = rng.randint(0, 256, size=(256, 3)).astype(np.uint8).tobytes()
        raster = _png_forward_filter(px, ft, channels)
        got = multimodal.decode_image_bytes(_png_bytes(color_type, w, h, raster, plte))
        shaped = px.reshape(h, w, channels)
        if color_type == 0:
            expect = shaped[:, :, 0]
        elif color_type == 2:
            expect = shaped
        elif color_type == 3:
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            expect = pal[shaped[:, :, 0]]
        elif color_type == 4:
            expect = shaped[:, :, 0]  # alpha dropped
        else:
            expect = shaped[:, :, :3]  # alpha dropped
        assert got.shape == expect.shape and (got == expect).all()

    check()


def test_png_rejects_unsupported_variants():
    import zlib

    import numpy as np

    px = np.zeros((2, 2), dtype=np.uint8)
    raster = _png_forward_filter(px, 0, 1)
    # 16-bit depth is outside the pure-python envelope
    with pytest.raises(ValueError, match="8-bit"):
        multimodal._decode_png(
            b"\x89PNG\r\n\x1a\n"
            + multimodal._png_chunk(
                b"IHDR",
                (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([16, 0, 0, 0, 0]),
            )
            + multimodal._png_chunk(b"IDAT", zlib.compress(raster))
            + multimodal._png_chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="palette PNG without PLTE"):
        multimodal._decode_png(_png_bytes(3, 2, 2, raster, plte=None))


def test_decoder_rejects_truncated_raster():
    # header promises 4x4 RGB (48 bytes) but the raster has 10: the
    # numpy frombuffer count must fail loudly, not read out of bounds
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_image_bytes(b"P6 4 4 255\n" + b"\x01" * 10)


def test_frame_sample_real_empty_payload_yields_no_frames(spark):
    # ADVICE r4: an empty/null payload decodes to zero netpbm frames and
    # must emit zero rows for that media_id, not IndexError the task
    df = spark.createDataFrame(
        [(1, b""), (2, None), (3, _ppm_bytes(_gradient(4, 2)))],
        "media_id bigint, content binary",
    )
    out = multimodal.frame_sample(df, 2, fake=False).toPandas()
    assert set(out.media_id) == {3} and len(out) == 2


def test_perceptual_hash_rejects_bad_n_pixels():
    with pytest.raises(ValueError, match="multiple of 10"):
        multimodal.perceptual_hash(None, n_pixels=55, fake=True)
    with pytest.raises(ValueError, match="multiple of 10"):
        multimodal.perceptual_hash(None, n_pixels=5, fake=True)
