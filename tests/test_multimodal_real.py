"""The REAL multimodal decode paths (no external libs): pure-numpy BMP
codec and stdlib-wave PCM16 — round-trips, true pixel/sample stats
through the Arrow-batched feature extractor, and actual
nearest-neighbor resizing."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_bmp,
    decode_media,
    decode_png,
    decode_wav_pcm16,
    encode_bmp,
    encode_png,
    encode_wav_pcm16,
    extract_features,
    resize_images,
)


def _img(h, w, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_round_trip_exact():
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 2)]:  # incl. padded rows
        arr = _img(h, w)
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr), (h, w)


def test_png_round_trip_exact():
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 2)]:
        arr = _img(h, w, seed=h * 10 + w)
        assert np.array_equal(decode_png(encode_png(arr)), arr), (h, w)


def test_png_all_filter_types_decode():
    """decode_png must undo every standard scanline filter (our
    encoder only emits 0, but real PNGs use all five). Build the
    filtered stream by applying the spec's forward filters to a known
    image, one filter type per row, and require exact recovery."""
    import struct
    import zlib

    arr = _img(5, 4, seed=42)
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * 3).astype(np.int32)
    bpp = 3
    raw = b""
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = flat[y]
        prior = flat[y - 1] if y else np.zeros(w * 3, np.int32)
        filt = np.zeros(w * 3, dtype=np.int32)
        for x in range(w * 3):
            a = line[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) & 0xFF
        raw += bytes([ftype]) + filt.astype(np.uint8).tobytes()

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), arr)


def test_png_rejects_unsupported_variants():
    import pytest

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"definitely not a png")
    # grayscale (color type 0) is out of scope for the stdlib decoder
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="truecolor"):
        decode_png(gray)


def test_wav_round_trip_exact():
    t = np.arange(800)
    samples = (np.sin(t / 20.0) * 20_000).astype(np.int16)
    back, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 8_000))
    assert rate == 8_000
    assert np.array_equal(back, samples)


def test_decode_media_real_paths():
    arr = _img(4, 4)
    feats = decode_media(encode_bmp(arr), "image/bmp")
    assert feats["byte_mean"] == float(arr.mean())  # TRUE pixel mean
    assert feats["frame_count"] == 1

    feats = decode_media(encode_png(arr), "image/png")
    assert feats["byte_mean"] == float(arr.mean())  # TRUE pixel mean
    assert feats["frame_count"] == 1

    samples = np.arange(-300, 300, dtype=np.int16)
    feats = decode_media(encode_wav_pcm16(samples), "audio/wav")
    assert feats["frame_count"] == len(samples)  # TRUE pcm frame count
    assert feats["byte_mean"] == float(samples.astype("float64").mean())


def _media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_real_bmp_through_arrow(spark):
    imgs = {i: _img(6, 6, seed=i) for i in range(4)}
    rows = [
        (i, bytearray(encode_bmp(a)), ("image/bmp", len(encode_bmp(a)), 6, 6))
        for i, a in imgs.items()
    ]
    got = {r["media_id"]: r for r in extract_features(_media_df(spark, rows)).collect()}
    for i, a in imgs.items():
        assert got[i]["byte_mean"] == float(a.mean())
        assert got[i]["frame_count"] == 1


def test_resize_bmp_nearest_neighbor_exact(spark):
    arr = _img(8, 8, seed=9)
    payload = encode_bmp(arr)
    df = _media_df(
        spark, [(1, bytearray(payload), ("image/bmp", len(payload), 8, 8))]
    )
    out = resize_images(df, target_w=4, target_h=4).collect()
    assert len(out) == 1 and out[0]["width"] == 4
    back = decode_bmp(bytes(out[0]["payload"]))
    ys = (np.arange(4) * 8 // 4).clip(0, 7)
    xs = (np.arange(4) * 8 // 4).clip(0, 7)
    assert np.array_equal(back, arr[ys][:, xs])  # exact NN resample
    # upscale too
    up = resize_images(df, target_w=16, target_h=16).collect()[0]
    assert decode_bmp(bytes(up["payload"])).shape == (16, 16, 3)


def test_resize_png_nearest_neighbor_exact(spark):
    arr = _img(8, 8, seed=11)
    payload = encode_png(arr)
    df = _media_df(
        spark, [(1, bytearray(payload), ("image/png", len(payload), 8, 8))]
    )
    out = resize_images(df, target_w=4, target_h=4).collect()
    assert len(out) == 1 and out[0]["width"] == 4
    back = decode_png(bytes(out[0]["payload"]))
    ys = (np.arange(4) * 8 // 4).clip(0, 7)
    xs = (np.arange(4) * 8 // 4).clip(0, 7)
    assert np.array_equal(back, arr[ys][:, xs])  # exact NN resample


def test_synthetic_payloads_still_use_fake_path(spark):
    """attach_media's fabricated text-byte payloads carry neither RIFF
    nor a PNG signature -> deterministic fake stats, unchanged
    behavior for the declared queries."""
    payload = b"not riff at all"
    feats = decode_media(payload, "audio/wav")
    assert feats["byte_mean"] == sum(payload) / len(payload)
    feats = decode_media(b"not a png either", "image/png")
    assert feats["frame_count"] == 1
    assert feats["byte_mean"] == sum(b"not a png either") / 16
