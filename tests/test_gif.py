"""GIF codec: a hand-assembled spec fixture (bytes written against
the GIF89a spec, independent of the encoder) decodes to known pixels;
LZW round-trips survive dict growth, code-width bumps, the KwKwK
pattern, and the 4096-entry table reset; multi-frame GIFs decode to
real frame counts through the Spark decode path.
"""

from __future__ import annotations

import struct

import numpy as np

from peerdb_cdc_psql_clickhouse_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif,
    decode_media,
    encode_gif,
)


def _hand_built_gif() -> tuple[bytes, np.ndarray]:
    """2x2 image over a 4-color palette, LZW codes packed BY HAND per
    the spec (min code size 2: clear=4 end=5, 3-bit codes LSB-first):
    pixels [0, 1, 2, 3] -> code stream [4, 0, 1, 2, 3, 5]."""
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)  # gct 2^2 colors
    for r, g, b in pal:
        out += bytes((r, g, b))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    out.append(2)  # LZW min code size
    # widths per the spec: processing code `2` grows the table to 8
    # entries, so the remaining codes are read at 4 bits
    codes = [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)]
    cur = nbits = 0
    data = bytearray()
    for c, width in codes:
        cur |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8
    if nbits:
        data.append(cur & 0xFF)
    out.append(len(data))
    out += data
    out.append(0)
    out.append(0x3B)
    want = np.array(pal, dtype=np.uint8).reshape(2, 2, 3)
    return bytes(out), want


def test_hand_built_fixture_decodes():
    payload, want = _hand_built_gif()
    frames = decode_gif(payload)
    assert len(frames) == 1
    assert np.array_equal(frames[0], want)


def test_lzw_round_trip_patterns():
    rng = np.random.RandomState(7)
    cases = [
        [0, 0, 0, 0, 0, 0, 0, 0],  # KwKwK immediately
        [1, 2, 3] * 50,
        list(rng.randint(0, 16, size=5000)),
        list(rng.randint(0, 4, size=20000)),  # forces width bumps
        [5],
        [],
    ]
    for idx in cases:
        for min_code in (2, 4):
            if idx and max(idx) >= (1 << min_code):
                continue
            enc = _gif_lzw_encode(min_code, idx)
            got = _gif_lzw_decode(min_code, enc, len(idx))
            assert got == [int(i) for i in idx], (min_code, len(idx))


def test_lzw_table_reset_at_4096():
    # a long low-repetition stream drives the table to 4096 and forces
    # the encoder's mid-stream clear; decode must still be exact
    rng = np.random.RandomState(1)
    idx = list(rng.randint(0, 64, size=60000))
    enc = _gif_lzw_encode(6, idx)
    assert _gif_lzw_decode(6, enc, len(idx)) == idx


def test_multi_frame_round_trip_and_media_path(spark):
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 16, size=(9, 7)).astype(np.uint8) for _ in range(5)]
    pal = [(i * 16, 255 - i * 16, i) for i in range(16)]
    payload = encode_gif(frames, pal)
    got = decode_gif(payload)
    assert len(got) == 5
    lut = np.array(pal, dtype=np.uint8)
    for f, g in zip(frames, got):
        assert np.array_equal(g, lut[f])
    # the decode_media dispatch reports the REAL frame count + mean
    meta = decode_media(payload, "image/gif")
    assert meta["frame_count"] == 5
    want_mean = sum(float(lut[f].sum()) for f in frames) / sum(
        lut[f].size for f in frames
    )
    assert abs(meta["byte_mean"] - want_mean) < 1e-9


def test_extension_blocks_are_skipped():
    payload, want = _hand_built_gif()
    # splice a graphic-control extension (0x21 0xF9, 4-byte block)
    # between the header+palette and the image descriptor
    head, rest = payload[:25], payload[25:]
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    frames = decode_gif(head + ext + rest)
    assert np.array_equal(frames[0], want)


def test_mislabeled_gif_payload_falls_back_to_fake():
    """ADVICE r4: bytes labeled image/gif that aren't GIF (no
    signature) must take the deterministic-fake path, not raise
    inside the Arrow batch."""
    payload = b"definitely not a gif payload " * 100
    meta = decode_media(payload, "image/gif")
    assert meta["byte_mean"] == sum(payload) / len(payload)
    assert meta["frame_count"] == max(1, len(payload) // 1024)


def test_unsupported_gif_variant_falls_back_to_fake():
    """A real GIF header with an unsupported feature (interlace flag)
    raises NotImplementedError inside decode_gif; decode_media
    degrades to the fake instead of failing the job."""
    import pytest

    from peerdb_cdc_psql_clickhouse_spark.operators.multimodal import (
        decode_gif,
    )

    # minimal header + image descriptor with interlace bit set
    hdr = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    hdr += bytes([0, 0, 0, 255, 255, 255])  # 2-entry GCT
    img = b"," + struct.pack("<HHHHB", 0, 0, 2, 2, 0x40)  # interlaced
    payload = hdr + img + b"\x02\x00;"
    with pytest.raises(NotImplementedError):
        decode_gif(payload)
    meta = decode_media(payload, "image/gif")
    assert meta["frame_count"] == max(1, len(payload) // 1024)
