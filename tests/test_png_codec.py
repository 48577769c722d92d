"""Pure-stdlib PNG codec + real resample path (operators/png_codec.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from autoextract.operators.png_codec import (
    decode_png,
    encode_png,
    resize_nearest,
    resize_png_bytes,
)


def _random_rgb(h, w, seed=7):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_encode_decode_roundtrip_rgb():
    img = _random_rgb(37, 53)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_encode_decode_roundtrip_gray_and_rgba():
    gray = np.random.RandomState(1).randint(0, 256, (16, 9), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    assert out.shape == (16, 9, 1) and np.array_equal(out[:, :, 0], gray)
    rgba = np.random.RandomState(2).randint(0, 256, (8, 12, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_decode_all_filter_types():
    """Hand-build one PNG using every scanline filter; the decoder must
    reconstruct the same pixels as the filter-0 reference encoding."""
    img = _random_rgb(5, 7, seed=3)
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int32)
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        up = rows[y - 1] if y else np.zeros(w * c, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]])
        up_left = np.concatenate([np.zeros(c, dtype=np.int32), up[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - up) & 0xFF
        elif f == 3:
            enc = (cur - ((left + up) >> 1)) & 0xFF
        else:
            p = left + up - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left)
            )
            enc = (cur - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png(w, h, depth, ctype, raw, interlace=0, extra=b""):
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
        + extra
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decode_palette_and_trns():
    """Color type 3: 4-bit indices → PLTE lookup; tRNS adds per-index
    alpha (RGBA out)."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], np.uint8)  # 5 wide
    raw = bytearray()
    for row in idx:  # pack 4-bit big-endian within bytes, filter 0
        packed = bytearray()
        for i in range(0, len(row), 2):
            hi = int(row[i]) << 4
            lo = int(row[i + 1]) if i + 1 < len(row) else 0
            packed.append(hi | lo)
        raw += bytes([0]) + bytes(packed)
    data = _png(5, 2, 4, 3, raw, extra=_chunk(b"PLTE", pal.tobytes()))
    out = decode_png(data)
    assert out.shape == (2, 5, 3)
    assert np.array_equal(out, pal[idx])
    # with tRNS: index 0 transparent, others default opaque
    data_t = _png(5, 2, 4, 3, raw,
                  extra=_chunk(b"PLTE", pal.tobytes()) + _chunk(b"tRNS", b"\x00"))
    out_t = decode_png(data_t)
    assert out_t.shape == (2, 5, 4)
    assert np.array_equal(out_t[:, :, :3], pal[idx])
    assert np.array_equal(out_t[:, :, 3], np.where(idx == 0, 0, 255))


def test_decode_16bit_and_1bit():
    # 16-bit gray: decoder keeps the high byte
    hi = np.array([[10, 200], [99, 7]], np.uint8)
    raw = bytearray()
    for row in hi:
        raw += bytes([0])
        for v in row:
            raw += bytes([int(v), 0xAB])  # low byte arbitrary
    assert np.array_equal(decode_png(_png(2, 2, 16, 0, raw))[:, :, 0], hi)
    # 1-bit gray scales to 0/255
    bits = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1]], np.uint8)  # 9 px: 2 bytes
    packed = bytes([0, 0b10101100, 0b10000000])
    out = decode_png(_png(9, 1, 1, 0, packed))
    assert np.array_equal(out[0, :, 0], bits[0] * 255)


def test_decode_adam7_interlaced():
    """Adam7: seven independently-filtered passes scatter back to exactly
    the progressive-order pixels (checked against a reference scatter)."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (9, 10, 3), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub.reshape(sub.shape[0], -1):
            raw += bytes([0]) + row.tobytes()
    out = decode_png(_png(10, 9, 8, 2, raw, interlace=1))
    assert np.array_equal(out, img)


def test_resize_nearest_dims_and_identity():
    img = _random_rgb(40, 60)
    small = resize_nearest(img, 30, 20)
    assert small.shape == (20, 30, 3)
    assert np.array_equal(resize_nearest(img, 60, 40), img)


def test_resize_png_bytes_real_pixels():
    img = _random_rgb(64, 48)
    out = decode_png(resize_png_bytes(encode_png(img), 24, 32))
    assert out.shape == (32, 24, 3)
    # nearest-neighbor of an exact 2x downscale picks real source pixels
    assert np.array_equal(out, img[1::2, 1::2])


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_resize_image_plan_parity(spark):
    """Driver contract for VERDICT r1 #9: the resized PNG payload DECODES to
    exactly the dims resize_plan computed (policy math == byte reality)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from autoextract.operators.multimodal import (
        decode_image_meta,
        resize_image,
        resize_plan,
    )

    big = encode_png(_random_rgb(2000, 1600, seed=9))  # long edge 2000 > 1568
    small = encode_png(_random_rgb(100, 80, seed=10))
    media = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["big", "small"], "payload": [big, small]}),
        schema="media_ref string, payload binary",
    )
    plan = {
        r["media_ref"]: (r["target_width"], r["target_height"])
        for r in resize_plan(decode_image_meta(media)).collect()
    }
    out = {r["media_ref"]: r for r in resize_image(media).collect()}
    assert out["big"]["resized"] and not out["small"]["resized"]
    dec = decode_png(bytes(out["big"]["payload"]))
    assert (dec.shape[1], dec.shape[0]) == plan["big"]
    assert bytes(out["small"]["payload"]) == small  # untouched under the cap
