"""TIFF (baseline none/PackBits) and BMP (24-bit + 8-bit palette) codecs —
the two structure-only raster formats added in late r5. Round-trip
exactness, byte-order/strip/row-order variants, PackBits edge runs, and
the resize + sniffer + metadata integration."""

from __future__ import annotations

import numpy as np
import pytest

from autoextract.operators.bmp_codec import (
    BmpError,
    decode_bmp,
    encode_bmp,
    resize_bmp_bytes,
)
from autoextract.operators.multimodal import _bmp_dims, _tiff_dims, sniff_format
from autoextract.operators.tiff_codec import (
    TiffError,
    decode_tiff,
    encode_tiff,
    packbits,
    resize_tiff_bytes,
    unpackbits,
)


def _img(h, w, c=3, seed=7):
    rng = np.random.RandomState(seed)
    shape = (h, w, c) if c else (h, w)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------- TIFF


def test_tiff_rgb_roundtrip_uncompressed():
    a = _img(13, 17)
    assert np.array_equal(decode_tiff(encode_tiff(a)), a)


def test_tiff_gray_roundtrip_multistrip_packbits():
    a = _img(29, 10, c=0)
    b = encode_tiff(a, compression=32773, rows_per_strip=7)
    assert np.array_equal(decode_tiff(b), a)


def test_tiff_rgb_multistrip():
    a = _img(21, 9)
    b = encode_tiff(a, rows_per_strip=4)
    assert np.array_equal(decode_tiff(b), a)


def test_packbits_runs_and_literals():
    for src in (b"", b"\x00" * 300, b"abcdef", b"aaabccccd" * 40,
                bytes(range(256)) * 3):
        assert unpackbits(packbits(src), len(src)) == src


def test_tiff_big_endian_whitezero():
    # hand-build an MM WhiteIsZero file through the decoder's own parser:
    # encode LE BlackIsZero, then verify an MM fixture via struct swap is
    # out of the encoder's scope — instead verify WhiteIsZero inversion
    # using a crafted II file with photometric=0
    a = _img(5, 4, c=0)
    b = bytearray(encode_tiff(a))
    # patch PhotometricInterpretation (tag 262) SHORT value 1 -> 0
    i = b.find(bytes.fromhex("0601") + b"\x03\x00")  # tag 262 LE + type 3
    assert i > 0
    b[i + 8] = 0
    out = decode_tiff(bytes(b))
    assert np.array_equal(out, 255 - a)


def test_tiff_malformed_contained():
    good = encode_tiff(_img(6, 6))
    for bad in (b"", b"II*\x00", good[:30], b"XX" + good[2:],
                good.replace(b"II", b"QQ", 1)):
        with pytest.raises((TiffError, Exception)):
            decode_tiff(bad)


def test_tiff_resize_and_dims():
    a = _img(40, 60)
    b = encode_tiff(a)
    assert sniff_format(b) == "tiff"
    assert _tiff_dims(b) == (60, 40)
    out = decode_tiff(resize_tiff_bytes(b, 30, 20))
    assert out.shape == (20, 30, 3)


# ----------------------------------------------------------------- BMP


def test_bmp_rgb_roundtrip():
    a = _img(11, 7)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)


def test_bmp_row_padding_widths():
    for w in (1, 2, 3, 4, 5):
        a = _img(3, w)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a)


def test_bmp_topdown_and_palette():
    import struct

    a = _img(4, 6)
    b = bytearray(encode_bmp(a))
    # flip to top-down: negate height and reverse stored row order
    (h,) = struct.unpack_from("<i", b, 22)
    struct.pack_into("<i", b, 22, -h)
    stride = (6 * 3 + 3) & ~3
    pix = b[54:]
    rows = [bytes(pix[i * stride : (i + 1) * stride]) for i in range(4)]
    b[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(b)), a)

    # 8-bit palette: grayscale identity palette
    gray = _img(5, 9, c=0)
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    stride8 = (9 + 3) & ~3
    body = b"".join(
        gray[r].tobytes() + b"\x00" * (stride8 - 9) for r in range(4, -1, -1)
    )
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + 1024 + len(body), 0, 0, 14 + 40 + 1024)
        + struct.pack("<IiiHHIIiiII", 40, 9, 5, 1, 8, 0, len(body), 0, 0, 256, 0)
    )
    out = decode_bmp(hdr + pal + body)
    assert np.array_equal(out, np.stack([gray] * 3, axis=2))


def test_bmp_malformed_contained():
    good = encode_bmp(_img(5, 5))
    for bad in (b"", b"BM", good[:40], good[:60]):
        with pytest.raises((BmpError, Exception)):
            decode_bmp(bad)


def test_bmp_resize_sniff_dims():
    a = _img(50, 80)
    b = encode_bmp(a)
    assert sniff_format(b) == "bmp"
    assert _bmp_dims(b) == (80, 50)
    out = decode_bmp(resize_bmp_bytes(b, 40, 25))
    assert out.shape == (25, 40, 3)


def test_resize_kernel_dispatches_tiff_bmp(spark):
    from autoextract.operators.multimodal import MAX_LONG_EDGE, resize_image

    big = _img(60, MAX_LONG_EDGE + 432)
    rows = [
        ("t1", encode_tiff(big, compression=32773, rows_per_strip=16)),
        ("b1", encode_bmp(big)),
        ("junk", b"BM" + b"\x00" * 60),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r for r in resize_image(df).collect()}
    assert out["t1"]["resized"] and out["b1"]["resized"]
    t = decode_tiff(bytes(out["t1"]["payload"]))
    m = decode_bmp(bytes(out["b1"]["payload"]))
    assert max(t.shape[1], t.shape[0]) == MAX_LONG_EDGE
    assert max(m.shape[1], m.shape[0]) == MAX_LONG_EDGE
    assert not out["junk"]["resized"]
    assert bytes(out["junk"]["payload"]) == rows[2][1]
