"""Pure-Python/NumPy BMP codec — decode + encode + resize.

Windows BMP (public format, structure-only — no entropy coding at all):

  * BITMAPFILEHEADER (``BM``, pixel-data offset) + BITMAPINFOHEADER (40-byte
    v3 header, the overwhelmingly common shape);
  * 24-bit BI_RGB (BGR rows, 4-byte row padding) and 8-bit palette;
  * bottom-up (positive height) AND top-down (negative height) row order.

RLE4/RLE8/bitfield variants route through the resize kernel's containment
pass-through. The encoder writes 24-bit bottom-up BI_RGB;
decode(encode(x)) == x exactly.
"""

from __future__ import annotations

import struct

import numpy as np

from .png_codec import resize_nearest


class BmpError(ValueError):
    pass


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) RGB uint8."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    (planes,) = struct.unpack_from("<H", data, 26)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1:
        raise BmpError("planes must be 1")
    if compression != 0:
        raise BmpError(f"unsupported compression {compression}")
    if bpp not in (8, 24):
        raise BmpError(f"unsupported bpp {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpError("bad dimensions")

    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(data):
            raise BmpError("palette overruns file")
        pal = np.frombuffer(data, dtype=np.uint8, count=4 * n_colors, offset=pal_off)
        palette = pal.reshape(n_colors, 4)[:, :3][:, ::-1].copy()  # BGRA → RGB

    stride = (width * (bpp // 8) + 3) & ~3
    need = stride * height
    if pix_off + need > len(data):
        raise BmpError("pixel data short")
    rows = np.frombuffer(data, dtype=np.uint8, count=need, offset=pix_off).reshape(
        height, stride
    )
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        return px[:, :, ::-1].copy()  # BGR → RGB
    idx = rows[:, :width]
    if palette is None or idx.max(initial=0) >= len(palette):
        raise BmpError("palette index out of range")
    return palette[idx]


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 → 24-bit bottom-up BI_RGB BMP."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] < 3:
        raise BmpError("expected (H,W[,3]) uint8")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    bgr = arr[:, :, :3][:, :, ::-1].astype(np.uint8)
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += bgr[r].tobytes() + b"\x00" * pad
    pix_off = 14 + 40
    file_size = pix_off + len(body)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return hdr + bytes(body)


def resize_bmp_bytes(data: bytes, target_w: int, target_h: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode 24-bit BI_RGB."""
    return encode_bmp(resize_nearest(decode_bmp(data), target_w, target_h))
