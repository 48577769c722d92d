"""Pure-Python/NumPy baseline-TIFF codec — decode + encode + resize.

TIFF 6.0 (public Adobe spec) baseline subset — the shapes scanners and
document pipelines actually emit:

  * both byte orders (``II``/``MM``), classic 42-magic headers;
  * IFD0 tag walk (width, length, bits/sample, compression, photometric,
    strip offsets/counts, rows-per-strip, samples/pixel);
  * 8-bit grayscale (PhotometricInterpretation 0 — WhiteIsZero — and 1)
    and 8-bit RGB, single- or multi-strip;
  * Compression 1 (none) and 32773 (PackBits, §9) — the baseline set.

Everything here is derivable from structure alone (no empirical constant
tables), so a from-scratch implementation is safe — unlike lossy VP8/MP3,
whose honest seam stands. LZW/JPEG-in-TIFF route through the documented
containment pass-through. The encoder always writes little-endian
uncompressed chunky strips; decode(encode(x)) == x exactly.
"""

from __future__ import annotations

import struct

import numpy as np

from .png_codec import resize_nearest


class TiffError(ValueError):
    pass


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd_values(data: bytes, bo: str, entry: tuple[int, int, bytes]) -> list[int]:
    typ, cnt, raw = entry
    unit = _TYPE_SIZE.get(typ)
    if unit is None:
        raise TiffError(f"unsupported field type {typ}")
    total = unit * cnt
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(data):
            raise TiffError("field value overruns file")
        buf = data[off : off + total]
    if typ == 3:
        return list(struct.unpack(bo + f"{cnt}H", buf))
    if typ == 4:
        return list(struct.unpack(bo + f"{cnt}I", buf))
    if typ == 1:
        return list(buf)
    raise TiffError(f"unsupported field type {typ} for a required tag")


def unpackbits(src: bytes, expected: int) -> bytes:
    """TIFF §9 PackBits: n in [0,127] → copy n+1 literals; n in [-127,-1]
    → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                raise TiffError("PackBits run truncated")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise TiffError("PackBits output short")
    return bytes(out[:expected])


def packbits(src: bytes) -> bytes:
    """Greedy PackBits encoder (runs ≥3 become replicate runs)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        run = 1
        while i + run < n and run < 128 and src[i + run] == src[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, src[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and src[i + run] == src[i]:
                run += 1
            if run >= 3:
                break
            i += run
            if i - lit_start >= 128:
                i = lit_start + 128
                break
        out += bytes([i - lit_start - 1]) + src[lit_start:i]
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (H, W) grayscale or (H, W, 3) RGB uint8."""
    if len(data) < 8:
        raise TiffError("too short")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise TiffError("bad magic")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise TiffError("IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    entries: dict[int, tuple[int, int, bytes]] = {}
    p = ifd_off + 2
    for _ in range(n_entries):
        if p + 12 > len(data):
            raise TiffError("truncated IFD")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, p)
        entries[tag] = (typ, cnt, data[p + 8 : p + 12])
        p += 12

    def req(tag: int) -> list[int]:
        if tag not in entries:
            raise TiffError(f"missing required tag {tag}")
        return _read_ifd_values(data, bo, entries[tag])

    def opt(tag: int, default: list[int]) -> list[int]:
        return _read_ifd_values(data, bo, entries[tag]) if tag in entries else default

    width = req(256)[0]
    height = req(257)[0]
    bits = opt(258, [8])
    compression = opt(259, [1])[0]
    photometric = opt(262, [1])[0]
    offsets = req(273)
    spp = opt(277, [1])[0]
    rows_per_strip = opt(278, [height])[0] or height
    counts = req(279)
    if any(b != 8 for b in bits):
        raise TiffError(f"unsupported bits/sample {bits}")
    if compression not in (1, 32773):
        raise TiffError(f"unsupported compression {compression}")
    if photometric not in (0, 1, 2):
        raise TiffError(f"unsupported photometric {photometric}")
    if photometric == 2 and spp < 3:
        raise TiffError("RGB needs >= 3 samples/pixel")
    if len(offsets) != len(counts):
        raise TiffError("strip offsets/counts mismatch")
    if width <= 0 or height <= 0:
        raise TiffError("bad dimensions")

    stride = width * spp
    raw = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise TiffError("strip overruns file")
        rows = min(rows_per_strip, remaining_rows)
        expected = rows * stride
        chunk = data[off : off + cnt]
        if compression == 32773:
            chunk = unpackbits(chunk, expected)
        if len(chunk) < expected:
            raise TiffError("strip data short")
        raw += chunk[:expected]
        remaining_rows -= rows
    if remaining_rows > 0:
        raise TiffError("strips cover fewer rows than ImageLength")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(height, width, spp)
    if photometric == 2:
        return arr[:, :, :3].copy()
    gray = arr[:, :, 0].copy()
    if photometric == 0:  # WhiteIsZero
        gray = (255 - gray.astype(np.int16)).astype(np.uint8)
    return gray


def encode_tiff(
    arr: np.ndarray, compression: int = 1, rows_per_strip: int | None = None
) -> bytes:
    """(H, W[, 3]) uint8 → little-endian baseline TIFF (BlackIsZero gray or
    RGB), uncompressed or PackBits, multi-strip when asked."""
    if arr.ndim == 2:
        h, w = arr.shape
        spp, photometric = 1, 1
        flat_rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        spp, photometric = 3, 2
        flat_rows = arr.reshape(h, w * 3)
    else:
        raise TiffError("expected (H,W) or (H,W,3) uint8")
    if compression not in (1, 32773):
        raise TiffError("encoder supports none/PackBits only")
    rps = rows_per_strip or h
    strips: list[bytes] = []
    for r0 in range(0, h, rps):
        block = flat_rows[r0 : r0 + rps].astype(np.uint8).tobytes()
        strips.append(packbits(block) if compression == 32773 else block)

    bo = "<"
    n_strips = len(strips)
    #: layout: header(8) | IFD | [offset/count arrays if >2 entries] |
    #: [bits array for RGB] | strip data
    tags: list[tuple[int, int, int, int | bytes]] = []

    def short_val(v: int) -> bytes:
        return struct.pack(bo + "HH", v, 0)

    def long_val(v: int) -> bytes:
        return struct.pack(bo + "I", v)

    n_tags = 9
    ifd_size = 2 + 12 * n_tags + 4
    after_ifd = 8 + ifd_size
    extra = b""

    if spp == 3:
        bits_off = after_ifd + len(extra)
        extra += struct.pack(bo + "3H", 8, 8, 8)
        bits_entry: int | bytes = long_val(bits_off)
        bits_cnt = 3
    else:
        bits_entry = short_val(8)
        bits_cnt = 1

    if n_strips > 1:
        off_arr_off = after_ifd + len(extra)
        extra += b"\x00" * (4 * n_strips)  # patched below
        cnt_arr_off = after_ifd + len(extra)
        extra += struct.pack(bo + f"{n_strips}I", *[len(s) for s in strips])
    data_start = after_ifd + len(extra)
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    if n_strips > 1:
        packed = struct.pack(bo + f"{n_strips}I", *strip_offsets)
        rel = off_arr_off - after_ifd
        extra = extra[:rel] + packed + extra[rel + 4 * n_strips :]
        offsets_entry: tuple[int, int, int | bytes] = (4, n_strips, long_val(off_arr_off))
        counts_entry: tuple[int, int, int | bytes] = (4, n_strips, long_val(cnt_arr_off))
    else:
        offsets_entry = (4, 1, long_val(strip_offsets[0]))
        counts_entry = (4, 1, long_val(len(strips[0])))

    tags = [
        (256, 4, 1, long_val(w)),
        (257, 4, 1, long_val(h)),
        (258, 3, bits_cnt, bits_entry),
        (259, 3, 1, short_val(compression)),
        (262, 3, 1, short_val(photometric)),
        (273, *offsets_entry),
        (277, 3, 1, short_val(spp)),
        (278, 4, 1, long_val(rps)),
        (279, *counts_entry),
    ]
    ifd = struct.pack(bo + "H", len(tags))
    for tag, typ, cnt, val in sorted(tags):
        ifd += struct.pack(bo + "HHI", tag, typ, cnt)
        ifd += val if isinstance(val, bytes) else struct.pack(bo + "I", val)
    ifd += struct.pack(bo + "I", 0)
    header = b"II" + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8)
    return header + ifd + extra + b"".join(strips)


def resize_tiff_bytes(data: bytes, target_w: int, target_h: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode (uncompressed LE) —
    the same drop-in contract as the PNG/JPEG/GIF resize kernels."""
    return encode_tiff(resize_nearest(decode_tiff(data), target_w, target_h))
