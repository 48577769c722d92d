"""Pure-Python GIF87a/89a pixel codec (LZW, public spec).

Completes the in-container codec family (PNG: ``png_codec``, baseline JPEG:
``jpeg_codec``): ``multimodal.gif_frames`` already demuxes frame sections;
this module decodes the actual pixels (LZW + palette, interlace supported)
and re-encodes, so oversize single-frame GIFs really resize. The resize
path never quantizes: GIF pixels are palette INDICES, so nearest-neighbor
resampling happens on the index array and the original palette is reused —
output colors are exactly a subset of input colors.

Animated GIFs resize too (r4): every frame's palette-index array is
nearest-neighbor resampled and its descriptor geometry scaled uniformly, so
composition (frame offsets, disposal regions) scales consistently; Graphic
Control Extensions (delays, transparency, disposal) and application
extensions (NETSCAPE looping) are preserved. Uniform per-frame scaling is
exact for composition up to ±1px rounding at frame borders — no disposal
re-compositing needed since all geometry scales by the same factors.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# ----------------------------------------------------------------------
# LZW
# ----------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width from ``min_code_size``+1 up to
    12 bits, CLEAR resets the dictionary, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: GIF packs codes LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    next_code = eoi + 1
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise GifError("corrupt LZW stream")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        out[n_out:] = 0  # tolerate truncated streams (containment)
    return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW compression with dictionary growth + CLEAR resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for px in indices.tobytes():
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: reset (keeps width bounded)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------------
# container
# ----------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.array(order, dtype=np.int64)] = rows
    return out


def decode_gif_indexed(data: bytes):
    """First frame → ``(indices (H,W) uint8, palette (N,3) uint8)``.
    Raises ``GifError`` on non-GIF / missing palette / corrupt streams."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise GifError("not a GIF")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while p < len(data):
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            pos = skip_subblocks(pos + 2)
            continue
        if block != 0x2C:
            break
        # image descriptor
        _, _, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifError("no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data):
            size = data[pos]
            pos += 1
            if size == 0:
                break
            lzw += data[pos : pos + size]
            pos += size
        idx = lzw_decode(bytes(lzw), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        return idx, pal
    raise GifError("no image data")


def decode_gif(data: bytes) -> np.ndarray:
    """First frame → (H, W, 3) uint8 RGB via palette lookup."""
    idx, pal = decode_gif_indexed(data)
    return pal[np.minimum(idx, len(pal) - 1)]


def gif_transparency_index(data: bytes) -> int | None:
    """Transparent color index from the Graphic Control Extension preceding
    the first image descriptor, or ``None`` (no GCE / flag clear). Lets the
    resize path carry transparency through a re-encode instead of silently
    rendering the background as an opaque palette color."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    while pos < len(data):
        if data[pos] != 0x21:  # image descriptor / trailer: no GCE seen
            return None
        label = data[pos + 1] if pos + 1 < len(data) else 0
        if label == 0xF9 and pos + 7 < len(data) and data[pos + 2] == 4:
            return data[pos + 6] if data[pos + 3] & 0x01 else None
        p = pos + 2  # skip this extension's sub-blocks
        while p < len(data):
            size = data[p]
            p += 1
            if size == 0:
                break
            p += size
        pos = p
    return None


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    transparent_index: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a from an index array + (N,3) palette. The palette
    is padded to the next power of two (GIF color tables must be 2^k);
    ``transparent_index`` (when given) is emitted as a Graphic Control
    Extension with the transparency flag set; ``interlace=True`` stores
    rows in the four-pass GIF interlace order with the descriptor flag set
    (pins the decoder's deinterlace path with a real file)."""
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])
    out += pal.tobytes()
    if transparent_index is not None:
        out += b"\x21\xf9\x04\x01\x00\x00" + bytes([transparent_index & 0xFF]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes(
        [0x40 if interlace else 0x00]
    )
    if interlace:  # four-pass row order: 0/8, 4/8, 2/4, 1/2
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        indices = indices[np.array(order)]
    min_code_size = max(bits, 2)
    out += bytes([min_code_size])
    lzw = lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_frame_count(data: bytes) -> int:
    from .multimodal import gif_frames

    return len(gif_frames(data))


def parse_animated_gif(data: bytes):
    """Full container parse → ``(W, H, header_blocks, frames)`` where
    ``header_blocks`` is the LSD packed/bg/aspect triple + raw global color
    table bytes, and each frame dict carries its raw GCE extension (or
    ``b""``), descriptor geometry, local-palette bytes, min code size and
    DECODED index array (deinterlaced). Non-GCE extensions (NETSCAPE loop,
    comments) are collected in encounter order under ``"exts"``."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise GifError("not a GIF")
    W, H = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    gct_block = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct_block = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[dict] = []
    exts: list[bytes] = []
    pending_gce = b""
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            start = pos
            p = pos + 2
            while p < len(data):
                size = data[p]
                p += 1
                if size == 0:
                    break
                p += size
            raw_ext = data[start:p]
            label = data[pos + 1] if pos + 1 < len(data) else 0
            if label == 0xF9:
                pending_gce = raw_ext
            else:
                exts.append(raw_ext)
            pos = p
            continue
        if block != 0x2C:
            raise GifError("unknown block")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        lpal_block = b""
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lpal_block = data[pos : pos + 3 * n]
            pos += 3 * n
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data):
            size = data[pos]
            pos += 1
            if size == 0:
                break
            lzw += data[pos : pos + size]
            pos += size
        idx = lzw_decode(bytes(lzw), min_code_size, fw * fh).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        frames.append(
            {
                "gce": pending_gce,
                "x": fx, "y": fy, "w": fw, "h": fh,
                "ipacked": ipacked,
                "lpal": lpal_block,
                "min_code_size": min_code_size,
                "indices": idx,
            }
        )
        pending_gce = b""
    if not frames:
        raise GifError("no image data")
    return W, H, {"lsd_tail": data[10:13], "gct": gct_block, "exts": exts}, frames


def resize_animated_gif_bytes(data: bytes, tw: int, th: int) -> bytes:
    """Multi-frame GIF resize by UNIFORM per-frame scaling: each frame's
    index array resamples nearest-neighbor and its descriptor geometry
    (offset + size) scales by the same canvas factors, so composition and
    disposal regions stay aligned (±1px rounding). GCEs (delay,
    transparency, disposal) re-emit verbatim before their frames;
    application/comment extensions re-emit after the global color table.
    Palettes are reused exactly — zero quantization, like the single-frame
    path."""
    from .png_codec import resize_nearest

    W, H, header, frames = parse_animated_gif(data)
    sx, sy = tw / max(W, 1), th / max(H, 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", tw, th) + header["lsd_tail"] + header["gct"]
    for ext in header["exts"]:
        out += ext
    for fr in frames:
        nx = min(int(round(fr["x"] * sx)), max(tw - 1, 0))
        ny = min(int(round(fr["y"] * sy)), max(th - 1, 0))
        nw = max(min(int(round(fr["w"] * sx)), tw - nx), 1)
        nh = max(min(int(round(fr["h"] * sy)), th - ny), 1)
        ridx = resize_nearest(fr["indices"], nw, nh).astype(np.uint8)
        out += fr["gce"]
        out += b"\x2c" + struct.pack("<HHHH", nx, ny, nw, nh)
        out += bytes([fr["ipacked"] & 0xBF])  # deinterlaced on decode
        out += fr["lpal"]
        mcs = max(fr["min_code_size"], 2)
        out += bytes([mcs])
        enc = lzw_encode(ridx, mcs)
        for i in range(0, len(enc), 255):
            chunk = enc[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def resize_gif_bytes(data: bytes, tw: int, th: int) -> bytes:
    """GIF → nearest-neighbor resize ON THE INDEX ARRAY(s) → re-encode with
    the ORIGINAL palette(s) (exact color preservation, no quantization).
    Single-frame files keep the minimal one-image shape; animated files go
    through uniform per-frame scaling (``resize_animated_gif_bytes``)."""
    from .png_codec import resize_nearest

    if gif_frame_count(data) != 1:
        return resize_animated_gif_bytes(data, tw, th)
    idx, pal = decode_gif_indexed(data)
    resized = resize_nearest(idx, tw, th)
    # transparency survives the re-encode: the index array carries the
    # transparent index through resize_nearest, and the GCE is re-emitted
    return encode_gif(
        resized.astype(np.uint8), pal, transparent_index=gif_transparency_index(data)
    )
