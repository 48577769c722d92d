"""Pure-Python + NumPy baseline JPEG codec (ITU-T T.81, public spec).

Closes the last codec gap in the multimodal family (P2 in SURVEY.md §2: the
reference resizes uploads with Pillow, ``utils/helpers.py:58-104``; this
container has no Pillow, so r1/r2 passed oversize JPEGs through unresized).
Scope: baseline sequential DCT (SOF0) AND progressive DCT (SOF2, r4 —
T.81 Annex G: DC/AC first passes with spectral selection + successive-
approximation refinement passes, per-component and interleaved scans,
EOB runs), 8-bit, grayscale or YCbCr with 1×1/2×1/2×2 luma sampling,
restart markers on decode; the encoder emits baseline (4:4:4 or 4:2:0) or
a four-scan-kind progressive script with the Annex-K quantization and
Huffman tables — progressive encode→decode is pixel-identical to the
baseline encoding at the same quality (tested). Arithmetic coding and
12-bit precision stay out of scope — callers fall back to pass-through.

Everything per-pixel heavy (DCT/IDCT, color transform, upsampling) is NumPy
matrix math; only the entropy coding walks bits in Python, which is fine for
the resize kernel's per-image granularity (Arrow-batched at the Spark
boundary, swapped for libjpeg-backed Pillow in production).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------------
# shared tables
# ----------------------------------------------------------------------

#: zigzag order: index i in scan order -> (row, col) in the 8×8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

#: Annex K.1 base quantization tables (luminance, chrominance) in RASTER
#: order; ``_scale_qt`` reorders to zigzag — the order DQT segments carry
#: and the entropy coders index
_QT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32,
)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32,
)

#: Annex K.3 Huffman specs: (bits[1..16], values)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

#: 8×8 DCT-II basis matrix: block_dct = _DCT_M @ block @ _DCT_M.T
_k = np.arange(8)
_DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT_M[0, :] *= 1 / np.sqrt(2)


def _huff_encode_table(spec) -> dict[int, tuple[int, int]]:
    """value -> (code, length) from a (bits, values) spec (T.81 C.2)."""
    bits, values = spec
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return table


def _huff_decode_table(bits, values):
    """(code, length) -> value dict for the bit-at-a-time decoder."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


class JpegError(ValueError):
    pass


# ----------------------------------------------------------------------
# decoder
# ----------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resets
                    break
                else:  # real marker: end of scan
                    break
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Drop partial byte and consume one RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_huff(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise JpegError("invalid Huffman code")


def _planes_to_image(full: list, transform: int) -> np.ndarray:
    """Cropped component planes → (H, W, C) uint8 RGB/gray, applying the
    Adobe APP14 color transform: 0 = components direct (RGB, or
    Adobe-inverted CMYK for 4 comps), 1 = YCbCr, 2 = YCCK."""
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[:, :, None]
    if len(full) == 3:
        if transform == 0:  # RGB stored directly (APP14 transform 0)
            return np.clip(np.stack(full, axis=2), 0, 255).astype(np.uint8)
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
    if len(full) == 4:  # CMYK family (Adobe stores components inverted)
        if transform == 2:  # YCCK: YCbCr inverse yields the inverted CMY
            y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
            c = y + 1.402 * cr
            m = y - 0.344136 * cb - 0.714136 * cr
            ye = y + 1.772 * cb
        else:  # transform 0: inverted CMYK direct
            c, m, ye = full[0], full[1], full[2]
        k = full[3]
        r = c * k / 255.0
        g = m * k / 255.0
        b = ye * k / 255.0
        return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
    raise JpegError(f"unsupported component count {len(full)}")


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, C) uint8 array (C = 1 or 3, RGB). Gray, YCbCr,
    direct RGB, and Adobe CMYK/YCCK (APP14) component layouts supported."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    store = None  # progressive coefficient accumulator, one array per comp
    restart_interval = 0
    adobe_transform = None  # APP14 ColorTransform byte, when present
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        # T.81 B.1.1.3: any number of 0xFF fill bytes may pad before a
        # marker — legal in real-world files; skip to the marker byte
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.int32
                )
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(
                    bits, values
                )
                i += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11] if len(seg) > 11 else None
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            if not frame["progressive"]:
                scan_sel = {}
                for c in range(ns):
                    cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan_sel[cs] = (tables >> 4, tables & 0x0F)
                return _decode_scan(
                    data, pos + 2 + seg_len, frame, scan_sel, qt, huff_dc,
                    huff_ac, restart_interval,
                    _resolve_transform(adobe_transform, len(frame["comps"])),
                )
            # progressive: accumulate this scan's coefficient contribution
            # (T.81 Annex G), then continue the marker walk — pixels come
            # only after EOI when every scan has landed
            if store is None:
                store = _coeff_store(frame)
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    i for i, cc in enumerate(frame["comps"]) if cc["id"] == cs
                )
                scan_comps.append((ci, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _progressive_scan(
                data, pos + 2 + seg_len, frame, store, scan_comps,
                ss, se, ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                restart_interval,
            )
            continue
        pos += 2 + seg_len
    if frame is not None and frame.get("progressive") and store is not None:
        return _reconstruct_progressive(
            frame, store, qt,
            _resolve_transform(adobe_transform, len(frame["comps"])),
        )
    raise JpegError("no scan data")


def _resolve_transform(adobe_transform: int | None, nc: int) -> int:
    """APP14 byte when present; else the conventional default — YCbCr for
    3 components, direct (inverted-CMYK) for 4."""
    if adobe_transform is not None:
        return adobe_transform
    return 1 if nc == 3 else 0


def _decode_scan(data, pos, frame, scan_sel, qt, huff_dc, huff_ac, dri,
                 transform=1):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    inv_zz = _ZIGZAG
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(reader, huff_dc[dc_t])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run past block")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[inv_zz] = coeffs * q
                        block = block.reshape(8, 8)
                        pix = _DCT_M.T @ block @ _DCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    # upsample each component to full MCU-padded resolution, then crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = p.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    return _planes_to_image(full, transform)


# ----------------------------------------------------------------------
# progressive decoding (T.81 Annex G): four scan kinds — DC first /
# refinement, AC first / refinement — accumulate into per-component
# coefficient arrays; dequantize + IDCT once after EOI.
# ----------------------------------------------------------------------


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _used_blocks(frame, c) -> tuple[int, int]:
    """Non-interleaved block dims for one component: blocks covering
    ceil(dim * sampling / max_sampling) samples (T.81 A.2.4)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _coeff_store(frame) -> list[np.ndarray]:
    _, _, mcux, mcuy = _frame_geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _progressive_scan(
    data, pos, frame, store, scan_comps, ss, se, ah, al, huff_dc, huff_ac, dri
):
    """Decode ONE progressive scan into the coefficient store; returns the
    position of the terminating marker so the caller resumes its walk."""
    comps = frame["comps"]
    _, _, mcux, mcuy = _frame_geometry(frame)
    reader = _BitReader(data, pos)

    if ss == 0:  # ---- DC scan (interleaved MCU order over scan comps) ----
        if se != 0:
            raise JpegError("DC scan with Se != 0")
        pred = [0] * len(scan_comps)
        if len(scan_comps) == 1:
            ci, dc_t, _ = scan_comps[0]
            bh, bw = _used_blocks(frame, comps[ci])
            units = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
            per_unit = 1
        else:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for si, (ci, _, _) in enumerate(scan_comps):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                units.append(
                                    (si, my * c["v"] + by, mx * c["h"] + bx)
                                )
            per_unit = sum(
                comps[ci]["v"] * comps[ci]["h"] for ci, _, _ in scan_comps
            )
        mcu_i = 0
        for ui, (si, by, bx) in enumerate(units):
            if len(scan_comps) == 1:
                ci, dc_t, _ = scan_comps[0]
            else:
                ci, dc_t, _ = scan_comps[si]
            if dri and ui and ui % (dri * per_unit if len(scan_comps) > 1 else dri) == 0:
                reader.align_restart()
                pred = [0] * len(scan_comps)
            block = store[ci][by, bx]
            if ah == 0:
                t = _decode_huff(reader, huff_dc[dc_t])
                diff = _extend(reader.read_bits(t), t)
                pi = si if len(scan_comps) > 1 else 0
                pred[pi] += diff
                block[0] = pred[pi] << al
            else:  # refinement: one raw bit per block
                if reader.read_bit():
                    block[0] |= 1 << al
        return reader.pos

    # ---- AC scan: exactly one component, raster over its used blocks ----
    if len(scan_comps) != 1:
        raise JpegError("AC scan must be single-component")
    ci, _, ac_t = scan_comps[0]
    table = huff_ac[ac_t]
    bh, bw = _used_blocks(frame, comps[ci])
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    bi = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and bi and bi % dri == 0:
                reader.align_restart()
                eobrun = 0
            bi += 1
            block = store[ci][by, bx]
            if ah == 0:  # ---- AC first pass ----
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_huff(reader, table)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:  # EOBn: run of 2^r + bits blocks
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise JpegError("AC run past band")
                    block[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
                continue
            # ---- AC refinement pass (libjpeg decode_mcu_AC_refine) ----
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(reader, table)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r)
                            if r:
                                eobrun += reader.read_bits(r)
                            break  # remaining corrections below
                        # r == 15: ZRL — skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise JpegError("AC refinement s != 1")
                        newval = p1 if reader.read_bit() else m1
                    # advance past r zero-history coeffs, emitting a
                    # correction bit for every nonzero-history coeff passed
                    while k <= se:
                        coef = block[k]
                        if coef != 0:
                            if reader.read_bit() and (coef & p1) == 0:
                                block[k] = coef + (p1 if coef >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        block[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:  # corrections through the rest of the band
                    coef = block[k]
                    if coef != 0 and reader.read_bit() and (coef & p1) == 0:
                        block[k] = coef + (p1 if coef >= 0 else m1)
                    k += 1
                eobrun -= 1
    return reader.pos


def _reconstruct_progressive(frame, store, qt, transform=1) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    inv_zz = _ZIGZAG
    full = []
    for ci, c in enumerate(comps):
        coeffs = store[ci]  # (bh, bw, 64) zigzag-ordered
        bh, bw = coeffs.shape[:2]
        deq = coeffs.astype(np.float64) * qt[c["tq"]][None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, inv_zz] = deq
        blocks = nat.reshape(bh, bw, 8, 8)
        # vectorized IDCT over every block: M^T · B · M
        pix = np.einsum("ij,xyjk,kl->xyil", _DCT_M.T, blocks, _DCT_M) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if c["h"] != hmax or c["v"] != vmax:
            plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    return _planes_to_image(full, transform)


# ----------------------------------------------------------------------
# encoder
# ----------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """Raster-order Annex-K base table → quality-scaled table in ZIGZAG
    order (libjpeg's linear quality scaling)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base[_ZIGZAG] * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _mag_bits(v: int) -> tuple[int, int]:
    """value -> (size, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    coeffs = _DCT_M @ (block - 128.0) @ _DCT_M.T
    zz = np.rint(coeffs.reshape(64)[_ZIGZAG] / q).astype(np.int32)
    diff = int(zz[0]) - pred
    size, bits = _mag_bits(diff)
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    last = int(last_nz[-1]) + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _mag_bits(v)
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane up to (ph, pw)."""
    h, w = plane.shape
    p = np.empty((ph, pw), dtype=np.float64)
    p[:h, :w] = plane
    if ph > h:
        p[h:, :w] = plane[-1:, :]
    if pw > w:
        p[:, w:] = p[:, w - 1 : w]
    return p


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    adobe_transform: int | None = None,
) -> bytes:
    """(H, W) / (H, W, 1) grayscale, (H, W, 3) RGB, or (H, W, 4)
    Adobe-domain CMYK/YCCK components → baseline JPEG with Annex-K tables
    scaled by ``quality``. ``subsampling`` is ``4:4:4`` or ``4:2:0``
    (2×2-averaged chroma — the real-world default, and the interleaved-MCU
    shape external decoders expect); ``restart_interval`` emits DRI + RSTn
    markers every N MCUs. Four-channel input is stored AS GIVEN (the caller
    supplies Adobe-inverted CMYK or YCCK planes) and stamped with an APP14
    Adobe marker carrying ``adobe_transform`` (default 0 = direct)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3, 4):
        raise JpegError("encode supports 1, 3, or 4 channels")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise JpegError(f"unsupported subsampling {subsampling}")
    arr = arr.astype(np.float64)
    if nc == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
        hv = {"4:2:0": [(2, 2), (1, 1), (1, 1)],
              "4:2:2": [(2, 1), (1, 1), (1, 1)]}.get(subsampling, [(1, 1)] * 3)
    elif nc == 4:  # Adobe-domain planes stored directly, no subsampling
        chans = [arr[:, :, c] for c in range(4)]
        hv = [(1, 1)] * 4
        if adobe_transform is None:
            adobe_transform = 0
    else:
        chans = [arr[:, :, 0]]
        hv = [(1, 1)]
    hmax = max(f[0] for f in hv)
    vmax = max(f[1] for f in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component planes at their own sampling resolution, MCU-grid padded
    planes = []
    for ci, ch in enumerate(chans):
        fh, fv = hv[ci]
        if (fh, fv) != (hmax, vmax):
            # downsample by block mean (pad to even first)
            sy, sx = vmax // fv, hmax // fh
            ph = -(-ch.shape[0] // sy) * sy
            pw = -(-ch.shape[1] // sx) * sx
            p = _pad_to(ch, ph, pw)
            ch = p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        planes.append(_pad_to(ch, mcuy * 8 * hv[ci][1], mcux * 8 * hv[ci][0]))

    qts = [_scale_qt(_QT_LUMA, quality)]
    if nc == 3:
        qts.append(_scale_qt(_QT_CHROMA, quality))
    dc_tabs = [_huff_encode_table(_DC_LUMA_SPEC), _huff_encode_table(_DC_CHROMA_SPEC)]
    ac_tabs = [_huff_encode_table(_AC_LUMA_SPEC), _huff_encode_table(_AC_CHROMA_SPEC)]

    #: quant/huffman table id per component (4-comp: luma tables for all)
    tids = [min(c, 1) if nc == 3 else 0 for c in range(nc)]

    out = bytearray(b"\xff\xd8")
    if adobe_transform is not None:  # APP14 Adobe color-transform marker
        out += (
            b"\xff\xee" + struct.pack(">H", 14)
            + b"Adobe\x00\x64\x00\x00\x00\x00" + bytes([adobe_transform])
        )
    # DQT
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in q)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, (hv[c][0] << 4) | hv[c][1], tids[c]])
    # DHT
    for tc, specs in ((0, (_DC_LUMA_SPEC, _DC_CHROMA_SPEC)),
                      (1, (_AC_LUMA_SPEC, _AC_CHROMA_SPEC))):
        for th in range(2 if nc == 3 else 1):
            bits, values = specs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, (tids[c] << 4) | tids[c]])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + rst])
                bw = _BitWriter()
                rst = (rst + 1) % 8
                preds = [0] * nc
            for ci in range(nc):
                t = tids[ci]
                fh, fv = hv[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qts[t], dc_tabs[t], ac_tabs[t], preds[ci]
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _emit_ac_first(bwr, zzb, ss, se, al, tab) -> None:
    """One block of an AC first-pass scan (G.1.2.2): run/size coding of the
    point-transformed band, per-block EOB (no cross-block EOB runs)."""
    run = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(zzb[k])
        v = (abs(v) >> al) * (1 if v > 0 else -1)  # sign-magnitude shift
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = tab[0xF0]
            bwr.write(code, length)
            run -= 16
        size, bits = _mag_bits(v)
        code, length = tab[(run << 4) | size]
        bwr.write(code, length)
        bwr.write(bits, size)
        run = 0
        wrote = True
    if run > 0 or not wrote:
        code, length = tab[0x00]  # EOB (run of exactly one block)
        bwr.write(code, length)


def _emit_ac_refine(bwr, zzb, ss, se, al, tab) -> None:
    """One block of an AC refinement scan (G.1.2.3, libjpeg
    encode_mcu_AC_refine): newly-nonzero coeffs code as (run,1)+sign,
    history-nonzero coeffs append correction bits after the next emitted
    symbol, trailing state flushes under an EOB."""
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        v = int(zzb[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        # Flush pending zero-runs before ANY nonzero coeff (libjpeg
        # encode_mcu_AC_refine runs the r>15 ZRL loop ahead of the
        # history-nonzero branch): a correction bit buffered past an
        # unflushed ZRL would be emitted where the decoder never reads it.
        while r > 15:
            code, length = tab[0xF0]
            bwr.write(code, length)
            r -= 16
            for bit in br:
                bwr.write(bit, 1)
            br = []
        if a > 1:  # nonzero in history: one correction bit
            br.append(a & 1)
            continue
        code, length = tab[(r << 4) | 1]
        bwr.write(code, length)
        bwr.write(1 if v > 0 else 0, 1)
        for bit in br:
            bwr.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        code, length = tab[0x00]
        bwr.write(code, length)
        for bit in br:
            bwr.write(bit, 1)


def encode_progressive_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, C]) uint8 → PROGRESSIVE JPEG (SOF2) exercising all four scan
    kinds: interleaved DC first pass at Al=1, per-component AC first passes
    at Al=1, a DC refinement (raw bits) and per-component AC refinements
    down to Al=0. Quantized coefficients are identical to ``encode_jpeg``'s
    at the same quality, so the decoded pixels are bit-identical to the
    baseline encoding's (round-trip pinned by tests). ``restart_interval``
    emits DRI + RSTn markers in every scan kind — intervals are MCUs for
    the interleaved DC scans, BLOCKS for the single-component AC scans
    (T.81: the restart interval unit follows the scan's data unit)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise JpegError("encode supports 1 or 3 channels")
    arr = arr.astype(np.float64)
    if nc == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
        hv = {"4:2:0": [(2, 2), (1, 1), (1, 1)],
              "4:2:2": [(2, 1), (1, 1), (1, 1)]}.get(subsampling, [(1, 1)] * 3)
    else:
        chans = [arr[:, :, 0]]
        hv = [(1, 1)]
    hmax = max(f[0] for f in hv)
    vmax = max(f[1] for f in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for ci, ch in enumerate(chans):
        fh, fv = hv[ci]
        if (fh, fv) != (hmax, vmax):
            sy, sx = vmax // fv, hmax // fh
            ph = -(-ch.shape[0] // sy) * sy
            pw = -(-ch.shape[1] // sx) * sx
            p = _pad_to(ch, ph, pw)
            ch = p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        planes.append(_pad_to(ch, mcuy * 8 * hv[ci][1], mcux * 8 * hv[ci][0]))

    qts = [_scale_qt(_QT_LUMA, quality)]
    if nc == 3:
        qts.append(_scale_qt(_QT_CHROMA, quality))
    dc_tabs = [_huff_encode_table(_DC_LUMA_SPEC), _huff_encode_table(_DC_CHROMA_SPEC)]
    ac_tabs = [_huff_encode_table(_AC_LUMA_SPEC), _huff_encode_table(_AC_CHROMA_SPEC)]

    # quantized zigzag coefficients per component, vectorized forward DCT
    zzq = []
    used = []
    frame_geom = {"w": w, "h": h,
                  "comps": [{"h": hv[c][0], "v": hv[c][1]} for c in range(nc)]}
    for ci in range(nc):
        plane = planes[ci]
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,xyjk,kl->xyil", _DCT_M, blocks - 128.0, _DCT_M.T)
        q = qts[min(ci, 1)]
        zzq.append(
            np.rint(coef.reshape(bh, bw_, 64)[:, :, _ZIGZAG] / q).astype(np.int32)
        )
        used.append(_used_blocks(frame_geom, frame_geom["comps"][ci]))

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)  # SOF2
    for c in range(nc):
        out += bytes([c + 1, (hv[c][0] << 4) | hv[c][1], min(c, 1)])
    for tc, specs in ((0, (_DC_LUMA_SPEC, _DC_CHROMA_SPEC)),
                      (1, (_AC_LUMA_SPEC, _AC_CHROMA_SPEC))):
        for th in range(2 if nc == 3 else 1):
            bits, values = specs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)

    def sos_header(comps_t, ss, se, ah, al) -> bytes:
        hdr = struct.pack(">HB", 6 + 2 * len(comps_t), len(comps_t))
        for cid, tbl in comps_t:
            hdr += bytes([cid, tbl])
        return b"\xff\xda" + hdr + bytes([ss, se, (ah << 4) | al])

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def rst_break(bwr, rst):
        """Flush the entropy segment and emit the next RSTn."""
        bwr.flush()
        out.extend(bwr.out)
        out.extend(bytes([0xFF, 0xD0 + rst]))
        return _BitWriter(), (rst + 1) % 8

    # scan 1: DC first pass, interleaved, Al=1
    out += sos_header([(c + 1, min(c, 1) << 4) for c in range(nc)], 0, 0, 0, 1)
    bwr = _BitWriter()
    preds = [0] * nc
    rst = mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bwr, rst = rst_break(bwr, rst)
                preds = [0] * nc
            mcu_i += 1
            for ci in range(nc):
                for by in range(hv[ci][1]):
                    for bx in range(hv[ci][0]):
                        dc = int(zzq[ci][my * hv[ci][1] + by,
                                         mx * hv[ci][0] + bx, 0]) >> 1
                        size, bits = _mag_bits(dc - preds[ci])
                        code, length = dc_tabs[min(ci, 1)][size]
                        bwr.write(code, length)
                        if size:
                            bwr.write(bits, size)
                        preds[ci] = dc
    bwr.flush()
    out += bwr.out

    # scans 2..1+nc: AC first pass per component, Al=1
    for ci in range(nc):
        out += sos_header([(ci + 1, min(ci, 1))], 1, 63, 0, 1)
        bwr = _BitWriter()
        ubh, ubw = used[ci]
        rst = bi = 0
        for by in range(ubh):
            for bx in range(ubw):
                if restart_interval and bi and bi % restart_interval == 0:
                    bwr, rst = rst_break(bwr, rst)
                bi += 1
                _emit_ac_first(bwr, zzq[ci][by, bx], 1, 63, 1, ac_tabs[min(ci, 1)])
        bwr.flush()
        out += bwr.out

    # DC refinement: one raw bit per block, interleaved
    out += sos_header([(c + 1, 0) for c in range(nc)], 0, 0, 1, 0)
    bwr = _BitWriter()
    rst = mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bwr, rst = rst_break(bwr, rst)
            mcu_i += 1
            for ci in range(nc):
                for by in range(hv[ci][1]):
                    for bx in range(hv[ci][0]):
                        bwr.write(
                            int(zzq[ci][my * hv[ci][1] + by,
                                        mx * hv[ci][0] + bx, 0]) & 1,
                            1,
                        )
    bwr.flush()
    out += bwr.out

    # AC refinement per component, Ah=1 Al=0
    for ci in range(nc):
        out += sos_header([(ci + 1, min(ci, 1))], 1, 63, 1, 0)
        bwr = _BitWriter()
        ubh, ubw = used[ci]
        rst = bi = 0
        for by in range(ubh):
            for bx in range(ubw):
                if restart_interval and bi and bi % restart_interval == 0:
                    bwr, rst = rst_break(bwr, rst)
                bi += 1
                _emit_ac_refine(bwr, zzq[ci][by, bx], 1, 63, 0, ac_tabs[min(ci, 1)])
        bwr.flush()
        out += bwr.out

    out += b"\xff\xd9"
    return bytes(out)


def resize_jpeg_bytes(data: bytes, tw: int, th: int, quality: int = 90) -> bytes:
    """Baseline OR progressive JPEG → nearest-neighbor resize → baseline
    JPEG (the resize kernel's real codec path; raises JpegError on
    unsupported streams so the caller can fall back to pass-through)."""
    from .png_codec import resize_nearest

    arr = decode_jpeg(data)
    if arr.shape[2] == 1:
        resized = resize_nearest(arr[:, :, 0].astype(np.float64), tw, th)
        return encode_jpeg(np.clip(resized, 0, 255).astype(np.uint8), quality)
    chans = [
        resize_nearest(arr[:, :, c].astype(np.float64), tw, th) for c in range(3)
    ]
    out = np.clip(np.stack(chans, axis=2), 0, 255).astype(np.uint8)
    return encode_jpeg(out, quality)
