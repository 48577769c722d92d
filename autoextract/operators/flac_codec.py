"""Pure-Python FLAC codec — decode + fixture encoder (public RFC 9639 /
xiph.org format spec). The audio twin of ``webp_codec``: it closes the
last hash-stub seam in the audio branch, so FLAC payloads transcode and
embed with REAL samples (``real_feature=true``) instead of falling back.

Decoder envelope: STREAMINFO + any metadata blocks, frames with CONSTANT /
VERBATIM / FIXED(0-4) / LPC(1-32) subframes, Rice residuals (both 4- and
5-bit parameter variants, escape partitions), all four stereo decorrelation
modes (independent, left/side, right/side, mid/side), wasted bits, UTF-8
frame numbers, 4-16-bit sample sizes. Frame CRCs are verified (CRC-8
header, CRC-16 frame); a mismatch raises ``FlacError`` — malformed audio
is contained upstream, never mis-decoded silently.

The encoder emits spec-conformant files for fixtures: per-channel subframe
choice (CONSTANT for flat blocks, FIXED order 2 + Rice otherwise, VERBATIM
on demand), correct CRCs — coverage over ratio. Coverage knobs pin every
decoder branch with a real stream: the three stereo decorrelation modes,
an LPC subframe (coeffs 4,-2 / shift 1 — residual-identical to FIXED 2),
Rice partition orders > 0, escape (raw) partitions, and the 5-bit
parameter method.

Beyond the reference envelope entirely (it has no audio path); built
because web-scale training corpora carry FLAC.
"""

from __future__ import annotations

import struct

import numpy as np


class FlacError(ValueError):
    pass


# ---------------------------------------------------------------- bits


class _MsbReader:
    """MSB-first bit reader (FLAC convention)."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.d = data
        self.pos = pos_bytes * 8  # bit position

    def read(self, n: int) -> int:
        v = 0
        d, pos = self.d, self.pos
        end = pos + n
        if end > len(d) * 8:
            raise FlacError("bitstream truncated")
        while n:
            byte = d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _MsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def finish(self) -> bytes:
        self.align()
        return bytes(self.out)


# ----------------------------------------------------------------- CRC


def _make_crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# -------------------------------------------------------------- tables

_BLOCKSIZE_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8,
                   512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13,
                   16384: 14, 32768: 15}
_SAMPLE_RATE_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                     22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                     96000: 11}
_SAMPLE_SIZE_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _utf8_frame_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded frame/sample number."""
    if n < 0x80:
        return bytes([n])
    out = []
    # standard UTF-8 widths: 2..7 bytes cover up to 36 bits
    for nbytes in range(2, 8):
        if n < (1 << (5 * nbytes + 1)):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _MsbReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FlacError("bad UTF-8 frame number")
    v = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise FlacError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ------------------------------------------------------------- decode


def _decode_residual(br: _MsbReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacError("partition order does not divide block size")
    res: list[int] = []
    for p in range(n_parts):
        count = block_size // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise FlacError("negative partition sample count")
        param = br.read(plen)
        if param == escape:
            raw_bits = br.read(5)
            for _ in range(count):
                res.append(br.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                zz = (q << param) | r
                res.append((zz >> 1) ^ -(zz & 1))  # zigzag → signed
    return res


def _decode_subframe(br: _MsbReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe sync bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted bits flag: unary count - 1
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        samples = [br.read_signed(eff)] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        samples = list(warm)
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - k] for k, c in enumerate(coeffs))
            samples.append(res[i - order] + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coeffs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        samples = list(warm)
        for i in range(order, block_size):
            acc = sum(c * samples[i - 1 - k] for k, c in enumerate(coeffs))
            samples.append(res[i - order] + (acc >> shift))
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def parse_flac_streaminfo(data: bytes) -> dict:
    """fLaC marker + metadata walk → STREAMINFO facts."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:
            if size < 34:
                raise FlacError("short STREAMINFO")
            br = _MsbReader(body)
            info = {
                "min_block": br.read(16),
                "max_block": br.read(16),
                "min_frame": br.read(24),
                "max_frame": br.read(24),
                "sample_rate": br.read(20),
                "n_channels": br.read(3) + 1,
                "bits_per_sample": br.read(5) + 1,
                "total_samples": br.read(36),
                "frames_offset": 0,  # patched below
            }
        pos += 4 + size
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise FlacError("zero sample rate")
    info["frames_offset"] = pos
    return info


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n_frames, n_channels) float64 in [-1, 1],
    sample_rate) — the same contract as ``audio.decode_wav``."""
    info = parse_flac_streaminfo(data)
    n_ch = info["n_channels"]
    sr = info["sample_rate"]
    bps_default = info["bits_per_sample"]
    pos = info["frames_offset"]
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    total = info["total_samples"]
    while pos < len(data) - 2:
        br = _MsbReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code == 6:
            block_size = None  # get 8 bit from end of header
        elif bs_code == 7:
            block_size = None
        else:
            inv = {v: k for k, v in _BLOCKSIZE_CODE.items()}
            block_size = inv.get(bs_code)
            if block_size is None:
                raise FlacError("unknown block size code")
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise FlacError("invalid sample rate code")
        if ss_code in (0,):
            bps = bps_default
        else:
            inv_ss = {v: k for k, v in _SAMPLE_SIZE_CODE.items()}
            bps = inv_ss.get(ss_code)
            if bps is None:
                raise FlacError("reserved sample size code")
        header_bytes = data[pos : br.byte_pos()]
        if _crc8(header_bytes) != br.read(8):
            raise FlacError("frame header CRC mismatch")
        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise FlacError("channel count mismatch")
            subs = []
            for _ in range(n_ch):
                subs.append(_decode_subframe(br, block_size, bps))
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            # side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                right = [l - s for l, s in zip(left, side)]
                subs = [left, right]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, block_size, bps + 1)
                right = _decode_subframe(br, block_size, bps)
                left = [r + s for r, s in zip(right, side)]
                subs = [left, right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise FlacError("reserved channel assignment")
        br.align()
        frame_bytes = data[pos : br.byte_pos()]
        if _crc16(frame_bytes) != br.read(16):
            raise FlacError("frame CRC-16 mismatch")
        for c in range(n_ch):
            channels[c].extend(subs[c])
        pos = br.byte_pos()
        if total and len(channels[0]) >= total:
            break
    x = np.array(channels, np.float64).T
    if total:
        x = x[:total]
    return x / float(1 << (bps_default - 1)), sr


# ------------------------------------------------------------- encode


def _encode_residual(bw: _MsbWriter, res: list[int], order: int = 0,
                     block_size: int = 0, partition_order: int = 0,
                     escape: bool = False, method5: bool = False) -> None:
    """Rice coding with coverage knobs: ``partition_order`` splits the
    residual into 2^k partitions (each with its own parameter),
    ``escape`` stores partitions as raw fixed-width values (the
    0b1111/0b11111 escape), ``method5`` uses the 5-bit-parameter variant.
    Defaults reproduce the original single-partition 4-bit form."""
    plen = 5 if method5 else 4
    esc_code = (1 << plen) - 1
    bw.write(1 if method5 else 0, 2)
    bw.write(partition_order, 4)
    n_parts = 1 << partition_order
    if partition_order and (not block_size or block_size % n_parts):
        raise FlacError("partition order must divide the block size")
    pos = 0
    for p in range(n_parts):
        count = (block_size // n_parts - (order if p == 0 else 0)
                 if partition_order else len(res))
        part = res[pos : pos + count]
        pos += count
        if escape:
            raw_bits = max((v.bit_length() + 1 for v in part), default=1)
            raw_bits = min(raw_bits, 31)
            bw.write(esc_code, plen)
            bw.write(raw_bits, 5)
            for v in part:
                bw.write_signed(v, raw_bits)
            continue
        zz = [(abs(r) << 1) - (1 if r < 0 else 0) for r in part]
        mean = (sum(zz) / max(len(zz), 1)) if zz else 0
        param = 0
        while (1 << param) < mean + 1 and param < esc_code - 1:
            param += 1
        bw.write(param, plen)
        for v in zz:
            q, r = v >> param, v & ((1 << param) - 1)
            if q > 48:  # pathological: unary blowup — not for fixture data
                raise FlacError("rice quotient overflow; use verbatim")
            bw.write_unary(q)
            if param:
                bw.write(r, param)


def _encode_subframe(bw: _MsbWriter, samples: list[int], bps: int,
                     force_verbatim: bool = False, use_lpc: bool = False,
                     partition_order: int = 0, rice_escape: bool = False,
                     method5: bool = False, wasted_bits: int = 0) -> None:
    def _wasted_flag():
        if wasted_bits:
            bw.write(1, 1)
            bw.write_unary(wasted_bits - 1)
        else:
            bw.write(0, 1)

    if wasted_bits:  # caller zeroed the low bits; code the shifted signal
        samples = [s >> wasted_bits for s in samples]
        bps -= wasted_bits
    first = samples[0] if samples else 0
    if not force_verbatim and not use_lpc and all(s == first for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        _wasted_flag()
        bw.write_signed(first, bps)
        return
    if force_verbatim or len(samples) < 3:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        _wasted_flag()
        for s in samples:
            bw.write_signed(s, bps)
        return
    order = 2
    res = [samples[i] - 2 * samples[i - 1] + samples[i - 2]
           for i in range(order, len(samples))]
    try:
        probe = _MsbWriter()
        _encode_residual(probe, res, order, len(samples), partition_order,
                         rice_escape, method5)
    except FlacError:
        _encode_subframe(bw, samples, bps, force_verbatim=True)
        return
    bw.write(0, 1)
    if use_lpc:
        # same 2nd-order predictor expressed as LPC: coeffs (4, -2),
        # shift 1 → prediction (4·s[i-1] − 2·s[i-2]) >> 1 = 2·s[i-1] − s[i-2]
        # — exercises warm-up + precision/shift/coeff parse + the >> path
        bw.write(32 + (order - 1), 6)  # LPC, order 2
        _wasted_flag()
        for s in samples[:order]:
            bw.write_signed(s, bps)
        bw.write(4 - 1, 4)   # precision 4 bits
        bw.write_signed(1, 5)  # shift 1
        bw.write_signed(4, 4)
        bw.write_signed(-2, 4)
    else:
        bw.write(8 + order, 6)  # FIXED order 2
        _wasted_flag()
        for s in samples[:order]:
            bw.write_signed(s, bps)
    _encode_residual(bw, res, order, len(samples), partition_order,
                     rice_escape, method5)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    mid_side: bool = False,
    force_verbatim: bool = False,
    use_lpc: bool = False,
    partition_order: int = 0,
    rice_escape: bool = False,
    method5: bool = False,
    stereo_mode: str | None = None,
    wasted_bits: int = 0,
) -> bytes:
    """(n_frames,) or (n_frames, n_channels) float in [-1, 1] → FLAC.
    Coverage knobs (each pins a decoder branch with a real stream):
    ``stereo_mode`` in {"left_side", "right_side", "mid_side"} (stereo
    only; ``mid_side=True`` is the r5-compat alias), ``use_lpc`` emits the
    2nd-order predictor as an LPC subframe (coeffs 4,-2 / shift 1 —
    numerically identical residuals to FIXED order 2), ``partition_order``
    splits Rice partitions, ``rice_escape`` stores raw fixed-width
    residual partitions, ``method5`` uses 5-bit Rice parameters, and
    ``force_verbatim`` pins the VERBATIM subframe type."""
    if mid_side and stereo_mode is None:
        stereo_mode = "mid_side"
    if samples.ndim == 1:
        samples = samples[:, None]
    n_total, n_ch = samples.shape
    if not 1 <= n_ch <= 8:
        raise FlacError("1-8 channels")
    if block_size not in _BLOCKSIZE_CODE:
        raise FlacError("fixture encoder uses tabled block sizes only")
    q = np.clip(np.rint(samples * (1 << (bps - 1))),
                -(1 << (bps - 1)), (1 << (bps - 1)) - 1).astype(np.int64)
    if wasted_bits:  # force the shared-zero-low-bits property; mid/side
        # halves (l+r), which costs one zero bit — pre-zero one extra
        zb = wasted_bits + (1 if stereo_mode == "mid_side" else 0)
        q &= ~((1 << zb) - 1)
    out = bytearray(b"fLaC")
    si = _MsbWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    body = si.finish() + b"\x00" * 16  # zero MD5 (unset is legal)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last-block

    sr_code = _SAMPLE_RATE_CODE.get(sample_rate, 0)
    ss_code = _SAMPLE_SIZE_CODE[bps]
    frame_no = 0
    for start in range(0, n_total, block_size):
        blk = q[start : start + block_size]
        bs = blk.shape[0]
        bs_code = _BLOCKSIZE_CODE.get(bs, 7)
        hw = _MsbWriter()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)  # fixed block size strategy
        hw.write(bs_code, 4)
        hw.write(sr_code, 4)
        decor = stereo_mode if (stereo_mode and n_ch == 2) else None
        ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}.get(
            decor, n_ch - 1
        )
        hw.write(ch_code, 4)
        hw.write(ss_code, 3)
        hw.write(0, 1)
        header = bytearray(hw.finish())
        header += _utf8_frame_number(frame_no)
        if bs_code == 7:  # uncommon tail block: 16-bit size - 1
            header += struct.pack(">H", bs - 1)
        if sr_code == 0:
            raise FlacError("fixture encoder needs a tabled sample rate")
        header.append(_crc8(bytes(header)))
        fw = _MsbWriter()
        knobs = dict(force_verbatim=force_verbatim, use_lpc=use_lpc,
                     partition_order=partition_order,
                     rice_escape=rice_escape, method5=method5,
                     wasted_bits=wasted_bits)
        if decor:
            left, right = blk[:, 0], blk[:, 1]
            side = (left - right).tolist()
            if decor == "left_side":
                _encode_subframe(fw, left.tolist(), bps, **knobs)
                _encode_subframe(fw, side, bps + 1, **knobs)
            elif decor == "right_side":
                _encode_subframe(fw, side, bps + 1, **knobs)
                _encode_subframe(fw, right.tolist(), bps, **knobs)
            else:  # mid_side
                mid = ((left + right) >> 1).tolist()
                _encode_subframe(fw, mid, bps, **knobs)
                _encode_subframe(fw, side, bps + 1, **knobs)
        else:
            for c in range(n_ch):
                _encode_subframe(fw, blk[:, c].tolist(), bps, **knobs)
        frame = bytes(header) + fw.finish()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
