"""Pure-Python/NumPy lossless-WebP (VP8L) codec — decode + minimal encode.

Implements the public WebP Lossless Bitstream Specification (RFC 9649):
LSB-first bit reader, simple and code-length-coded canonical prefix codes,
meta prefix (entropy) images, the color cache, LZ77 backward references
with the 120-entry 2D distance mapping, and all four transforms
(PREDICTOR with its 14 modes, cross-COLOR, SUBTRACT_GREEN, COLOR_INDEXING
including sub-byte pixel packing). Lossy VP8 frames have no in-container
decoder and raise ``WebpError`` (the resize kernel then passes the payload
through unmodified — the same honest containment as before this codec
existed). Reference behavior parity notes: the top-right neighbour of a
rightmost-column pixel resolves to the current row's first pixel (the
contiguous-buffer semantics of the reference decoder), and Select's tie
breaks toward LEFT.

The encoder exists to produce REAL fixture files and exercises both
prefix-code forms, literal and LZ77-copy emission, and each transform on
request; it optimizes for coverage, not ratio (balanced canonical codes in
place of true Huffman — legal, complete, and simple).

Reference parity: the reference app whitelists JPG/PNG/GIF/PDF uploads
(``lambda/api/app/services/schema_service.py:225-227``) — WEBP is beyond
its envelope; this codec extends ours because web-scraped corpora carry it.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# ---------------------------------------------------------------- bits


class _BitReader:
    """LSB-first bit reader (VP8L convention, like DEFLATE)."""

    def __init__(self, data: bytes):
        self.d = data
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.bytepos >= len(self.d):
                raise WebpError("bitstream truncated")
            self.acc |= self.d[self.bytepos] << self.nbits
            self.bytepos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


# ------------------------------------------------------- prefix codes

#: storage order of the code-length-code lengths (spec §"prefix code data")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """Symbol → canonical code (MSB-first), DEFLATE-style assignment."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = next_code[l]
            next_code[l] += 1
    return out


class _PrefixCode:
    """Decoder side: bit-at-a-time canonical walk via a code→symbol map
    keyed with a leading sentinel 1 bit (disambiguates lengths)."""

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise WebpError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.map = {}
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.map = {}
        for sym, l in enumerate(lengths):
            if l:
                self.map[(1 << l) | codes[sym]] = sym
        # completeness check (Kraft): an over/under-subscribed code is
        # corrupt input, surface it now rather than desync later
        kraft = sum(2 ** -l for _, l in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise WebpError("incomplete prefix code")

    @classmethod
    def trivial(cls, symbol: int) -> "_PrefixCode":
        pc = cls.__new__(cls)
        pc.single = symbol
        pc.map = {}
        return pc

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 1
        for _ in range(16):
            code = (code << 1) | br.read(1)
            sym = self.map.get(code)
            if sym is not None:
                return sym
        raise WebpError("prefix code desync")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 2:
            sym1 = br.read(8)
            lengths = [0] * alphabet_size
            lengths[sym0] = 1
            lengths[sym1] = 1
            return _PrefixCode(lengths)
        return _PrefixCode.trivial(sym0)
    # code-length-coded form
    num_codes = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        code = clc.decode(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_len = code
        elif code == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif code == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


# -------------------------------------------------------- LZ77 helpers

def _make_dist_map() -> tuple:
    """The 120 near 2D offsets of the distance mapping (spec §"decoding
    the image data"): the closest (dx, dy) neighbours above/left of the
    current pixel, ordered by proximity — Euclidean distance ascending,
    ties broken dy-descending then |dx|-ascending then +dx before -dx
    (the ordering the spec's explicit list follows). dist = dy*width + dx,
    clamped to >= 1. Generated rather than transcribed: encoder and
    decoder share this one construction, so round-trips are exact by
    definition; only an external file using large plane codes depends on
    the tail ordering."""
    cands = [
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-8, 9)
        if dy > 0 or dx > 0
    ]
    cands.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], abs(p[0]), p[0] < 0))
    return tuple(cands[:120])


_DIST_MAP = _make_dist_map()


def _prefix_decode_extra(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding: codes 0-3 mean 1-4; above that,
    (2 + code%2) << extra_bits plus extra bits plus 1."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) → (prefix_code, extra_bits_count, extra_bits_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    highest = v.bit_length() - 1
    second = (v >> (highest - 1)) & 1
    code = 2 * highest + second
    extra = highest - 1
    rest = v & ((1 << extra) - 1)
    return code, extra, rest


def _plane_code_to_distance(width: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    return max(dy * width + dx, 1)


def _cache_key(pixel: int, bits: int) -> int:
    return ((0x1E35A7BD * pixel) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------- decoding


def _decode_entropy_image(br: _BitReader, w: int, h: int, is_level0: bool,
                          transforms: list | None = None) -> np.ndarray:
    """DecodeImageStream: (h*w,) uint32 ARGB pixels. ``transforms`` (only
    at level 0) collects (type, data) for later inversion; sub-images
    recurse with is_level0=False."""
    xsize = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise WebpError("duplicate transform")
            if ttype == 2:  # subtract green
                transforms.append((2, None))
            elif ttype == 0 or ttype == 1:  # predictor / color
                size_bits = br.read(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _decode_entropy_image(br, bw, bh, False)
                transforms.append((ttype, (size_bits, sub)))
            elif ttype == 3:  # color indexing
                n_colors = br.read(8) + 1
                pal_deltas = _decode_entropy_image(br, n_colors, 1, False)
                palette = np.zeros(n_colors, np.uint32)
                # palette entries are component-wise delta-coded
                prev = np.uint32(0)
                for i in range(n_colors):
                    d = int(pal_deltas[i])
                    p = int(prev)
                    cur = (
                        ((((p >> 24) + (d >> 24)) & 0xFF) << 24)
                        | ((((p >> 16) + (d >> 16)) & 0xFF) << 16)
                        | ((((p >> 8) + (d >> 8)) & 0xFF) << 8)
                        | (((p & 0xFF) + (d & 0xFF)) & 0xFF)
                    )
                    palette[i] = cur
                    prev = np.uint32(cur)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, palette)))
                xsize = -(-xsize // (1 << width_bits))
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("bad color cache size")
    # meta prefix image
    meta_bits = 0
    meta_img = None
    num_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta_idx = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        meta_img = meta_idx
        num_groups = int(meta_idx.max()) + 1
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = xsize * h
    out = np.zeros(n, np.uint32)
    pos = 0
    mw = -(-xsize // (1 << meta_bits)) if meta_img is not None else 0
    g_code, r_code, b_code, a_code, d_code = groups[0]
    while pos < n:
        if meta_img is not None:
            x, y = pos % xsize, pos // xsize
            gi = int(meta_img[(y >> meta_bits) * mw + (x >> meta_bits)])
            g_code, r_code, b_code, a_code, d_code = groups[gi]
        s = g_code.decode(br)
        if s < 256:
            r = r_code.decode(br)
            b = b_code.decode(br)
            a = a_code.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 280:
            length = _prefix_decode_extra(br, s - 256)
            dist_code = _prefix_decode_extra(br, d_code.decode(br))
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n:
                raise WebpError("LZ77 reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if cache is None:
                raise WebpError("cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b) // 2).astype(np.uint8)


def _predict(mode: int, l: np.ndarray, t: np.ndarray, tl: np.ndarray,
             tr: np.ndarray) -> np.ndarray:
    """One pixel's prediction; channels as uint8[4] arrays (A,R,G,B)."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], np.uint8)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:  # Select
        p = l.astype(np.int16) + t - tl
        pl = int(np.abs(p - l).sum())
        pt = int(np.abs(p - t).sum())
        return l if pl <= pt else t
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(l.astype(np.int16) + t - tl, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(l, t).astype(np.int16)
        return np.clip(ave + (ave - tl) // 2, 0, 255).astype(np.uint8)
    raise WebpError(f"predictor mode {mode}")


def _px_channels(p: int) -> np.ndarray:
    return np.array([(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF,
                     p & 0xFF], np.uint8)


def _channels_px(c: np.ndarray) -> int:
    return (int(c[0]) << 24) | (int(c[1]) << 16) | (int(c[2]) << 8) | int(c[3])


def _apply_inverse_transforms(pix: np.ndarray, w: int, h: int,
                              transforms: list) -> tuple[np.ndarray, int]:
    """Invert in reverse-read order; returns (pixels, width) — color
    indexing changes the effective width during decode."""
    for ttype, data in reversed(transforms):
        if ttype == 3:  # color indexing: unpack then palette-lookup
            width_bits, palette = data
            if width_bits:
                ppb = 1 << width_bits  # pixels per (green) byte
                bits = 8 >> width_bits
                packed_w = -(-w // ppb)
                greens = ((pix.reshape(h, packed_w) >> 8) & 0xFF).astype(np.uint16)
                idx = np.zeros((h, packed_w * ppb), np.uint16)
                for k in range(ppb):
                    idx[:, k::ppb] = (greens >> (k * bits)) & ((1 << bits) - 1)
                idx = idx[:, :w]
            else:
                idx = ((pix.reshape(h, w) >> 8) & 0xFF).astype(np.uint16)
            if int(idx.max(initial=0)) >= len(palette):
                raise WebpError("palette index out of range")
            pix = palette[idx].reshape(-1).astype(np.uint32)
        elif ttype == 2:  # add green
            g = (pix >> 8) & 0xFF
            r = (((pix >> 16) & 0xFF) + g) & 0xFF
            b = ((pix & 0xFF) + g) & 0xFF
            pix = (pix & 0xFF00FF00) | (r << 16) | b
        elif ttype == 0:  # predictor
            size_bits, sub = data
            bw = -(-w // (1 << size_bits))
            img = pix.reshape(h, w)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = np.array([0xFF, 0, 0, 0], np.uint8)
                    elif y == 0:
                        pred = _px_channels(int(img[0, x - 1]))
                    elif x == 0:
                        pred = _px_channels(int(img[y - 1, 0]))
                    else:
                        mode = (int(sub[(y >> size_bits) * bw
                                        + (x >> size_bits)]) >> 8) & 0xFF
                        l = _px_channels(int(img[y, x - 1]))
                        t = _px_channels(int(img[y - 1, x]))
                        tl = _px_channels(int(img[y - 1, x - 1]))
                        # reference semantics: TR of the last column is the
                        # current row's FIRST pixel (contiguous buffer)
                        tr = (_px_channels(int(img[y, 0])) if x == w - 1
                              else _px_channels(int(img[y - 1, x + 1])))
                        pred = _predict(mode, l, t, tl, tr)
                    cur = _px_channels(int(img[y, x]))
                    img[y, x] = _channels_px((cur + pred) & 0xFF)
            pix = img.reshape(-1)
        elif ttype == 1:  # cross-color
            size_bits, sub = data
            bw = -(-w // (1 << size_bits))
            img = pix.reshape(h, w)
            for y in range(h):
                for x in range(w):
                    elem = int(sub[(y >> size_bits) * bw + (x >> size_bits)])
                    g2r = _signed8(elem & 0xFF)
                    g2b = _signed8((elem >> 8) & 0xFF)
                    r2b = _signed8((elem >> 16) & 0xFF)
                    p = int(img[y, x])
                    a = (p >> 24) & 0xFF
                    r = (p >> 16) & 0xFF
                    g = (p >> 8) & 0xFF
                    b = p & 0xFF
                    r = (r + ((g2r * _signed8(g)) >> 5)) & 0xFF
                    b = (b + ((g2b * _signed8(g)) >> 5)) & 0xFF
                    b = (b + ((r2b * _signed8(r)) >> 5)) & 0xFF
                    img[y, x] = (a << 24) | (r << 16) | (g << 8) | b
            pix = img.reshape(-1)
    return pix, w


def _signed8(v: int) -> int:
    return v - 256 if v >= 128 else v


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes → (H, W, 4) RGBA uint8. Lossless (VP8L) only — a lossy
    VP8 frame raises WebpError (containment pass-through upstream)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WEBP container")
    # chunk walk (handles the plain and VP8X-extended layouts)
    pos = 12
    vp8l = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8L":
            vp8l = data[pos + 8 : pos + 8 + size]
            break
        if tag == b"VP8 ":
            raise WebpError("lossy VP8 has no in-container decoder")
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise WebpError("no VP8L chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    br = _BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebpError("unknown VP8L version")
    transforms: list = []
    pix = _decode_entropy_image(br, w, h, True, transforms)
    pix, _ = _apply_inverse_transforms(pix, w, h, transforms)
    argb = pix.reshape(h, w)
    out = np.zeros((h, w, 4), np.uint8)
    out[:, :, 0] = (argb >> 16) & 0xFF  # R
    out[:, :, 1] = (argb >> 8) & 0xFF   # G
    out[:, :, 2] = argb & 0xFF          # B
    out[:, :, 3] = (argb >> 24) & 0xFF  # A
    return out


# ---------------------------------------------------------- encoding


def _balanced_lengths(used: list[int], alphabet_size: int) -> list[int]:
    """Complete canonical code over ``used`` symbols with near-equal
    lengths: n_short = 2^L - k at L-1 bits, the rest at L (Kraft == 1).
    Compression is irrelevant for fixtures; completeness is mandatory."""
    k = len(used)
    lengths = [0] * alphabet_size
    if k == 1:
        raise ValueError("single-symbol codes must use the simple form")
    L = max((k - 1).bit_length(), 1)
    n_short = (1 << L) - k
    for i, sym in enumerate(sorted(used)):
        lengths[sym] = L - 1 if i < n_short else L
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int],
                       simple_syms: list[int] | None) -> None:
    """Emit either the simple form (1-2 symbols, all < 256) or the
    code-length-coded form (trivial: no 16/17/18 repeats, all 19 CLC slots
    written, no explicit max_symbol)."""
    if simple_syms is not None:
        bw.write(1, 1)  # simple
        bw.write(len(simple_syms) - 1, 1)
        if simple_syms[0] > 1:
            bw.write(1, 1)
            bw.write(simple_syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(simple_syms[0], 1)
        if len(simple_syms) == 2:
            bw.write(simple_syms[1], 8)
        return
    bw.write(0, 1)  # code-length-coded
    used_lens = sorted({l for l in lengths if l} | {0})
    if len(used_lens) == 1:
        clc_lengths = {used_lens[0]: 1, (used_lens[0] + 1) % 16: 1}
    else:
        k = len(used_lens)
        L = max((k - 1).bit_length(), 1)
        n_short = (1 << L) - k
        clc_lengths = {
            v: (L - 1 if i < n_short else L) for i, v in enumerate(used_lens)
        }
    clc_lengths = {v: l for v, l in clc_lengths.items() if l}
    bw.write(15, 4)  # num_codes = 19: every CLC slot written explicitly
    full = [0] * 19
    for v, l in clc_lengths.items():
        full[v] = l
    for i in range(19):
        bw.write(full[_CLC_ORDER[i]], 3)
    codes = _canonical_codes(full)
    bw.write(0, 1)  # no explicit max_symbol: one CLC symbol per slot
    for l in lengths:
        c, cl = codes[l], full[l]
        # write MSB-first
        for i in range(cl - 1, -1, -1):
            bw.write((c >> i) & 1, 1)


class _SymWriter:
    """Canonical-code writer for one alphabet: picks simple vs balanced."""

    def __init__(self, freqs: dict[int, int], alphabet_size: int):
        used = sorted(freqs)
        if not used:
            used = [0]
        self.simple = None
        if len(used) <= 2 and all(s < 256 for s in used):
            self.simple = used
            self.lengths = None
            self.codes = {used[0]: (0, 0)}
            if len(used) == 2:
                self.codes = {used[0]: (0, 1), used[1]: (1, 1)}
        else:
            if len(used) == 1:
                used = used + [(used[0] + 1) % alphabet_size]
            self.lengths = _balanced_lengths(used, alphabet_size)
            canon = _canonical_codes(self.lengths)
            self.codes = {s: (canon[s], self.lengths[s]) for s in used}

    def emit_header(self, bw: _BitWriter) -> None:
        _write_prefix_code(bw, self.lengths or [], self.simple)

    def emit(self, bw: _BitWriter, sym: int) -> None:
        c, l = self.codes[sym]
        for i in range(l - 1, -1, -1):  # MSB-first
            bw.write((c >> i) & 1, 1)


def encode_webp_lossless(
    arr: np.ndarray,
    use_subtract_green: bool = False,
    predictor_mode: int | None = None,
    use_palette: bool = False,
    use_lz77: bool = True,
    color_transform: tuple[int, int, int] | None = None,
    cache_bits: int = 0,
    use_meta: bool = False,
) -> bytes:
    """(H, W, 3|4) uint8 → a REAL VP8L lossless WebP file. Transform flags
    exist so tests can exercise each decoder path; round-trips are exact by
    construction. LZ77 emission covers horizontal runs (distance 1) and
    whole-row copies (distance = width); ``cache_bits`` turns on the color
    cache, ``use_meta`` wraps the codes behind a trivial meta image."""
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    h, w, nc = arr.shape
    if nc == 3:
        a = np.full((h, w), 255, np.uint32)
    else:
        a = arr[:, :, 3].astype(np.uint32)
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    pix = ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if nc == 4 else 0, 1)
    bw.write(0, 3)  # version

    xsize = w
    # ---- transforms (written in order; decoder inverts in reverse) ----
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR_TRANSFORM
        bw.write(1, 3)  # size_bits = 3 → 8px blocks (uniform element anyway)
        elem = ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        img = pix.reshape(h, w)
        out = img.copy()
        for y in range(h):
            for x in range(w):
                p = int(img[y, x])
                rr = (p >> 16) & 0xFF
                gg = (p >> 8) & 0xFF
                bb = p & 0xFF
                # forward transform subtracts deltas computed from the
                # ORIGINAL red (the value the inverse restores first)
                rr2 = (rr - ((_signed8(g2r & 0xFF) * _signed8(gg)) >> 5)) & 0xFF
                bb2 = (bb - ((_signed8(g2b & 0xFF) * _signed8(gg)) >> 5)
                       - ((_signed8(r2b & 0xFF) * _signed8(rr)) >> 5)) & 0xFF
                out[y, x] = (p & 0xFF00FF00) | (rr2 << 16) | bb2
        pix = out.reshape(-1)
        bs = 1 << 3
        bw_sub, bh_sub = -(-w // bs), -(-h // bs)
        _encode_entropy_image(
            bw, np.full(bw_sub * bh_sub, 0xFF000000 | elem, np.uint32),
            use_lz77=False,
        )
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR_TRANSFORM
        size_bits = 4
        bw.write(size_bits - 2, 3)
        bs = 1 << size_bits
        img = pix.reshape(h, w)
        res = img.copy()
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([0xFF, 0, 0, 0], np.uint8)
                elif y == 0:
                    pred = _px_channels(int(img[0, x - 1]))
                elif x == 0:
                    pred = _px_channels(int(img[y - 1, 0]))
                else:
                    l = _px_channels(int(img[y, x - 1]))
                    t = _px_channels(int(img[y - 1, x]))
                    tl = _px_channels(int(img[y - 1, x - 1]))
                    tr = (_px_channels(int(img[y, 0])) if x == w - 1
                          else _px_channels(int(img[y - 1, x + 1])))
                    pred = _predict(predictor_mode, l, t, tl, tr)
                cur = _px_channels(int(img[y, x]))
                res[y, x] = _channels_px((cur.astype(np.int16) - pred) % 256)
        pix = res.reshape(-1)
        bw_sub, bh_sub = -(-w // bs), -(-h // bs)
        _encode_entropy_image(
            bw,
            np.full(bw_sub * bh_sub, 0xFF000000 | (predictor_mode << 8),
                    np.uint32),
            use_lz77=False,
        )
    if use_subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        gch = (pix >> 8) & 0xFF
        rr = (((pix >> 16) & 0xFF) - gch) & 0xFF
        bb = ((pix & 0xFF) - gch) & 0xFF
        pix = (pix & 0xFF00FF00) | (rr << 16) | bb
    if use_palette:
        colors, inv = np.unique(pix, return_inverse=True)
        if len(colors) > 256:
            raise WebpError("palette transform needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), np.uint32)
        prev = 0
        for i, c in enumerate(int(x) for x in colors):
            deltas[i] = (
                ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                | ((((c >> 16) - (prev >> 16)) & 0xFF) << 16)
                | ((((c >> 8) - (prev >> 8)) & 0xFF) << 8)
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = c
        _encode_entropy_image(bw, deltas, use_lz77=False)
        n_colors = len(colors)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        idx = inv.reshape(h, w).astype(np.uint32)
        if width_bits:
            ppb = 1 << width_bits
            bits = 8 >> width_bits
            packed_w = -(-w // ppb)
            padded = np.zeros((h, packed_w * ppb), np.uint32)
            padded[:, :w] = idx
            packed = np.zeros((h, packed_w), np.uint32)
            for k in range(ppb):
                packed |= padded[:, k::ppb] << (k * bits)
            idx = packed
            xsize = packed_w
        pix = (0xFF000000 | (idx << 8)).reshape(-1).astype(np.uint32)
    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(bw, pix, use_lz77=use_lz77, is_level0=True,
                          width=xsize, cache_bits=cache_bits,
                          use_meta=use_meta)
    payload = bw.finish()  # signature byte 0x2F leads the aligned stream

    riff_body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff_body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _encode_entropy_image(bw: _BitWriter, pix: np.ndarray,
                          use_lz77: bool = True,
                          is_level0: bool = False,
                          width: int = 0,
                          cache_bits: int = 0,
                          use_meta: bool = False) -> None:
    """Entropy-code a pixel array. Coverage knobs: ``use_lz77`` emits
    distance-1 run copies AND whole-row copies (distance = width, the 2D
    map's (0,1) entry); ``cache_bits`` > 0 maintains the color cache and
    emits cache symbols for hits; ``use_meta`` wraps the single prefix
    group behind a trivial meta image (exercises the recursion + index
    lookup). Each knob exists so the matching DECODER path is testable
    with real streams."""
    # tokenize
    tokens: list[tuple] = []  # ("lit", px) | ("copy", length, distance)
    n = len(pix)
    i = 0
    cache = [0] * (1 << cache_bits) if cache_bits else None

    def cache_insert(px: int) -> None:
        if cache is not None:
            cache[_cache_key(px, cache_bits)] = px

    while i < n:
        if use_lz77 and width and i >= width and i % width == 0:
            # whole-row copy: this row equals the previous row
            if i + width <= n and np.array_equal(
                pix[i : i + width], pix[i - width : i]
            ):
                tokens.append(("copy", width, width))
                for px in pix[i : i + width]:
                    cache_insert(int(px))
                i += width
                continue
        if use_lz77 and i > 0 and pix[i] == pix[i - 1]:
            j = i
            while j < n and pix[j] == pix[i - 1]:
                j += 1
            run = j - i
            if run >= 3:
                tokens.append(("copy", run, 1))
                for _ in range(run):
                    cache_insert(int(pix[i - 1]))
                i = j
                continue
        px = int(pix[i])
        if cache is not None and cache[_cache_key(px, cache_bits)] == px and i:
            tokens.append(("cache", _cache_key(px, cache_bits)))
        else:
            tokens.append(("lit", px))
        cache_insert(px)
        i += 1
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
            rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
            bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
            af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
        elif tok[0] == "cache":
            s = 280 + tok[1]
            gf[s] = gf.get(s, 0) + 1
        else:
            _, length, dist = tok
            code, _, _ = _prefix_encode(length)
            gf[256 + code] = gf.get(256 + code, 0) + 1
            # distance → plane code: 1 → (1,0) at index 2; width → (0,1)
            # at index 1; both inverted through the SAME map the decoder uses
            plane = 2 if dist == 1 else 1
            dcode, _, _ = _prefix_encode(plane)
            df[dcode] = df.get(dcode, 0) + 1
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)  # no color cache
    if is_level0:
        if use_meta:
            bw.write(1, 1)  # meta prefix codes present
            bw.write(1, 3)  # meta_bits = 3 → 8px meta blocks
            h = -(-n // max(width, 1)) if width else 1
            mw = -(-max(width, 1) // 8)
            mh = -(-h // 8)
            # all-zero meta image → every block uses prefix group 0
            _encode_entropy_image(
                bw, np.full(mw * mh, 0xFF000000, np.uint32), use_lz77=False
            )
        else:
            bw.write(0, 1)  # no meta prefix codes
    gw = _SymWriter(gf, green_size)
    rw = _SymWriter(rf, 256)
    bw_w = _SymWriter(bf, 256)
    aw = _SymWriter(af, 256)
    dw = _SymWriter(df if df else {1: 1}, 40)
    for wtr in (gw, rw, bw_w, aw, dw):
        wtr.emit_header(bw)
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            gw.emit(bw, (v >> 8) & 0xFF)
            rw.emit(bw, (v >> 16) & 0xFF)
            bw_w.emit(bw, v & 0xFF)
            aw.emit(bw, (v >> 24) & 0xFF)
        elif tok[0] == "cache":
            gw.emit(bw, 280 + tok[1])
        else:
            _, length, dist = tok
            code, extra, rest = _prefix_encode(length)
            gw.emit(bw, 256 + code)
            if extra:
                bw.write(rest, extra)
            plane = 2 if dist == 1 else 1
            dcode, dextra, drest = _prefix_encode(plane)
            dw.emit(bw, dcode)
            if dextra:
                bw.write(drest, dextra)


def encode_animated_webp(frames: list[np.ndarray], delays_ms: list[int] | None = None,
                         loop_count: int = 0) -> bytes:
    """Frame arrays → an animated WebP: VP8X extended container with an
    ANIM chunk and one ANMF per frame, each frame a lossless VP8L
    bitstream (full canvas, no blending offsets — the fixture shape that
    exercises the real container demux + per-frame decode)."""
    if not frames:
        raise WebpError("need at least one frame")
    h, w = frames[0].shape[:2]
    delays_ms = delays_ms or [100] * len(frames)
    body = bytearray(b"WEBP")
    # VP8X: feature flags (animation + alpha), canvas size minus one
    body += b"VP8X" + struct.pack("<I", 10)
    body += bytes([0x12, 0, 0, 0])  # ANIM + ALPHA flag bits
    body += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    body += b"ANIM" + struct.pack("<I", 6)
    body += struct.pack("<IH", 0xFFFFFFFF, loop_count)  # bg color, loops
    for arr, delay in zip(frames, delays_ms):
        if arr.shape[:2] != (h, w):
            raise WebpError("all frames must share the canvas size")
        sub = encode_webp_lossless(arr)
        vp8l = sub[12:]  # the "VP8L" chunk (fourcc + size + payload [+pad])
        payload = bytearray()
        payload += (0).to_bytes(3, "little") * 2  # frame x/2, y/2 offsets
        payload += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        payload += delay.to_bytes(3, "little")
        payload += bytes([0])  # no blend, dispose-to-none
        payload += vp8l
        body += b"ANMF" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def webp_frames(data: bytes) -> list[bytes]:
    """REAL container demux for animated WebP (VP8X/ANMF walk): each
    frame comes back as a standalone decodable WebP file (RIFF re-wrap of
    the frame's VP8L/VP8 sub-chunk). A non-animated file returns itself
    as a single frame; non-WebP raises WebpError."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WEBP container")
    frames: list[bytes] = []
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + size]
        if tag == b"ANMF" and len(chunk) >= 16:
            sub = chunk[16:]  # past x/y/w/h/delay/flags → frame sub-chunks
            riff_body = b"WEBP" + sub
            frames.append(
                b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
            )
        elif tag in (b"VP8L", b"VP8 ") and not frames:
            return [data]  # still image: itself as the single frame
        pos += 8 + size + (size & 1)
    return frames


def resize_webp_bytes(data: bytes, target_w: int, target_h: int) -> bytes:
    """Decode (lossless only) → nearest-neighbor resample → re-encode
    lossless. Same drop-in contract as resize_png_bytes."""
    from .png_codec import resize_nearest

    arr = decode_webp(data)
    return encode_webp_lossless(resize_nearest(arr, target_w, target_h))
