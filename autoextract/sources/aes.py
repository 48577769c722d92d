"""AES-128/192/256 block cipher + CBC mode, pure NumPy, from the public
FIPS-197 spec — the cipher behind the PDF standard security handler's
AESV2 (V4/R4, AES-128-CBC) and AESV3 (V5/R6, AES-256-CBC) crypt filters
(PDF 32000-1 §7.6.2-7.6.3; the reference opens such files via PyMuPDF,
``lambda/api/app/utils/pdf.py:53-87``).

The ECB core operates on an ``(n_blocks, 16)`` uint8 array with
table-lookup SubBytes and tabled GF(2^8) MixColumns, so CBC *decrypt* —
the hot path when ingesting encrypted PDFs — runs one vectorized pass
over all blocks (P_i = D(C_i) ^ C_{i-1} has no chaining dependency).
CBC encrypt is inherently sequential and only runs in the fixture
writer. All tables are generated at import from the spec's GF(2^8)
arithmetic (no typed-in constant blobs to mistype).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables


def _gf_mul(a: int, b: int) -> int:
    """Multiply in GF(2^8) mod x^8+x^4+x^3+x+1 (FIPS-197 §4.2)."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _make_sbox() -> tuple[np.ndarray, np.ndarray]:
    """S-box = affine transform of the multiplicative inverse (§5.1.1)."""
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = np.zeros(256, np.uint8)
    for x in range(256):
        b = inv[x]
        s = 0x63
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
            ) & 1
            s ^= bit << i
        sbox[x] = s ^ (0x63 if x == 0 else 0)  # x=0 → 0x63 exactly
    sbox[0] = 0x63
    inv_sbox = np.zeros(256, np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _make_sbox()
_MUL = {
    c: np.array([_gf_mul(x, c) for x in range(256)], np.uint8)
    for c in (2, 3, 9, 11, 13, 14)
}
# flat-byte ShiftRows permutations (state is column-major: flat[c*4+r])
_SHIFT = np.array([((c + r) % 4) * 4 + r for c in range(4) for r in range(4)])
_INV_SHIFT = np.array([((c - r) % 4) * 4 + r for c in range(4) for r in range(4)])


def _expand_key(key: bytes) -> np.ndarray:
    """§5.2 key expansion → (Nr+1, 16) uint8 round keys."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    flat = np.array(w, np.uint8).reshape(nr + 1, 16)
    return flat


def _mix_columns(s: np.ndarray, inverse: bool) -> np.ndarray:
    """(n, 16) → (n, 16); §5.1.3 / §5.3.3 per 4-byte column."""
    v = s.reshape(-1, 4, 4)  # (n, column, row)
    a, b, c, d = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    out = np.empty_like(v)
    if not inverse:
        m2, m3 = _MUL[2], _MUL[3]
        out[:, :, 0] = m2[a] ^ m3[b] ^ c ^ d
        out[:, :, 1] = a ^ m2[b] ^ m3[c] ^ d
        out[:, :, 2] = a ^ b ^ m2[c] ^ m3[d]
        out[:, :, 3] = m3[a] ^ b ^ c ^ m2[d]
    else:
        m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
        out[:, :, 0] = m14[a] ^ m11[b] ^ m13[c] ^ m9[d]
        out[:, :, 1] = m9[a] ^ m14[b] ^ m11[c] ^ m13[d]
        out[:, :, 2] = m13[a] ^ m9[b] ^ m14[c] ^ m11[d]
        out[:, :, 3] = m11[a] ^ m13[b] ^ m9[c] ^ m14[d]
    return out.reshape(-1, 16)


# T-tables for the scalar (sequential-CBC) encrypt path: SubBytes +
# ShiftRows + MixColumns folded into four 256-entry 32-bit lookup tables
# (the classic software-AES construction; rows contribute (2s,s,s,3s) and
# rotations thereof to the big-endian column word).
def _make_ttables():
    t = []
    for rot in range(4):
        tab = []
        for x in range(256):
            s = int(_SBOX[x])
            col = [_gf_mul(s, 2), s, s, _gf_mul(s, 3)]
            col = col[-rot:] + col[:-rot]  # rotate for rows 1..3
            tab.append((col[0] << 24) | (col[1] << 16) | (col[2] << 8) | col[3])
        t.append(tuple(tab))
    return t


_T0, _T1, _T2, _T3 = _make_ttables()
_SBOX_T = tuple(int(b) for b in _SBOX)


class AES:
    """ECB block core over (n, 16) uint8 arrays; key size picks 10/12/14
    rounds. Use the module-level CBC helpers for data."""

    def __init__(self, key: bytes):
        self._rk = _expand_key(key)
        self._nr = self._rk.shape[0] - 1
        rkb = self._rk.tobytes()
        self._rkw = [
            [int.from_bytes(rkb[16 * r + 4 * j : 16 * r + 4 * j + 4], "big")
             for j in range(4)]
            for r in range(self._nr + 1)
        ]

    def encrypt_block(self, block: bytes) -> bytes:
        """One 16-byte block, scalar T-table path — ~50× the per-block cost
        of the vectorized path at n=1; used by sequential CBC encrypt."""
        rk = self._rkw
        c0, c1, c2, c3 = (
            int.from_bytes(block[0:4], "big") ^ rk[0][0],
            int.from_bytes(block[4:8], "big") ^ rk[0][1],
            int.from_bytes(block[8:12], "big") ^ rk[0][2],
            int.from_bytes(block[12:16], "big") ^ rk[0][3],
        )
        for r in range(1, self._nr):
            k = rk[r]
            n0 = (_T0[c0 >> 24] ^ _T1[(c1 >> 16) & 0xFF]
                  ^ _T2[(c2 >> 8) & 0xFF] ^ _T3[c3 & 0xFF] ^ k[0])
            n1 = (_T0[c1 >> 24] ^ _T1[(c2 >> 16) & 0xFF]
                  ^ _T2[(c3 >> 8) & 0xFF] ^ _T3[c0 & 0xFF] ^ k[1])
            n2 = (_T0[c2 >> 24] ^ _T1[(c3 >> 16) & 0xFF]
                  ^ _T2[(c0 >> 8) & 0xFF] ^ _T3[c1 & 0xFF] ^ k[2])
            n3 = (_T0[c3 >> 24] ^ _T1[(c0 >> 16) & 0xFF]
                  ^ _T2[(c1 >> 8) & 0xFF] ^ _T3[c2 & 0xFF] ^ k[3])
            c0, c1, c2, c3 = n0, n1, n2, n3
        k = rk[self._nr]
        s = _SBOX_T
        o0 = ((s[c0 >> 24] << 24) | (s[(c1 >> 16) & 0xFF] << 16)
              | (s[(c2 >> 8) & 0xFF] << 8) | s[c3 & 0xFF]) ^ k[0]
        o1 = ((s[c1 >> 24] << 24) | (s[(c2 >> 16) & 0xFF] << 16)
              | (s[(c3 >> 8) & 0xFF] << 8) | s[c0 & 0xFF]) ^ k[1]
        o2 = ((s[c2 >> 24] << 24) | (s[(c3 >> 16) & 0xFF] << 16)
              | (s[(c0 >> 8) & 0xFF] << 8) | s[c1 & 0xFF]) ^ k[2]
        o3 = ((s[c3 >> 24] << 24) | (s[(c0 >> 16) & 0xFF] << 16)
              | (s[(c1 >> 8) & 0xFF] << 8) | s[c2 & 0xFF]) ^ k[3]
        return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
                + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))

    def encrypt_blocks(self, blocks: np.ndarray) -> np.ndarray:
        s = blocks.astype(np.uint8) ^ self._rk[0]
        for r in range(1, self._nr):
            s = _mix_columns(_SBOX[s][:, _SHIFT], inverse=False) ^ self._rk[r]
        return _SBOX[s][:, _SHIFT] ^ self._rk[self._nr]

    def decrypt_blocks(self, blocks: np.ndarray) -> np.ndarray:
        s = blocks.astype(np.uint8) ^ self._rk[self._nr]
        for r in range(self._nr - 1, 0, -1):
            s = _mix_columns(_INV_SBOX[s[:, _INV_SHIFT]] ^ self._rk[r], inverse=True)
        return _INV_SBOX[s[:, _INV_SHIFT]] ^ self._rk[0]


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC; PKCS#7 padding by default (the PDF crypt-filter scheme —
    always adds 1..16 bytes). ``pad=False`` requires 16-aligned input
    (used by the R6 key-unwrap step, §7.6.4.3.3)."""
    if pad:
        p = 16 - (len(data) % 16)
        data = data + bytes([p]) * p
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs 16-byte-aligned input")
    aes = AES(key)
    prev = iv
    out = bytearray()
    for i in range(0, len(data), 16):  # chaining: inherently sequential
        x = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes.encrypt_block(x)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt, vectorized: every block decrypts independently then
    XORs the previous ciphertext block. Lenient PKCS#7 strip (a malformed
    pad byte strips nothing rather than raising — containment-friendly)."""
    if len(data) % 16 or not data:
        raise ValueError("CBC ciphertext must be a positive multiple of 16")
    c = np.frombuffer(data, np.uint8).reshape(-1, 16)
    p = AES(key).decrypt_blocks(c)
    prev = np.vstack([np.frombuffer(iv, np.uint8)[None, :], c[:-1]])
    out = (p ^ prev).tobytes()
    if unpad:
        n = out[-1]
        if 1 <= n <= 16 and out[-n:] == bytes([n]) * n:
            out = out[:-n]
    return out
