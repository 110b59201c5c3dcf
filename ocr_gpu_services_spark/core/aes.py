"""AES-128/192/256 block cipher + CBC mode, from scratch (FIPS-197).

Used by the PDF standard security handler (core/pdf_crypt.py) for the
/AESV2 (AES-128, PDF 1.6+) and /AESV3 (AES-256, PDF 2.0 / Acrobat 9+)
crypt filters.  Parity note: the reference's OCR stack reads whatever
PDF bytes arrive through its rasterizer (/root/reference/routers/
ocr.py); modern encrypted PDFs are AES, so decrypt-on-read needs a
cipher and none is baked into this sandbox — hence from scratch from
the published FIPS-197 spec.

Two implementations, matched to their call sites:

* ``encrypt_cbc`` — scalar T-table cipher.  CBC encryption chains
  block-to-block, so it cannot be vectorized across blocks; it only
  runs at fixture-write time and inside the R6 key-derivation hash
  (bounded inputs), where ~4 µs/block is fine.
* ``decrypt_cbc`` — numpy-vectorized inverse cipher.  CBC decryption
  is parallel across blocks (P_i = D(C_i) XOR C_{i-1}), so the hot
  read path decrypts every block of a stream at once with table
  gathers; this is what executors run per encrypted page.

All tables are derived in-code from the GF(2^8) definition (generator
0x03, reducing polynomial 0x11B) — nothing is copied beyond the two
spec constants 0x63 (S-box affine) and 0x11B.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------- GF(2^8) tables

_EXP = np.zeros(512, np.uint8)          # generator-3 antilog, doubled
_LOG = np.zeros(256, np.int32)
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= (_x << 1) ^ (0x11B if _x & 0x80 else 0)   # multiply by 3
    _x &= 0xFF
_EXP[255:510] = _EXP[:255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _rotl8(v: int, n: int) -> int:
    return ((v << n) | (v >> (8 - n))) & 0xFF


SBOX = np.zeros(256, np.uint8)
for _i in range(256):
    _inv = int(_EXP[255 - _LOG[_i]]) if _i else 0
    SBOX[_i] = (_inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2)
                ^ _rotl8(_inv, 3) ^ _rotl8(_inv, 4) ^ 0x63)
INV_SBOX = np.zeros(256, np.uint8)
INV_SBOX[SBOX] = np.arange(256, dtype=np.uint8)

# GF multiply-by-constant lookup tables for MixColumns / its inverse
_MUL = {c: np.array([_gmul(x, c) for x in range(256)], np.uint8)
        for c in (2, 3, 9, 11, 13, 14)}

_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_gmul(_RCON[-1], 2))


# ---------------------------------------------------------- key schedule

def expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 §5.2: round keys as a list of 16-byte chunks
    (Nr+1 of them; Nr = 10/12/14 for 128/192/256-bit keys)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes: {len(key)}")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]                          # RotWord
            t = [int(SBOX[b]) for b in t]              # SubWord
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [int(SBOX[b]) for b in t]              # AES-256 extra
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    flat = bytes(b for word in w for b in word)
    return [flat[16 * r:16 * r + 16] for r in range(nr + 1)]


# ------------------------------------------------- scalar encrypt (CBC)
#
# Word-oriented T-tables (the classic software layout): each state
# column is one big-endian uint32; a full round per column is four
# table lookups + XORs on plain Python ints, which is what keeps the
# inherently serial CBC-encrypt chain usable (~5 MB/s vs ~0.06 for a
# byte-at-a-time loop).

_SB = [int(b) for b in SBOX]
_T0 = [(_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
       for s in _SB]
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) for t in _T0]
_T2 = [((t >> 8) | ((t & 0xFF) << 24)) for t in _T1]
_T3 = [((t >> 8) | ((t & 0xFF) << 24)) for t in _T2]


def _round_words(rks: list[bytes]) -> list[tuple[int, int, int, int]]:
    import struct
    return [struct.unpack(">4I", rk) for rk in rks]


def _enc_block_words(w0, w1, w2, w3, rkw):
    nr = len(rkw) - 1
    k = rkw[0]
    w0 ^= k[0]; w1 ^= k[1]; w2 ^= k[2]; w3 ^= k[3]
    T0, T1, T2, T3 = _T0, _T1, _T2, _T3
    for rnd in range(1, nr):
        k = rkw[rnd]
        t0 = (T0[w0 >> 24] ^ T1[(w1 >> 16) & 0xFF]
              ^ T2[(w2 >> 8) & 0xFF] ^ T3[w3 & 0xFF] ^ k[0])
        t1 = (T0[w1 >> 24] ^ T1[(w2 >> 16) & 0xFF]
              ^ T2[(w3 >> 8) & 0xFF] ^ T3[w0 & 0xFF] ^ k[1])
        t2 = (T0[w2 >> 24] ^ T1[(w3 >> 16) & 0xFF]
              ^ T2[(w0 >> 8) & 0xFF] ^ T3[w1 & 0xFF] ^ k[2])
        t3 = (T0[w3 >> 24] ^ T1[(w0 >> 16) & 0xFF]
              ^ T2[(w1 >> 8) & 0xFF] ^ T3[w2 & 0xFF] ^ k[3])
        w0, w1, w2, w3 = t0, t1, t2, t3
    k = rkw[nr]
    SB = _SB
    t0 = ((SB[w0 >> 24] << 24) | (SB[(w1 >> 16) & 0xFF] << 16)
          | (SB[(w2 >> 8) & 0xFF] << 8) | SB[w3 & 0xFF]) ^ k[0]
    t1 = ((SB[w1 >> 24] << 24) | (SB[(w2 >> 16) & 0xFF] << 16)
          | (SB[(w3 >> 8) & 0xFF] << 8) | SB[w0 & 0xFF]) ^ k[1]
    t2 = ((SB[w2 >> 24] << 24) | (SB[(w3 >> 16) & 0xFF] << 16)
          | (SB[(w0 >> 8) & 0xFF] << 8) | SB[w1 & 0xFF]) ^ k[2]
    t3 = ((SB[w3 >> 24] << 24) | (SB[(w0 >> 16) & 0xFF] << 16)
          | (SB[(w1 >> 8) & 0xFF] << 8) | SB[w2 & 0xFF]) ^ k[3]
    return t0, t1, t2, t3


def encrypt_block(key: bytes, block: bytes) -> bytes:
    import struct
    w = struct.unpack(">4I", block)
    out = _enc_block_words(*w, _round_words(expand_key(key)))
    return struct.pack(">4I", *out)


def encrypt_cbc(key: bytes, iv: bytes, data: bytes, *,
                pad: bool = True) -> bytes:
    """CBC encrypt.  ``pad=True`` applies PKCS#7 (always appends a pad
    block, as PDF's AESV2/AESV3 filters require); ``pad=False`` needs
    ``len(data)`` to be a multiple of 16 (key-wrapping / Algorithm 2.B).
    """
    import struct
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs a 16-byte multiple")
    rkw = _round_words(expand_key(key))
    nblk = len(data) // 16
    words = struct.unpack(f">{4 * nblk}I", data)
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    out = bytearray()
    for i in range(nblk):
        p0, p1, p2, p3 = _enc_block_words(
            words[4 * i] ^ p0, words[4 * i + 1] ^ p1,
            words[4 * i + 2] ^ p2, words[4 * i + 3] ^ p3, rkw)
        out += struct.pack(">4I", p0, p1, p2, p3)
    return bytes(out)


# --------------------------------------------- vectorized decrypt (CBC)

_ROW_GATHER = np.empty(16, np.intp)      # InvShiftRows as one gather
for _r in range(4):
    for _c in range(4):
        _ROW_GATHER[4 * _c + _r] = 4 * ((_c - _r) & 3) + _r


def _dec_blocks(ct: np.ndarray, rks: list[bytes]) -> np.ndarray:
    """Inverse cipher over an (N, 16) uint8 array of blocks at once."""
    nr = len(rks) - 1
    rka = [np.frombuffer(rk, np.uint8) for rk in rks]
    s = ct ^ rka[nr]
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(nr - 1, 0, -1):
        s = INV_SBOX[s[:, _ROW_GATHER]]          # InvShiftRows+InvSub
        s = s ^ rka[rnd]
        a0, a1, a2, a3 = (s[:, 0::4], s[:, 1::4], s[:, 2::4], s[:, 3::4])
        t = np.empty_like(s)
        t[:, 0::4] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
        t[:, 1::4] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
        t[:, 2::4] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
        t[:, 3::4] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = t
    s = INV_SBOX[s[:, _ROW_GATHER]]
    return s ^ rka[0]


def decrypt_block(key: bytes, block: bytes) -> bytes:
    ct = np.frombuffer(block, np.uint8).reshape(1, 16)
    return _dec_blocks(ct, expand_key(key)).tobytes()


def decrypt_cbc(key: bytes, iv: bytes, data: bytes, *,
                pad: bool = True) -> bytes:
    """CBC decrypt, all blocks in parallel (numpy).  ``pad=True`` strips
    and validates PKCS#7; raises ValueError on malformed padding (the
    caller degrades the PDF row to its ``error`` column)."""
    if len(data) % 16 or not data:
        raise ValueError(f"AES-CBC ciphertext length {len(data)}")
    ct = np.frombuffer(data, np.uint8).reshape(-1, 16)
    pt = _dec_blocks(ct, expand_key(key))
    # P_i = D(C_i) ^ C_{i-1};  C_0 = IV
    pt[1:] ^= ct[:-1]
    pt[0] ^= np.frombuffer(iv, np.uint8)
    out = pt.tobytes()
    if not pad:
        return out
    n = out[-1]
    if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
        raise ValueError("AES-CBC: bad PKCS#7 padding")
    return out[:-n]
