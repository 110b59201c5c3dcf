"""EAN-13 barcode (ISO/IEC 15420) — encoder + scanline decoder.

Second symbology for U3: the reference's pyzbar.decode reads 1-D
retail codes alongside QR (/root/reference/src/infrastructure/services/
optional_services.py:56-78 returns {data, type} for every symbol class
pyzbar knows).  Everything here derives from the published standard:
95 modules = guard 101 + six left digits (7 modules each, L/G
alphabets whose parity pattern encodes the leading 13th digit) +
center 01010 + six right digits (R alphabet) + guard 101, with the
mod-10 weighted checksum.  The decoder samples a single scanline of
the symbol's joint bar bbox, tolerates either scan direction, and
rejects on any guard/parity/checksum mismatch — a run of page
components that merely looks bar-ish cannot emit a span.
"""

from __future__ import annotations

import numpy as np

MODULE_W = 2      # rendered pixels per module (fixture scale)
BAR_H = 40        # rendered bar height
INK, PAPER = 0, 255
EAN_TYPE = "EAN13"  # pyzbar's obj.type for EAN-13 symbols

# L-codes for digits 0-9; G = bitwise reverse of R; R = complement of L
_L = ["0001101", "0011001", "0010011", "0111101", "0100011",
      "0110001", "0101111", "0111011", "0110111", "0001011"]
_R = ["".join("1" if c == "0" else "0" for c in p) for p in _L]
_G = [p[::-1] for p in _R]

# leading-digit -> parity pattern of the six left digits (L/G)
_PARITY = ["LLLLLL", "LLGLGG", "LLGGLG", "LLGGGL", "LGLLGG",
           "LGGLLG", "LGGGLL", "LGLGLG", "LGLGGL", "LGGLGL"]

_L_REV = {p: d for d, p in enumerate(_L)}
_G_REV = {p: d for d, p in enumerate(_G)}
_R_REV = {p: d for d, p in enumerate(_R)}
_PARITY_REV = {p: d for d, p in enumerate(_PARITY)}


def checksum(digits12: str) -> int:
    """EAN-13 check digit for the first 12 digits (weights 1/3
    alternating from the left, check chosen to zero the sum mod 10)."""
    s = sum(int(d) * (1 if i % 2 == 0 else 3)
            for i, d in enumerate(digits12))
    return (10 - s % 10) % 10


def modules(digits12: str) -> np.ndarray:
    """12 data digits -> the 95-module pattern (True = bar)."""
    if len(digits12) != 12 or not digits12.isdigit():
        raise ValueError("EAN-13 encodes exactly 12 data digits")
    full = digits12 + str(checksum(digits12))
    lead = int(full[0])
    bits = "101"
    for ch, par in zip(full[1:7], _PARITY[lead]):
        bits += (_L if par == "L" else _G)[int(ch)]
    bits += "01010"
    for ch in full[7:13]:
        bits += _R[int(ch)]
    bits += "101"
    return np.array([c == "1" for c in bits], dtype=bool)


def encode(digits12: str) -> np.ndarray:
    """12 data digits -> uint8 image (ink bars on paper)."""
    mods = modules(digits12)
    row = np.where(np.repeat(mods, MODULE_W), INK, PAPER).astype(np.uint8)
    return np.tile(row, (BAR_H, 1))


def _parse_bits(bits: str) -> str | None:
    """95-character '0'/'1' string -> 13 digits, or None."""
    if len(bits) != 95:
        return None
    if bits[0:3] != "101" or bits[45:50] != "01010" or bits[92:95] != "101":
        return None
    parity = ""
    digits = []
    for k in range(6):
        pat = bits[3 + 7 * k:10 + 7 * k]
        if pat in _L_REV:
            parity += "L"
            digits.append(_L_REV[pat])
        elif pat in _G_REV:
            parity += "G"
            digits.append(_G_REV[pat])
        else:
            return None
    if parity not in _PARITY_REV:
        return None
    lead = _PARITY_REV[parity]
    for k in range(6):
        pat = bits[50 + 7 * k:57 + 7 * k]
        if pat not in _R_REV:
            return None
        digits.append(_R_REV[pat])
    full = str(lead) + "".join(map(str, digits))
    if int(full[12]) != checksum(full[:12]):
        return None
    return full


def try_decode_region(crop: np.ndarray) -> str | None:
    """Decode an upright symbol crop (the joint bbox of its bars) by
    sampling the middle scanline at the 95 module centers.  Tries both
    scan directions (a 180-degree page scan reverses the sequence)."""
    h, w = crop.shape
    if h < 3 or w < 95:
        return None
    line = crop[h // 2] < 128
    on = np.nonzero(line)[0]
    if on.size == 0:
        return None
    x0, x1 = int(on[0]), int(on[-1])
    span = x1 - x0 + 1
    centers = x0 + ((np.arange(95) + 0.5) * span / 95.0).astype(int)
    bits = "".join("1" if line[c] else "0" for c in centers)
    got = _parse_bits(bits)
    if got is None:
        got = _parse_bits(bits[::-1])
    return got
