"""1-D barcodes — EAN-13 (ISO/IEC 15420) and Code 128 (ISO/IEC 15417):
encoders + scanline decoders.

Symbologies for U3: the reference's pyzbar.decode reads 1-D retail and
logistics codes alongside QR (/root/reference/src/infrastructure/
services/optional_services.py:56-78 returns {data, type} for every
symbol class pyzbar knows).  Everything here derives from the published
standards.

EAN-13: 95 modules = guard 101 + six left digits (7 modules each, L/G
alphabets whose parity pattern encodes the leading 13th digit) +
center 01010 + six right digits (R alphabet) + guard 101, with the
mod-10 weighted checksum.

Code 128: variable-length — start A/B/C (values 103/104/105), data
codewords (code-set state machine with CODE/SHIFT latches, set C packs
digit pairs), a mod-103 position-weighted check codeword, and the
13-module stop pattern.  Every data symbol is 11 modules as 3 bars +
3 spaces of widths 1-4 (bar modules always even — the symbology's
self-checking parity, asserted on the table at import).

Both decoders sample a single scanline of the symbol's joint bar bbox,
tolerate either scan direction, and reject on any guard/parity/
checksum/codeword mismatch — a run of page components that merely
looks bar-ish cannot emit a span.
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


# --------------------------------------------------------------------
# Code 128 (ISO/IEC 15417)
# --------------------------------------------------------------------

C128_TYPE = "CODE128"  # pyzbar's obj.type for Code 128 symbols

# value -> (b s b s b s) module widths, values 0-105 (103/104/105 are
# the start codes); the 13-module stop is separate.  Published constant
# table of the standard.
_C128 = [
    "212222", "222122", "222221", "121223", "121322", "131222", "122213",
    "122312", "132212", "221213", "221312", "231212", "112232", "122132",
    "122231", "113222", "123122", "123221", "223211", "221132", "221231",
    "213212", "223112", "312131", "311222", "321122", "321221", "312212",
    "322112", "322211", "212123", "212321", "232121", "111323", "131123",
    "131321", "112313", "132113", "132311", "211313", "231113", "231311",
    "112133", "112331", "132131", "113123", "113321", "133121", "313121",
    "211331", "231131", "213113", "213311", "213131", "311123", "311321",
    "331121", "312113", "312311", "332111", "314111", "221411", "431111",
    "111224", "111422", "121124", "121421", "141122", "141221", "112214",
    "112412", "122114", "122411", "142112", "142211", "241211", "221114",
    "413111", "241112", "134111", "111242", "121142", "121241", "114212",
    "124112", "124211", "411212", "421112", "421211", "212141", "214121",
    "412121", "111143", "111341", "131141", "114113", "114311", "411113",
    "411311", "113141", "114131", "311141", "411131", "211412", "211214",
    "211232",
]
_C128_STOP = "2331112"          # 4 bars / 3 spaces, 13 modules
_C128_REV = {p: v for v, p in enumerate(_C128)}

# self-checks on the published table: 11 modules each, all distinct,
# and the symbology's even-bar-module parity (its self-checking core)
assert len(_C128) == 106 and len(_C128_REV) == 106
assert all(sum(map(int, p)) == 11 for p in _C128)
assert all(sum(map(int, p[0::2])) % 2 == 0 for p in _C128)
assert sum(map(int, _C128_STOP)) == 13

_START_A, _START_B, _START_C = 103, 104, 105
_SHIFT, _CODE_C = 98, 99


def _c128_values(text: str) -> list[int]:
    """Encode text -> codeword values (start..data, no check/stop).
    Set C for even-length all-digit payloads (digit pairs), else set B
    (printable ASCII 32-126)."""
    if text.isdigit() and len(text) % 2 == 0 and len(text) >= 4:
        return [_START_C] + [int(text[k:k + 2])
                             for k in range(0, len(text), 2)]
    if not text or any(not 32 <= ord(c) <= 126 for c in text):
        raise ValueError("Code 128 set B encodes printable ASCII only")
    return [_START_B] + [ord(c) - 32 for c in text]


def code128_modules(text: str) -> np.ndarray:
    """Payload -> module pattern (True = bar) incl. check + stop."""
    vals = _c128_values(text)
    check = (vals[0] + sum(k * v for k, v in enumerate(vals[1:], 1))) % 103
    widths = "".join(_C128[v] for v in vals + [check]) + _C128_STOP
    bits: list[bool] = []
    for k, w in enumerate(widths):
        bits.extend([k % 2 == 0] * int(w))     # even runs are bars
    return np.array(bits, dtype=bool)


def encode_code128(text: str) -> np.ndarray:
    """Payload -> uint8 image (ink bars on paper), fixture scale."""
    mods = code128_modules(text)
    row = np.where(np.repeat(mods, MODULE_W), INK, PAPER).astype(np.uint8)
    return np.tile(row, (BAR_H, 1))


def _c128_text(vals: list[int]) -> str | None:
    """Data codewords (between start and check) -> decoded text via the
    code-set state machine.  ``vals[0]`` is the start code.  FNC1-4
    symbols are rejected (conservative: no GS1/extended payloads)."""
    start = vals[0]
    if start not in (_START_A, _START_B, _START_C):
        return None
    cur = {_START_A: "A", _START_B: "B", _START_C: "C"}[start]
    out: list[str] = []
    shift: str | None = None
    for v in vals[1:]:
        s = shift or cur
        shift = None
        if s == "C":
            if v <= 99:
                out.append(f"{v:02d}")
            elif v == 100:
                cur = "B"
            elif v == 101:
                cur = "A"
            else:
                return None                     # FNC1
        else:
            if v <= (63 if s == "A" else 95):
                out.append(chr(v + 32))
            elif s == "A" and v <= 95:
                out.append(chr(v - 64))         # control chars
            elif v == _SHIFT:
                shift = "B" if s == "A" else "A"
            elif v == _CODE_C:
                cur = "C"
            elif v == (100 if s == "A" else 101):
                cur = "B" if s == "A" else "A"
            else:
                return None                     # FNC1-4
    if shift is not None:
        return None                             # dangling SHIFT
    return "".join(out)


def _c128_parse_runs(runs: np.ndarray) -> str | None:
    """Pixel run lengths (bar first, bar last) -> decoded payload."""
    R = runs.size
    if R < 25 or R % 6 != 1:    # m 11-module symbols + 7-run stop; m>=3
        return None
    m = (R - 7) // 6
    total_mod = 11 * m + 13
    mw = float(runs.sum()) / total_mod
    widths = np.rint(runs / mw).astype(int)
    if widths.min() < 1 or widths.max() > 4 or widths.sum() != total_mod:
        return None
    if "".join(map(str, widths[6 * m:])) != _C128_STOP:
        return None
    vals = []
    for k in range(m):
        v = _C128_REV.get("".join(map(str, widths[6 * k:6 * k + 6])))
        if v is None:
            return None
        vals.append(v)
    check = (vals[0] + sum(k * v
                           for k, v in enumerate(vals[1:-1], 1))) % 103
    if check != vals[-1]:
        return None
    return _c128_text(vals[:-1])


def try_decode_code128(crop: np.ndarray) -> str | None:
    """Decode an upright Code 128 crop (joint bbox of its bars) from its
    middle scanline's run lengths.  Tries both scan directions."""
    h, w = crop.shape
    if h < 3 or w < 41:          # >= 4 symbols + stop at 1px modules
        return None
    line = crop[h // 2] < 128
    on = np.nonzero(line)[0]
    if on.size == 0:
        return None
    seg = line[on[0]:on[-1] + 1]
    edges = np.nonzero(np.diff(seg.astype(np.int8)))[0]
    runs = np.diff(np.concatenate(([0], edges + 1, [seg.size])))
    got = _c128_parse_runs(runs)
    if got is None:
        got = _c128_parse_runs(runs[::-1])
    return got


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
