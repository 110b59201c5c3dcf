"""Minimal 8-bit grayscale PNG codec (stdlib zlib/struct only).

Used by the fixture generator (encode) and the OCR kernel (decode).  The
container has no image libraries (SURVEY.md §7.0), so image payloads are
real PNGs produced and consumed by this codec.  Decoder supports all five
PNG filter types for robustness; encoder emits filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(gray: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as grayscale PNG."""
    assert gray.ndim == 2 and gray.dtype == np.uint8
    h, w = gray.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + gray[r].tobytes() for r in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a 2-D uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("unsupported PNG (need 8-bit grayscale)")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    arr = np.frombuffer(raw, dtype=np.uint8)
    if arr.size == height * stride:
        mat = arr.reshape(height, stride)
        if not mat[:, 0].any():
            # filter-0 fast path (what our encoder and most scanners of
            # flat scans emit): the whole image is one reshape + slice
            return np.ascontiguousarray(mat[:, 1:])
    img = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for r in range(height):
        row = raw[r * stride:(r + 1) * stride]
        ftype, scan = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            cur = scan
        elif ftype == 1:
            cur = scan.copy()
            for i in range(1, width):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        elif ftype == 2:
            cur = (scan + prev) & 0xFF
        elif ftype == 3:
            cur = scan.copy()
            cur[0] = (cur[0] + prev[0] // 2) & 0xFF
            for i in range(1, width):
                cur[i] = (cur[i] + (cur[i - 1] + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            cur = scan.copy()
            cur[0] = (cur[0] + _paeth(0, int(prev[0]), 0)) & 0xFF
            for i in range(1, width):
                cur[i] = (cur[i] + _paeth(int(cur[i - 1]), int(prev[i]),
                                          int(prev[i - 1]))) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        img[r] = cur.astype(np.uint8)
        prev = cur
    return img
