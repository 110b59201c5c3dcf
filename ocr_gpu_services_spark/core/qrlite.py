"""QR-lite: a deterministic machine-readable square marker (U3 made real).

The reference decodes QR codes from page pixels with pyzbar and returns
``{data, type, position}`` records
(/root/reference/src/infrastructure/services/optional_services.py:56-78).
pyzbar isn't in this container, so this module defines a self-contained
square matrix barcode with the same *pipeline* role: the fixture generator
RENDERS it into page images, and the extraction kernel FINDS it (connected
components + ring check) and DECODES the payload back from pixels — a real
bytes -> pixels -> bytes round trip, not a synthesized record.

Format (module = MODULE x MODULE ink/paper pixels):
  * (s+2) x (s+2) module grid; the outer ring is solid ink (the finder
    pattern; also makes the ring one connected component)
  * interior s x s modules carry a bitstream, row-major, MSB-first:
    byte0 = payload length n, byte1 = XOR checksum of payload bytes,
    then the n payload bytes; remaining bits zero
  * decode validates ring solidity + length bounds + checksum, so stray
    page components can't false-positive
"""

from __future__ import annotations

import numpy as np

MODULE = 3
INK, PAPER = 0, 255
MAX_PAYLOAD = 24
QR_TYPE = "QRLITE"     # the record's `type` field (pyzbar's obj.type twin)


def _bits_of(data: bytes) -> list[int]:
    return [(b >> (7 - i)) & 1 for b in data for i in range(8)]


def encode(payload: str) -> np.ndarray:
    """Payload string -> uint8 image (ink=0 / paper=255)."""
    data = payload.encode("utf-8")
    n = len(data)
    if not 1 <= n <= MAX_PAYLOAD:
        raise ValueError(f"payload length {n} out of range")
    chk = 0
    for b in data:
        chk ^= b
    bits = _bits_of(bytes([n, chk]) + data)
    s = 1
    while s * s < len(bits):
        s += 1
    grid = np.zeros((s + 2, s + 2), dtype=bool)
    grid[0, :] = grid[-1, :] = grid[:, 0] = grid[:, -1] = True
    inner = np.zeros(s * s, dtype=bool)
    inner[:len(bits)] = np.array(bits, dtype=bool)
    grid[1:-1, 1:-1] = inner.reshape(s, s)
    img = np.full((grid.shape[0] * MODULE, grid.shape[1] * MODULE), PAPER,
                  dtype=np.uint8)
    yy = np.repeat(np.repeat(grid, MODULE, axis=0), MODULE, axis=1)
    img[yy] = INK
    return img


def try_decode(sub: np.ndarray) -> str | None:
    """Attempt decode of a page sub-image (the component's bbox crop).
    Returns the payload string, or None if this isn't a QR-lite marker."""
    h, w = sub.shape
    if h != w or h % MODULE != 0:
        return None
    g = h // MODULE
    if g < 4 or g > 2 + 16:            # 16x16 data grid bounds MAX_PAYLOAD
        return None
    ink = sub < 128
    # majority-vote each module (robust to a stray pixel)
    mods = (ink.reshape(g, MODULE, g, MODULE).sum(axis=(1, 3))
            > (MODULE * MODULE) // 2)
    ring = (mods[0, :].all() and mods[-1, :].all()
            and mods[:, 0].all() and mods[:, -1].all())
    if not ring:
        return None
    s = g - 2
    bits = mods[1:-1, 1:-1].reshape(-1)
    if bits.size < 16:
        return None

    def byte_at(i: int) -> int:
        v = 0
        for b in bits[i * 8:(i + 1) * 8]:
            v = (v << 1) | int(b)
        return v

    n = byte_at(0)
    if not 1 <= n <= MAX_PAYLOAD or (n + 2) * 8 > s * s:
        return None
    chk = byte_at(1)
    data = bytes(byte_at(2 + i) for i in range(n))
    x = 0
    for b in data:
        x ^= b
    if x != chk:
        return None
    # trailing bits must be zero (tightens the false-positive guard)
    if bits[(n + 2) * 8:].any():
        return None
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return None
