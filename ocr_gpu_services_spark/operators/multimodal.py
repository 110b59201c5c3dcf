"""Multimodal column plumbing (driver mandate): treat image/video payloads
as opaque BINARY + typed metadata, with decode / resize / frame-sample as
Arrow-batched kernels.  The container has no image/video libraries
(SURVEY.md §7.0), so the codecs are the engine's own deterministic ones
(core/png.py; the VFRM frame container below) — the Spark-side plumbing
(schemas, mapInPandas batch shape, binary round trips) is real and gated.

* ``resize_nn``: nearest-neighbor resize (the P10 analogue at table level,
  reference document_detector/utils/transforms.py:9-18 aspect resize).
* VFRM container: ``b'VFRM' + u32 n_frames + n x (u32 len + PNG bytes)`` —
  a deterministic stand-in for a video file; ``iter_frames`` /
  ``build_container`` are the codec, ``sample_frames`` picks every k-th
  frame (the classic training-pipeline frame-sample step).
"""

from __future__ import annotations

import struct

import numpy as np

from ..core.png import png_decode, png_encode  # noqa: F401  (kernel re-export)


def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize: source index = floor(i*in/out)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]


_MAGIC = b"VFRM"


def build_container(frames: list[bytes]) -> bytes:
    out = [_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def iter_frames(blob: bytes):
    if blob[:4] != _MAGIC:
        raise ValueError("not a VFRM container")
    (n,) = struct.unpack("<I", blob[4:8])
    pos = 8
    for _ in range(n):
        (ln,) = struct.unpack("<I", blob[pos:pos + 4])
        pos += 4
        yield blob[pos:pos + ln]
        pos += ln


def sample_frames(blob: bytes, every: int = 2) -> list[bytes]:
    """Every ``every``-th frame starting at frame 0."""
    return [f for i, f in enumerate(iter_frames(blob)) if i % every == 0]
