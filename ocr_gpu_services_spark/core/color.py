"""Color -> grayscale bridge for the S3 decode seam.

The reference decodes arbitrary color uploads to BGR and immediately
grays them for every pixel operator (cv2.imdecode in
/root/reference/src/api/v1/utils.py:15-18, cvtColor(..., COLOR_BGR2GRAY)
in /root/reference/src/infrastructure/services/optional_services.py:61
and classification.py:40-41).  This module is that bridge: color PNG /
JPEG payloads decode to an (H, W, 3) RGB array and convert here, after
which the whole pipeline (deskew, components, OCR, QR, signatures) is
the existing grayscale kernel, unchanged.

The conversion is OpenCV's exact fixed-point arithmetic — the ITU-R
BT.601 luma weights 0.299/0.587/0.114 scaled to 14 bits with round-half
-up — so a fixture generator that solves for an exact target luma gets
byte-identical grayscale back, keeping extraction goldens stable.
"""

from __future__ import annotations

import numpy as np

# BT.601 weights in 14-bit fixed point: round(w * 2**14); they sum to
# exactly 2**14, so neutral gray (R=G=B=g) maps back to exactly g.
_R_W, _G_W, _B_W = 4899, 9617, 1868
_HALF = 1 << 13


def rgb_to_gray(arr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W) uint8 luma, cv2-exact."""
    a = arr.astype(np.uint32)
    y = (_R_W * a[..., 0] + _G_W * a[..., 1] + _B_W * a[..., 2]
         + _HALF) >> 14
    return y.astype(np.uint8)


def luma_int(r: int, g: int, b: int) -> int:
    """Scalar twin of rgb_to_gray (shared by the fixture solver)."""
    return (_R_W * r + _G_W * g + _B_W * b + _HALF) >> 14
