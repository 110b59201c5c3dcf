"""Exact-invertible page rotation + skew estimation (U5/U6 made real).

The reference deskews scanned pages before OCR: it finds the dominant
contour's minAreaRect angle and warps the pixels upright
(/root/reference/src/infrastructure/utils/image_processing.py:33-48,
perspective variant src/ml/aligner/utils/evaluation/page_extractor.py:60-95).
This module is the deterministic-stub analogue with one extra property the
golden byte-identity contract needs: rotation is implemented as three
integer-offset shear passes (the classic Paeth three-shear rotation), so a
page rotated by theta and later deskewed by the SAME theta restores the
original canvas pixel-for-pixel.  A shear pass moves whole rows/columns by
precomputed integer offsets; its inverse is the same pass with negated
offsets — no resampling, no interpolation error, hence a rotated fixture
page OCRs byte-identically to its upright twin (tests/test_core.py).

The skew ESTIMATOR is the projection-profile method: for each candidate
angle, inverse-transform the ink coordinates and score the sharpness of the
row-ink histogram (sum of squared row counts); horizontal text lines make
the true angle's profile maximally sharp.  Estimation works on coordinate
arrays (O(ink) per candidate), never on materialized canvases.
"""

from __future__ import annotations

import math

import numpy as np

PAPER = 255
# candidate grid the estimator searches; the fixture generator draws its
# rotation angles from this same grid (half-degree steps, 1 <= |theta| <= 8,
# plus 0).  Sub-degree candidates are deliberately absent: on page-sized
# canvases a 0.5-degree shear displaces at most ~1 px, which is below the
# projection profile's resolution — keeping them lets profile noise nudge a
# genuinely upright page into a spurious +-0.5 deskew.
SKEW_GRID = [0.0] + [round(x * 0.5, 1)
                     for x in range(-16, 17) if abs(x) >= 2]


def _shear_offsets(shape: tuple[int, int], deg: float
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Integer offsets for the three shear passes (x, y, x) on a canvas of
    the given shape.  Both rotate and derotate derive offsets from the SAME
    (shape, deg), which is what makes the round trip exact."""
    h, w = shape
    th = math.radians(deg)
    alpha = -math.tan(th / 2.0)
    beta = math.sin(th)
    cy, cx = h // 2, w // 2
    a = np.rint(alpha * (np.arange(h) - cy)).astype(np.int64)   # per-row dx
    b = np.rint(beta * (np.arange(w) - cx)).astype(np.int64)    # per-col dy
    return a, b, a


def _shear_x(img: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """dst[y, x] = src[y, x - offs[y]] (row y moves right by offs[y])."""
    h, w = img.shape
    src_x = np.arange(w)[None, :] - offs[:, None]
    oob = (src_x < 0) | (src_x >= w)
    out = np.take_along_axis(img, np.clip(src_x, 0, w - 1), axis=1)
    out[oob] = PAPER
    return out


def _shear_y(img: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """dst[y, x] = src[y - offs[x], x] (column x moves down by offs[x])."""
    h, w = img.shape
    src_y = np.arange(h)[:, None] - offs[None, :]
    oob = (src_y < 0) | (src_y >= h)
    out = np.take_along_axis(img, np.clip(src_y, 0, h - 1), axis=0)
    out[oob] = PAPER
    return out


def pad_for_rotation(img: np.ndarray, deg: float) -> np.ndarray:
    """Pad with paper so the three shear passes never clip ink.  Offsets
    are centered (range +-|coef|*extent/2), so each side needs only half
    the shear range; rotate_canvas asserts no ink was clipped."""
    h, w = img.shape
    t = abs(math.tan(math.radians(deg) / 2.0))
    s = abs(math.sin(math.radians(deg)))
    pad_y = int(math.ceil(s * w / 2.0)) + 3
    # x shears twice; the second acts on rows already shifted by the
    # y-shear, widening the reach by s*w/2 rows' worth of tan
    pad_x = int(math.ceil(t * (h / 2.0 + s * w / 2.0)) * 2) + 3
    out = np.full((h + 2 * pad_y, w + 2 * pad_x), PAPER, dtype=img.dtype)
    out[pad_y:pad_y + h, pad_x:pad_x + w] = img
    return out


def rotate_canvas(img: np.ndarray, deg: float) -> np.ndarray:
    """Rotate by deg via three exact shear passes (canvas is pre-padded)."""
    if deg == 0.0:
        return img
    canvas = pad_for_rotation(img, deg)
    a1, b2, a3 = _shear_offsets(canvas.shape, deg)
    out = _shear_x(_shear_y(_shear_x(canvas, a1), b2), a3)
    # fixtures-side safety: the padding must have absorbed every shift
    assert int((out < 128).sum()) == int((canvas < 128).sum()), \
        "rotation clipped ink; padding too small"
    return out


def derotate_canvas(img: np.ndarray, deg: float) -> np.ndarray:
    """Exact inverse of rotate_canvas's shear passes (same shape, same deg,
    negated offsets, reverse order)."""
    if deg == 0.0:
        return img
    a1, b2, a3 = _shear_offsets(img.shape, deg)
    return _shear_x(_shear_y(_shear_x(img, -a3), -b2), -a1)


def derotate_ink(img: np.ndarray, deg: float) -> np.ndarray:
    """Binary fast path of ``derotate_canvas``: apply the inverse shear
    offsets to the INK COORDINATES and scatter onto a clean page, instead
    of gathering the whole (mostly-paper) canvas three times.  Produces a
    canvas whose ink mask (<128) is pixel-identical to derotate_canvas's —
    every downstream consumer (components, OCR, QR decode, signature
    density) thresholds at 128, so the two are interchangeable there; use
    derotate_canvas when gray values must survive.

    Points whose inverse-sheared coordinates leave the canvas are DROPPED
    after each pass — exactly derotate_canvas's paper-fill semantics for
    out-of-bounds gathers.  Without the masks, edge ink on a page whose
    estimated angle does not exactly invert a padded rotation (any
    real-world skewed input) raised IndexError past the canvas and
    silently wrapped at negative coordinates."""
    if deg == 0.0:
        return img
    h, w = img.shape
    ys, xs = np.nonzero(img < 128)
    a1, b2, a3 = _shear_offsets(img.shape, deg)
    x = xs - a3[ys]                      # undo third shear (x)
    keep = (x >= 0) & (x < w)
    y, x = ys[keep], x[keep]
    y = y - b2[x]                        # undo second shear (y)
    keep = (y >= 0) & (y < h)
    x, y = x[keep], y[keep]
    x = x - a1[y]                        # undo first shear (x)
    keep = (x >= 0) & (x < w)
    x, y = x[keep], y[keep]
    out = np.full(img.shape, PAPER, dtype=img.dtype)
    out[y, x] = 0
    return out


def _profile_scores(ys, xs, shape, degs: list[float]) -> list[float]:
    """Profile sharpness score for every candidate at once: the shear
    offset tables for all candidates are built as one (C, h)/(C, w) batch
    and the point transforms are one broadcast gather each."""
    h, w = shape
    cy, cx = h // 2, w // 2
    th = np.radians(np.asarray(degs, dtype=np.float64))
    alpha = -np.tan(th / 2.0)
    beta = np.sin(th)
    A = np.rint(alpha[:, None] * (np.arange(h) - cy)).astype(np.int64)
    B = np.rint(beta[:, None] * (np.arange(w) - cx)).astype(np.int64)
    C = len(degs)
    x1 = xs[None, :] - A[:, ys]                      # undo third shear
    x1c = np.clip(x1, 0, w - 1)
    y1 = ys[None, :] - np.take_along_axis(B, x1c, axis=1)   # undo second
    # one bincount for ALL candidates: shift each candidate's row ids to
    # its own non-overlapping key range, square-sum per range.  Identical
    # integer counts per (candidate, row) as the former per-candidate
    # bincount, so the float64 squares and their sums match exactly
    # (each count appears once, summed in the same ascending-row order).
    mins = y1.min(axis=1, keepdims=True)
    span = int((y1 - mins).max()) + 1
    keys = (y1 - mins) + (np.arange(C, dtype=np.int64) * span)[:, None]
    prof = np.bincount(keys.ravel(),
                       minlength=C * span).astype(np.float64)
    return (prof * prof).reshape(C, span).sum(axis=1).tolist()


def estimate_skew(img: np.ndarray, grid=SKEW_GRID) -> float:
    """Projection-profile skew estimate over the candidate grid.

    Score(theta) = sum of squared row-ink counts of the inverse-rotated ink
    points; text rows collapse to sharp bands only at the true angle.
    Ties prefer the smaller |theta| (then the smaller theta), so an upright
    page always estimates 0.0.  Coarse-to-fine: whole degrees first, then
    the +-0.5 neighbors of the winner — the profile peak is far sharper
    than a degree wide, so the two-stage search is exact on text pages at
    a third of the candidate evaluations.
    """
    ys, xs = np.nonzero(img < 128)
    if ys.size == 0:
        return 0.0
    # deterministic stride sample; the profile shape holds as long as
    # the TEXT keeps enough absolute representation.  A fixed cap fails
    # on symbol-heavy pages: a version-10 QR block carries ~14k ink
    # points, so a 1536-point sample leaves the glyph rows' peak at
    # noise level and a dense-block alias angle can win.  Scaling the
    # cap with total ink (n/4, bounded) keeps text-only pages on the
    # exact historical path while giving symbol-heavy pages
    # proportional signal — verified against the full-scatter argmax.
    cap = max(1536, min(ys.size // 4, 8192))
    if ys.size > cap:
        step = ys.size // cap + 1
        ys, xs = ys[::step], xs[::step]
    gset = set(grid)
    coarse = sorted((d for d in gset if float(d) == int(d)),
                    key=lambda d: (abs(d), d))
    best = (-1.0, 0.0)
    for deg, score in zip(coarse,
                          _profile_scores(ys, xs, img.shape, coarse)):
        if score > best[0]:
            best = (score, deg)
    fine = [d for d in (best[1] - 0.5, best[1] + 0.5) if d in gset]
    if fine:
        for deg, score in zip(fine,
                              _profile_scores(ys, xs, img.shape, fine)):
            if score > best[0] or (score == best[0]
                                   and (abs(deg), deg) < (abs(best[1]),
                                                          best[1])):
                best = (score, deg)
    return best[1]


def deskew(img: np.ndarray) -> tuple[np.ndarray, float]:
    """Estimate the skew angle and return (upright canvas, angle).  Uses
    the binary ink-scatter derotation — the extraction pipeline consumes
    only the thresholded mask downstream."""
    deg = estimate_skew(img)
    return derotate_ink(img, deg), deg
