"""U5 perspective rectification: 4-corner page extraction to a rectangle.

The reference photographs pages whose corners are not at right angles and
warps the quadrilateral to a rectangle before OCR
(/root/reference/src/ml/aligner/utils/evaluation/page_extractor.py:60-95,
``cv2.getPerspectiveTransform`` + ``cv2.warpPerspective``; corners found
by the recursive refine loop in corner_extractor.py:60-310).  cv2 is not
in this container, so this is the from-scratch analogue with the engine's
byte-exactness discipline — and an honest statement of when exactness is
even possible:

* A homography that preserves the length of any document edge must
  locally compress (scale < 1) somewhere (the projective parametrization
  along a pinned edge is non-uniform), so at EQUAL capture resolution two
  document pixels can land in one photo pixel: the warp destroys
  information and NO rectifier can be byte-exact.  cv2's bilinear warp is
  lossy for the same reason.
* At OVERSAMPLED capture — the photo grid finer than the document grid,
  the physically normal case — distinct document pixels stay >= 2*sigma
  apart on a 2x photo (sigma = the warp's minimum local scale, ~1 for
  mild keystones), which exceeds the nearest-neighbor rounding diameter
  of 1, so ink membership round-trips EXACTLY: gather at round(H(p)) of
  the photo reads back precisely the document's ink mask, with no
  tolerance and no luck involved.

So: the fixture generator photographs its pages at OVERSAMPLE x the
document grid (the camera-DPI knob every real capture pipeline records),
scatters each document ink pixel to its exact homography image, and the
rectifier inverts it structurally:

* corners: extreme points of the page mask (min/max of x+y and x-y) —
  exact for any convex quad tilted < 45 degrees;
* target size: the measured top/left edge lengths divided by the
  oversample factor (top edge horizontal, left edge vertical in the
  fixture family, so the lengths are exact integers);
* homography: direct linear transform, 8x8 float64 solve, the SAME
  code on both sides so generator and rectifier compute bit-identical
  matrices from the same corner integers;
* gather: document pixel p is ink iff the photo at round(H(p)) is ink;
  everything else reads back as paper (the document canvas is binary
  ink/paper — scanner-bed grays cannot be page content).
"""

from __future__ import annotations

import numpy as np

PAPER = 255
BED_LO, BED_HI = 128, 230      # exclusive ink bound, inclusive bed top
OVERSAMPLE = 2                 # fixture camera resolution / document grid


def solve_homography(src, dst) -> np.ndarray:
    """3x3 H with H @ (x, y, 1) ~ dst, from 4 (x, y) correspondences.
    Plain DLT with h33 = 1: an 8x8 float64 solve — deterministic, and
    shared by generator and rectifier so both get the same bits."""
    A = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = float(src[i][0]), float(src[i][1])
        u, v = float(dst[i][0]), float(dst[i][1])
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i], b[2 * i + 1] = u, v
    h = np.linalg.solve(A, b)
    return np.array([[h[0], h[1], h[2]],
                     [h[3], h[4], h[5]],
                     [h[6], h[7], 1.0]], dtype=np.float64)


def apply_h(Hm: np.ndarray, xs, ys):
    """Map point arrays through H; returns float64 (xs', ys')."""
    d = Hm[2, 0] * xs + Hm[2, 1] * ys + Hm[2, 2]
    return ((Hm[0, 0] * xs + Hm[0, 1] * ys + Hm[0, 2]) / d,
            (Hm[1, 0] * xs + Hm[1, 1] * ys + Hm[1, 2]) / d)


def quad_corners(mask: np.ndarray):
    """Corners (tl, tr, br, bl) as (x, y) int tuples from the extreme
    points of a convex page mask: tl/br extremize x+y, tr/bl extremize
    x-y.  First occurrence in row-major order breaks ties
    deterministically.

    Cost note: every extreme of x+y / x-y within a row is attained at
    that row's min or max x, so instead of materializing coordinate
    arrays for every page pixel (~200k on an oversampled photo — this
    function used to dominate the rectify cost) only the two boundary
    candidates per row are scanned, keeping the exact row-major
    tie-break (ascending y, min-x before max-x)."""
    rows = np.nonzero(mask.any(axis=1))[0]
    first = mask[rows].argmax(axis=1)
    last = mask.shape[1] - 1 - mask[rows, ::-1].argmax(axis=1)
    # candidate list in row-major tie-break order: (y, min x), (y, max x)
    cy = np.repeat(rows, 2)
    cx = np.stack([first, last], axis=1).ravel()
    s = cx + cy
    d = cx - cy
    tl = (int(cx[s.argmin()]), int(cy[s.argmin()]))
    br = (int(cx[s.argmax()]), int(cy[s.argmax()]))
    tr = (int(cx[d.argmax()]), int(cy[d.argmax()]))
    bl = (int(cx[d.argmin()]), int(cy[d.argmin()]))
    return tl, tr, br, bl


def _corner_h(corners, w: int, h: int) -> np.ndarray:
    """Document-rect -> photo-quad homography from 4 corner integers.
    One shared entry point so generator and rectifier get the same bits."""
    tl, tr, br, bl = corners
    return solve_homography(
        [(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)],
        [tl, tr, br, bl])


def rectify_page(img: np.ndarray, page_mask: np.ndarray,
                 oversample: int = OVERSAMPLE) -> np.ndarray:
    """Extract the quadrilateral page in ``img`` to an upright document
    canvas at 1/oversample of the photo resolution.

    ``page_mask`` marks page pixels (paper or ink) inside the crop; the
    rest is scanner bed.  The document grid dims come from the top/left
    edge lengths (exact integers for axis-aligned capture edges); each
    document pixel gathers its ink bit from the photo at round(H(p))."""
    tl, tr, br, bl = quad_corners(page_mask)
    w = int(round((tr[0] - tl[0]) / oversample)) + 1
    h = int(round((bl[1] - tl[1]) / oversample)) + 1
    if w <= 1 or h <= 1:
        return img          # degenerate page (line/point): nothing to warp
    try:
        Hm = _corner_h((tl, tr, br, bl), w, h)
    except np.linalg.LinAlgError:
        return img          # collinear corners: no homography exists
    # broadcast row/column vectors through H instead of materializing a
    # meshgrid: identical per-element float64 arithmetic, two fewer full
    # (h, w) allocations on the hot path.  (An O(ink) scatter variant —
    # inverse-map photo ink pixels and forward-check a 3x3 window — was
    # measured equivalent but ~1.4x SLOWER on the fixture corpus: pages
    # are ink-dense enough that nine masked passes over the ink set cost
    # more than one fused pass over the w*h grid.)
    xs = np.arange(w, dtype=np.float64)[None, :]
    ys = np.arange(h, dtype=np.float64)[:, None]
    qx, qy = apply_h(Hm, xs, ys)
    qxi = np.rint(qx).astype(np.int64)
    qyi = np.rint(qy).astype(np.int64)
    ih, iw = img.shape
    inside = (qxi >= 0) & (qxi < iw) & (qyi >= 0) & (qyi < ih)
    out = np.full((h, w), PAPER, dtype=img.dtype)
    vals = img[qyi[inside], qxi[inside]]
    out[inside] = np.where(vals < BED_LO, vals, PAPER)
    return out


def photograph_to_quad(flat: np.ndarray, corners, canvas_shape,
                       bed: int,
                       oversample: int = OVERSAMPLE) -> np.ndarray:
    """FIXTURE-side capture: photograph the binary document ``flat`` as
    the quadrilateral with the given (tl, tr, br, bl) photo-space corners
    on a bed-colored canvas at ``oversample`` x the document grid.

    The quad footprint (exact convex polygon of the corners) is paper;
    every document ink pixel is scattered to its exact homography image
    round(H(p)).  Requirements asserted here: the top edge is horizontal
    with length oversample*(w-1) and the left edge vertical with length
    oversample*(h-1) (so the rectifier recovers the document dims
    exactly), and the rectifier's gather restores the document
    byte-for-byte — which the oversampling argument in the module
    docstring guarantees for any warp whose minimum local scale exceeds
    1/oversample * 1/2."""
    fh, fw = flat.shape
    tl, tr, br, bl = corners
    assert tr[1] == tl[1] and tr[0] - tl[0] == oversample * (fw - 1)
    assert bl[0] == tl[0] and bl[1] - tl[1] == oversample * (fh - 1)
    out = np.full(canvas_shape, bed, dtype=flat.dtype)
    x0 = min(p[0] for p in corners)
    x1 = max(p[0] for p in corners)
    y0 = min(p[1] for p in corners)
    y1 = max(p[1] for p in corners)
    assert x0 >= 0 and y0 >= 0 and x1 < canvas_shape[1] \
        and y1 < canvas_shape[0], "quad exceeds canvas"
    # all geometry is computed in the quad-bbox-LOCAL frame — the frame
    # the rectifier sees after the page crop — so generator and engine
    # run solve_homography on identical corner integers and get the same
    # H bits.  (Solving in canvas coordinates gives an H differing in the
    # last ulps, and the fixture family produces positions at exact .5
    # fractions which then round differently: one lost ink pixel per few
    # pages, found the hard way.)
    quad = [(p[0] - x0, p[1] - y0) for p in (tl, tr, br, bl)]
    xs, ys = np.meshgrid(np.arange(x1 - x0 + 1, dtype=np.float64),
                         np.arange(y1 - y0 + 1, dtype=np.float64))
    # convex-polygon membership: non-negative cross product against every
    # directed edge (tl->tr->br->bl->tl is clockwise in image coords)
    inside = np.ones(xs.shape, dtype=bool)
    for i in range(4):
        ax, ay = quad[i]
        bx, by = quad[(i + 1) % 4]
        inside &= ((bx - ax) * (ys - ay) - (by - ay) * (xs - ax)) >= 0
    tile = out[y0:y1 + 1, x0:x1 + 1]
    tile[inside] = PAPER

    Hm = _corner_h(quad, fw, fh)
    iys, ixs = np.nonzero(flat < 128)
    qx, qy = apply_h(Hm, ixs.astype(np.float64), iys.astype(np.float64))
    qxi = np.rint(qx).astype(np.int64)
    qyi = np.rint(qy).astype(np.int64)
    tile[qyi, qxi] = flat[iys, ixs]

    # the contract, checked with the ENGINE's own code path
    page = (out < BED_LO) | (out > BED_HI)
    pys, pxs = np.nonzero(page)
    crop = out[pys.min():pys.max() + 1, pxs.min():pxs.max() + 1]
    mask = page[pys.min():pys.max() + 1, pxs.min():pxs.max() + 1]
    rec = rectify_page(crop, mask, oversample)
    assert rec.shape == flat.shape and (rec == flat).all(), \
        "photograph/rectify round trip not exact"
    return out
