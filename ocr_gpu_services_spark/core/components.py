"""Connected components over a binary ink mask (P6 made real).

The reference finds signature / document regions as cv2 contours over a
thresholded page (/root/reference/src/infrastructure/services/
optional_services.py:86-106, document_detector at src/ml/document_detector/
main.py).  cv2 is not in this container, so this is a from-scratch numpy
labeling with the same output contract: per-component bounding box + ink
area (the two quantities the reference's filters consume:
``cv2.boundingRect`` + ``cv2.contourArea``).

Algorithm: image-wide horizontal run extraction (ONE transition diff over
the row-separated flat mask), per-row-pair overlap pairing via
``np.searchsorted`` (8-connectivity, like cv2 contours), then a path-halving
union-find over the run pairs.  Cost is O(runs log runs) with runs ≪ pixels
for page-like images — the kernel's per-page cost is dominated by the OCR
matmul, not labeling.
"""

from __future__ import annotations

import numpy as np


def _runs(ink: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All horizontal ink runs, image-wide: (row, x_start, x_end_exclusive),
    sorted by (row, x_start).  One vectorized transition scan: each row is
    padded with a False separator column so runs never straddle rows."""
    h, w = ink.shape
    flat = np.zeros((h, w + 1), dtype=bool)
    flat[:, :w] = ink
    f = flat.reshape(-1)
    d = np.diff(f.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if f[0]:
        starts = np.concatenate(([0], starts))
    ry = starts // (w + 1)
    rs = starts - ry * (w + 1)
    re = ends - ry * (w + 1)
    return ry.astype(np.int64), rs.astype(np.int64), re.astype(np.int64)


def connected_components(ink: np.ndarray) -> list[dict]:
    """Label 8-connected components of a 2-D bool mask.

    Returns a list of {y0, x0, y1, x1, area} dicts (bbox inclusive, area =
    ink pixel count), sorted by (y0, x0, y1, x1) for determinism.
    """
    y0, x0, y1, x1, area = connected_components_arrays(ink)
    return [{"y0": int(y0[i]), "x0": int(x0[i]),
             "y1": int(y1[i]), "x1": int(x1[i]), "area": int(area[i])}
            for i in range(y0.size)]


def connected_components_arrays(ink: np.ndarray):
    """Array form of ``connected_components``: five parallel int64 arrays
    (y0, x0, y1, x1, area), lexicographically sorted by (y0, x0, y1, x1) —
    the hot-kernel interface (no per-component Python objects)."""
    return connected_components_with_runs(ink)[0]


def connected_components_with_runs(ink: np.ndarray):
    """``connected_components_arrays`` plus the underlying run table:
    returns ((y0, x0, y1, x1, area), (ry, rs, re, run_comp)) where run
    (ry[i], rs[i]:re[i]) belongs to component run_comp[i] (an index into
    the sorted component arrays).  The run table lets callers touch
    exactly one component's pixels (e.g. blanking a non-text region
    without erasing ink from an overlapping component's bbox)."""
    ry, rs, re = _runs(ink)
    n = ry.size
    z = np.zeros(0, dtype=np.int64)
    if n == 0:
        return (z, z, z, z, z), (z, z, z, z)
    w = ink.shape[1]

    # Adjacency pairs (i in row y, j in row y-1), fully vectorized: embed
    # (row, coord) into one monotonic key space with stride w+2 so a single
    # global searchsorted finds each run's overlap range in the row above.
    # 8-connectivity with exclusive ends: touch iff
    #   rs[j] <= re[i]  and  re[j] >= rs[i]   (j one row above i)
    stride = w + 2
    g_rs = ry * stride + rs
    g_re = ry * stride + re
    key_lo = (ry - 1) * stride + rs          # first j with re[j] >= rs[i]
    key_hi = (ry - 1) * stride + re          # last  j with rs[j] <= re[i]
    jlo = np.searchsorted(g_re, key_lo, side="left")
    jhi = np.searchsorted(g_rs, key_hi, side="right")
    counts = np.maximum(jhi - jlo, 0)
    counts[ry == 0] = 0
    total = int(counts.sum())
    label = np.arange(n, dtype=np.int64)
    if total:
        offs = np.cumsum(counts) - counts
        pos = np.arange(total) - np.repeat(offs, counts)
        pj = np.repeat(jlo, counts) + pos
        pi = np.repeat(np.arange(n, dtype=np.int64), counts)
        # Shiloach-Vishkin with ROOT hooking: compress to stars, then
        # hook the larger ROOT of every cross-star edge onto the
        # smaller.  Hooking roots (not edge endpoints) is what makes
        # rounds logarithmic: a root survives a round only if it is
        # smaller than every adjacent star's root, so the root count
        # at least halves per round.  (The previous member-hook +
        # compress variant crept one boundary per round on curves with
        # many id-space local minima — 80 rounds on a sine scribble.)
        while True:
            while True:          # full path compression -> stars
                nn = label[label]
                if np.array_equal(nn, label):
                    break
                label = nn
            ru = label[pi]
            rv = label[pj]
            lo = np.minimum(ru, rv)
            hi = np.maximum(ru, rv)
            m = lo != hi
            if not m.any():
                break
            np.minimum.at(label, hi[m], lo[m])

    # per-component bbox/area via grouped reductions
    uniq, inv = np.unique(label, return_inverse=True)
    k = uniq.size
    y0 = np.full(k, np.iinfo(np.int64).max)
    y1 = np.full(k, -1, dtype=np.int64)
    x0 = np.full(k, np.iinfo(np.int64).max)
    x1 = np.full(k, -1, dtype=np.int64)
    area = np.zeros(k, dtype=np.int64)
    np.minimum.at(y0, inv, ry)
    np.maximum.at(y1, inv, ry)
    np.minimum.at(x0, inv, rs)
    np.maximum.at(x1, inv, re - 1)
    np.add.at(area, inv, re - rs)
    order = np.lexsort((x1, y1, x0, y0))
    rank = np.empty(k, dtype=np.int64)      # uniq index -> sorted position
    rank[order] = np.arange(k, dtype=np.int64)
    return (y0[order], x0[order], y1[order], x1[order], area[order]), \
        (ry, rs, re, rank[inv])
