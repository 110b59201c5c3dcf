"""Deterministic OCR stub: 8x8 glyph-template renderer + vectorized matcher.

The container has no GPU / Paddle / docTR (SURVEY.md §7.0), so the OCR
"model" is a numpy template matcher over an unambiguous glyph atlas.  What is
kept REAL — and what the north rule cares about — is the Spark-side
architecture of the reference's OCR services
(/root/reference/src/infrastructure/services/ocr_service.py:13-43,
/root/reference/src/api/v1/routers/ocr.py:26-29,70-74):

* model (atlas) loaded once per partition, not per row
  (reference singleton pattern, /root/reference/src/api/v1/dependencies.py:8-20)
* micro-batched tensor inference: all glyph cells of a batch are matched in
  ONE (cells x atlas) einsum — no per-row Python in the hot loop (the
  analogue of the batched ``torch.linalg.lstsq`` at
  /root/reference/src/ml/classifier/model.py:257-261)
* per-word output records {text, confidence, position}
  (ocr_service.py:32-36) -> Span(kind='word')

Atlas glyphs are derived from sha256(char) bits, verified pairwise-distinct
at import; confidence = fraction of agreeing pixels (1.0 on clean renders).
Swapping in a real engine means replacing `match_cells` only.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .normalize import canonical_text
from .spans import Span

CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,:-/$#@&%"
CELL = 8          # glyph cell size in px
PITCH_Y = 12      # vertical line pitch
MARGIN = 4        # page margin
INK, PAPER = 0, 255


def _glyph_bits(ch: str) -> np.ndarray:
    h = hashlib.sha256(f"glyph:{ch}".encode()).digest()[:8]
    bits = np.unpackbits(np.frombuffer(h, dtype=np.uint8)).reshape(8, 8)
    if not bits.any():
        bits[0, 0] = 1
    return bits.astype(np.uint8)


def build_atlas() -> tuple[np.ndarray, str]:
    """(K, 64) uint8 bit matrix + charset string.  The 'model weights'."""
    mats = np.stack([_glyph_bits(c).reshape(64) for c in CHARSET])
    # unambiguity check: all glyphs pairwise distinct and non-blank
    assert len({m.tobytes() for m in mats}) == len(CHARSET)
    # orientation-decidability check: no glyph is any quarter- or
    # half-rotation of any glyph (incl. itself), so a rotated glyph row
    # can never score a perfect match — the orientation vote
    # (orientation_score) is provably unambiguous, not probabilistically
    # so, for all four scan orientations
    upright = {m.tobytes() for m in mats}
    for k in (1, 2, 3):
        rotated = {np.ascontiguousarray(
            np.rot90(m.reshape(8, 8), k)).reshape(64).tobytes()
            for m in mats}
        assert not (rotated & upright), f"rot{90 * k} glyph collision"
    return mats, CHARSET


def render_text_image(lines: list[str]) -> np.ndarray:
    """Render lines of CHARSET text (plus spaces) to a grayscale page."""
    lines = [ln.rstrip() for ln in lines]
    ncols = max((len(ln) for ln in lines), default=0)
    h = 2 * MARGIN + max(len(lines) - 1, 0) * PITCH_Y + CELL
    w = 2 * MARGIN + max(ncols, 1) * CELL
    img = np.full((h, w), PAPER, dtype=np.uint8)
    for r, ln in enumerate(lines):
        y = MARGIN + r * PITCH_Y
        for c, ch in enumerate(ln):
            if ch == " ":
                continue
            bits = _glyph_bits(ch)
            x = MARGIN + c * CELL
            img[y:y + CELL, x:x + CELL] = np.where(bits == 1, INK, PAPER)
    return img


_AF_CACHE: tuple[int, np.ndarray, np.ndarray] | None = None


def _atlas_f32(atlas: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(float32 atlas, per-glyph bit counts), cached per atlas object —
    both matchers need this pair on every call and the conversion was a
    measurable share of small-page OCR cost."""
    global _AF_CACHE
    if _AF_CACHE is None or _AF_CACHE[0] != id(atlas):
        af = atlas.astype(np.float32)
        _AF_CACHE = (id(atlas), af, af.sum(axis=1))
    return _AF_CACHE[1], _AF_CACHE[2]


def orientation_score(img: np.ndarray, atlas: np.ndarray,
                      ink: np.ndarray | None = None) -> float:
    """Glyph-agreement score of the page's FIRST glyph-height ink band —
    the orientation classifier (the engine's stand-in for PaddleOCR's
    ``use_angle_cls=True``, reference ocr_service.py:13).

    Finds the topmost maximal run of ink-bearing rows no taller than a
    glyph cell (signature/QR bands are 30+ px and skipped), slices it
    into CELL-wide cells at the best of the CELL possible x-alignments,
    and returns the mean per-cell agreement with the atlas over non-blank
    cells.  A correctly-oriented clean glyph row scores exactly 64.0 at
    its true alignment; an upside-down one can never reach 64.0 (no atlas
    glyph equals a 180-rotated glyph — asserted in build_atlas).  Returns
    -1.0 when the page has no glyph-height band (nothing to vote with).

    ``ink`` lets callers pass the already-thresholded mask (or a rot90
    VIEW of it — rotating the mask equals thresholding the rotated
    pixels) so candidate orientations are scored without materializing a
    rotated gray canvas or re-running a full-page compare.
    """
    ink = (img < 128) if ink is None else ink
    rowink = ink.any(axis=1)
    if not rowink.any():
        return -1.0
    d = np.diff(rowink.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if rowink[0]:
        starts = np.concatenate(([0], starts))
    if rowink[-1]:
        ends = np.concatenate((ends, [rowink.size]))
    band = next(((s, e) for s, e in zip(starts, ends) if e - s <= CELL),
                None)
    if band is None:
        return -1.0
    s, e = band
    strip = ink[s:e]
    xs = np.nonzero(strip.any(axis=0))[0]
    af, a_sum = _atlas_f32(atlas)
    xmin, xmax = int(xs.min()), int(xs.max())
    best = -1.0
    for off in range(CELL):
        x0 = xmin - off
        ncell = (xmax - x0) // CELL + 1
        pad = np.zeros((CELL, ncell * CELL), dtype=bool)
        lo = max(x0, 0)
        pad[:e - s, lo - x0:xmax + 1 - x0] = strip[:, lo:xmax + 1]
        cells = pad.reshape(CELL, ncell, CELL).transpose(1, 0, 2) \
                   .reshape(ncell, 64)
        nb = cells.any(axis=1)
        if not nb.any():
            continue
        cf = cells[nb].astype(np.float32)
        agree = (64.0 - cf.sum(axis=1)[:, None] - a_sum[None, :]
                 + 2.0 * (cf @ af.T)).max(axis=1)
        best = max(best, float(agree.mean()))
        if best == 64.0:      # perfect row: no alignment can beat it
            break
    return best


def ocr_page(img: np.ndarray, atlas: np.ndarray, charset: str,
             ink: np.ndarray | None = None) -> tuple[str, list[Span]]:
    """Locate the glyph grid, batch-match every cell, emit text + spans.

    DUAL-ENGINE record families (the reference exposes two OCR engines
    with different record shapes): per-WORD spans with per-word
    confidence — docTR's word records
    (/root/reference/src/infrastructure/services/optional_services.py:33-42)
    — followed by per-LINE spans whose confidence is the mean of the
    line's word confidences — PaddleOCR's line records
    (/root/reference/src/infrastructure/services/ocr_service.py:26-36).
    Both families carry independent confidences over the same pixels.
    ``ink`` optionally supplies the already-thresholded mask (callers on
    the image route hold it) — one fewer full-page compare."""
    if ink is None:
        ink = img < 128
    # ink bbox without materializing every ink coordinate (argmax on the
    # row/column occupancy profiles gives the identical min/max values)
    rowink = ink.any(axis=1)
    if not rowink.any():
        return "", []
    colink = ink.any(axis=0)
    y0 = int(rowink.argmax())
    y_max = int(rowink.size - 1 - rowink[::-1].argmax())
    x0 = int(colink.argmax())
    x_max = int(colink.size - 1 - colink[::-1].argmax())
    n_rows = (y_max - y0) // PITCH_Y + 1
    n_cols = (x_max - x0) // CELL + 1

    # gather all cells of the page into one (n_rows*n_cols, 64) batch:
    # one zero-padded copy of the ink bbox, then a pure reshape/transpose
    # (PITCH_Y-strided glyph bands -> per-cell bit rows); identical cell
    # values to the former per-row gather loop
    gh, gw = n_rows * PITCH_Y, n_cols * CELL
    pad = np.zeros((gh, gw), dtype=bool)
    sub = ink[y0:y0 + gh, x0:x0 + gw]
    pad[:sub.shape[0], :sub.shape[1]] = sub
    flat = (pad.reshape(n_rows, PITCH_Y, n_cols, CELL)[:, :CELL]
               .transpose(0, 2, 1, 3).reshape(n_rows * n_cols, 64))

    # single vectorized matching step: agreement popcount against the atlas
    # via one small matmul — for 0/1 vectors a and b,
    # eq-count = 64 - sum(a) - sum(b) + 2*(a . b).  Blank cells (most of
    # a page grid: margins, gaps, blanked symbol regions) skip the
    # matmul entirely — they decode to " " and their conf is never read
    # (word ranges are maximal nonspace runs), so the skip is exact.
    # Agreement counts are small integers, exact in float32, so
    # argmax/max equal the old int32 path bit-for-bit.
    blank = ~flat.any(axis=1)
    nb_idx = np.nonzero(~blank)[0]
    # duplicate-cell collapse: a page's nonblank cells draw from a small
    # glyph population, so most rows of the (nnb, K) matmul are repeats.
    # Pack each 64-bit cell into one uint64, unique it, match only the
    # representatives, and scatter through the inverse map — identical
    # input rows produce identical float rows, hence identical
    # argmax/max, so the scattered values are bit-for-bit the full
    # computation's (typically ~50x fewer matmul rows).
    nb_cells = flat[nb_idx]
    keys = np.packbits(nb_cells, axis=1).view(np.uint64).ravel()
    _, first, inv = np.unique(keys, return_index=True, return_inverse=True)
    fu = nb_cells[first].astype(np.float32)
    af, a_sum = _atlas_f32(atlas)
    agree = (64.0 - fu.sum(axis=1)[:, None] - a_sum[None, :]
             + 2.0 * (fu @ af.T))                             # (nuniq, K)
    best = np.zeros(flat.shape[0], dtype=np.int64)
    conf = np.zeros(flat.shape[0], dtype=np.float64)
    best[nb_idx] = agree.argmax(axis=1)[inv]
    conf[nb_idx] = (agree.max(axis=1).astype(np.float64) / 64.0)[inv]

    # vectorized decode: byte-LUT the glyph indices (charset is ASCII),
    # blank cells become spaces, and the page text is ONE bytes->str
    # decode sliced per row (no per-cell string joins)
    lut = np.frombuffer(charset.encode("ascii"), dtype=np.uint8)
    codes = lut[best]
    codes[blank] = 32
    page_str = codes.tobytes().decode("ascii")
    lines = [page_str[r * n_cols:(r + 1) * n_cols].rstrip()
             for r in range(n_rows)]

    nonspace = (codes != 32).reshape(n_rows, n_cols)
    # cells beyond each line's rstripped end are trailing blanks — they
    # are already False in nonspace (blank cells decode to " ").  Word
    # runs come from ONE page-wide transition scan over a False-padded
    # copy (two nonzero calls per page, not two per row); np.nonzero
    # yields them in (row, col) order, so rows group contiguously.
    padded = np.zeros((n_rows, n_cols + 2), dtype=np.int8)
    padded[:, 1:-1] = nonspace
    d = np.diff(padded, axis=1)
    srow, scol = np.nonzero(d == 1)
    ecol = np.nonzero(d == -1)[1]
    spans: list[Span] = []
    line_spans: list[Span] = []
    nwords = srow.size
    if nwords:
        # all word confidences in one reduceat: each cell conf is k/64
        # (exactly representable), so any summation order gives the exact
        # sum and sum/len equals the old per-slice np.mean bit-for-bit
        fs = srow * n_cols + scol
        fe = srow * n_cols + ecol
        idx = np.empty(2 * nwords, dtype=np.int64)
        idx[0::2] = fs
        idx[1::2] = fe
        if idx[-1] >= conf.size:   # last word ends at the last cell
            wsums = np.add.reduceat(conf, idx[:-1])[0::2]
        else:
            wsums = np.add.reduceat(conf, idx)[0::2]
        wmeans = wsums / (fe - fs)
        i = 0
        while i < nwords:
            r = int(srow[i])
            j = i
            y0f = float(y0 + r * PITCH_Y)
            y1f = float(y0 + r * PITCH_Y + CELL)
            line = lines[r]
            while j < nwords and srow[j] == r:
                start, c = scol[j], ecol[j]
                spans.append(Span(
                    text=line[start:c],
                    conf=float(wmeans[j]),
                    x0=float(x0 + start * CELL), y0=y0f,
                    x1=float(x0 + c * CELL), y1=y1f,
                    kind="word",
                ))
                j += 1
            line_spans.append(Span(
                text=line[scol[i]:ecol[j - 1]],
                conf=float(np.mean(wmeans[i:j])),
                x0=float(x0 + scol[i] * CELL), y0=y0f,
                x1=float(x0 + ecol[j - 1] * CELL), y1=y1f,
                kind="line",
            ))
            i = j
    return canonical_text("\n".join(lines)), spans + line_spans
