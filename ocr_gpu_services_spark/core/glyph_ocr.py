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


def orientation_score(img: np.ndarray, atlas: np.ndarray) -> float:
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
    """
    ink = img < 128
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
    af = atlas.astype(np.float32)
    a_sum = af.sum(axis=1)
    best = -1.0
    for off in range(CELL):
        x0 = int(xs.min()) - off
        ncell = (int(xs.max()) - x0) // CELL + 1
        pad = np.zeros((CELL, ncell * CELL), dtype=bool)
        lo = max(x0, 0)
        pad[:e - s, lo - x0:xs.max() + 1 - x0] = strip[:, lo:xs.max() + 1]
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


def ocr_page(img: np.ndarray, atlas: np.ndarray, charset: str
             ) -> tuple[str, list[Span]]:
    """Locate the glyph grid, batch-match every cell, emit text + spans.

    DUAL-ENGINE record families (the reference exposes two OCR engines
    with different record shapes): per-WORD spans with per-word
    confidence — docTR's word records
    (/root/reference/src/infrastructure/services/optional_services.py:33-42)
    — followed by per-LINE spans whose confidence is the mean of the
    line's word confidences — PaddleOCR's line records
    (/root/reference/src/infrastructure/services/ocr_service.py:26-36).
    Both families carry independent confidences over the same pixels."""
    ink = img < 128
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return "", []
    y0, x0 = int(ys.min()), int(xs.min())
    n_rows = (int(ys.max()) - y0) // PITCH_Y + 1
    n_cols = (int(xs.max()) - x0) // CELL + 1

    # gather all cells of the page into one (n_rows*n_cols, 64) batch
    cells = np.zeros((n_rows, n_cols, 64), dtype=np.uint8)
    for r in range(n_rows):
        yy = y0 + r * PITCH_Y
        band = ink[yy:yy + CELL, x0:x0 + n_cols * CELL]
        pad = np.zeros((CELL, n_cols * CELL), dtype=bool)
        pad[:band.shape[0], :band.shape[1]] = band
        cells[r] = (pad.reshape(CELL, n_cols, CELL)
                       .transpose(1, 0, 2).reshape(n_cols, 64))
    flat = cells.reshape(-1, 64)

    # single vectorized matching step: agreement popcount against the atlas
    # via one small matmul — for 0/1 vectors a and b,
    # eq-count = 64 - sum(a) - sum(b) + 2*(a . b).  Blank cells (most of
    # a page grid: margins, gaps, blanked symbol regions) skip the
    # matmul entirely — they decode to " " and their conf is never read
    # (word ranges are maximal nonspace runs), so the skip is exact.
    blank = ~flat.any(axis=1)
    nb_idx = np.nonzero(~blank)[0]
    ff = flat[nb_idx].astype(np.float32)
    af = atlas.astype(np.float32)
    agree = (64.0 - ff.sum(axis=1)[:, None] - af.sum(axis=1)[None, :]
             + 2.0 * (ff @ af.T)).astype(np.int32)           # (nnb, K)
    best = np.zeros(flat.shape[0], dtype=np.int64)
    conf = np.zeros(flat.shape[0], dtype=np.float64)
    best[nb_idx] = agree.argmax(axis=1)
    conf[nb_idx] = agree.max(axis=1) / 64.0

    # vectorized decode: the per-cell Python loop was the kernel's
    # hottest remaining block.  Character grid in one fancy-index, word
    # runs from one transition diff per page, per-word conf as a
    # contiguous slice mean (bit-identical to the old per-index list
    # mean: same float64 elements in the same order)
    charr = np.array(list(charset))
    grid = np.where(blank, " ", charr[best]).reshape(n_rows, n_cols)
    lines = ["".join(row).rstrip() for row in grid]
    conf2 = conf.reshape(n_rows, n_cols)

    nonspace = (grid != " ")
    # cells beyond each line's rstripped end are trailing blanks — they
    # are already False in nonspace (blank cells decode to " ")
    d = np.diff(nonspace.astype(np.int8), axis=1)
    spans: list[Span] = []
    line_spans: list[Span] = []
    for r in range(n_rows):
        starts = list(np.nonzero(d[r] == 1)[0] + 1)
        ends = list(np.nonzero(d[r] == -1)[0] + 1)
        if nonspace[r, 0]:
            starts.insert(0, 0)
        if nonspace[r, -1]:
            ends.append(n_cols)
        line = lines[r]
        row_words: list[Span] = []
        for start, c in zip(starts, ends):
            row_words.append(Span(
                text=line[start:c],
                conf=float(conf2[r, start:c].mean()),
                x0=float(x0 + start * CELL), y0=float(y0 + r * PITCH_Y),
                x1=float(x0 + c * CELL), y1=float(y0 + r * PITCH_Y + CELL),
                kind="word",
            ))
        spans.extend(row_words)
        if row_words:
            line_spans.append(Span(
                text=line[starts[0]:ends[-1]],
                conf=float(np.mean([w.conf for w in row_words])),
                x0=row_words[0].x0, y0=row_words[0].y0,
                x1=row_words[-1].x1, y1=row_words[-1].y1,
                kind="line",
            ))
    return canonical_text("\n".join(lines)), spans + line_spans
