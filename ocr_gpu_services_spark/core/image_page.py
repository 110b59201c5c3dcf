"""Image-page pipeline: decoded pixels -> deskew -> regions -> text + spans.

This is the Spark engine's analogue of the reference's full image route:
align/deskew first (/root/reference/src/infrastructure/utils/
image_processing.py:33-48, classification route classification.py:44-49),
then contour-based region detection (optional_services.py:86-106 signature,
:56-78 QR), then OCR over the text region (ocr_service.py:13-43).  Runs
entirely inside the Arrow extraction kernel — pure numpy per page, no
per-row Python visible to Spark.

Region classification over connected components (bbox w/h in pixels):
  * h <= CELL            -> glyph text (words OCRed by the template matcher)
  * finder-ring triple   -> QR Model 2 symbol (core/qrcode.py) ->
                            kind='qr' span, text = RS-corrected payload
  * P7 signature predicate (0.2 < w/h < 5, 100 < w < 500, 50 < h < 200,
    the reference's exact constants, optional_services.py:96-106)
                         -> kind='signature' span, conf = ink density
  * anything else        -> ignored (stray ink)

Coordinates are canonical: relative to (global ink bbox min - MARGIN), so a
rotated page deskews to the SAME span geometry as its upright twin (the
rotation's canvas padding cancels out).
"""

from __future__ import annotations

import numpy as np

from . import barcode, qrcode
from .geometry import deskew
from .glyph_ocr import CELL, MARGIN, ocr_page
from .spans import Span


def _is_p7_signature(w: int, h: int) -> bool:
    ar = w / h
    return 0.2 < ar < 5.0 and 100 < w < 500 and 50 < h < 200


def _max_band_height(ink: np.ndarray) -> int:
    """Tallest maximal run of consecutive ink-bearing rows."""
    rowink = ink.any(axis=1)
    if not rowink.any():
        return 0
    d = np.diff(rowink.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if rowink[0]:
        starts = np.concatenate(([0], starts))
    if rowink[-1]:
        ends = np.concatenate((ends, [rowink.size]))
    return int((ends - starts).max())


def process_image_page(img: np.ndarray, atlas: np.ndarray, charset: str
                       ) -> tuple[str, list[Span]]:
    """Full image route; returns (extracted_text, spans)."""
    from .components import connected_components_with_runs

    # U5 page extraction (reference aligner/utils/evaluation/
    # page_extractor.py:17-95: find the document region, extract it,
    # process the crop): page pixels are paper or ink; anything else is
    # background (scanner bed / photo surround).  The crop's bbox is the
    # placed page canvas itself, so downstream deskew stays pixel-exact.
    page = (img < 128) | (img > 230)
    if not page.all():
        prow = page.any(axis=1)
        if not prow.any():
            return "", []
        pcol = page.any(axis=0)
        sl = (slice(int(prow.argmax()),
                    int(prow.size - prow[::-1].argmax())),
              slice(int(pcol.argmax()),
                    int(pcol.size - pcol[::-1].argmax())))
        img, page = img[sl], page[sl]
        if not page.all():
            # bed pixels INSIDE the crop bbox: the page is a photographed
            # quadrilateral, not an axis-aligned scan — rectify it (U5
            # perspective, reference page_extractor.py:60-95 /
            # corner_extractor.py:60-310).  The rectified canvas is the
            # document grid; everything downstream (deskew, components,
            # OCR) continues unchanged.
            from .perspective import rectify_page
            img = rectify_page(img, page)

    # upright-text fast path, decided BEFORE the skew search: if no
    # horizontal ink band is taller than a glyph row, the page has no
    # rotation signal (a >=1-degree rotation smears glyph rows taller than
    # CELL wherever its shear offsets are nonzero; where they are all zero
    # the rotation IS the identity) and no signature/marker region (those
    # are 30+ px tall) — so the skew estimate, derotation and component
    # labeling are all skipped and the page OCRs directly.  This is the
    # majority case (plain scanned text).
    from .glyph_ocr import orientation_score

    # orientation classification (reference parity: PaddleOCR runs with
    # use_angle_cls=True, ocr_service.py:13 — rotated text is detected
    # and corrected before recognition).  Four-way vote on the first
    # glyph-height ink band of each candidate rotation, lazily: the
    # common (correct) orientation settles after ONE score.  A perfect
    # 64.0 is PROOF of orientation — no atlas glyph equals any quarter-
    # or half-rotation of a glyph (asserted in build_atlas) — and every
    # correction is a pure pixel permutation, hence byte-exact.  A page
    # that reaches 64.0 is also exactly upright, so the skew path is
    # skipped entirely.
    ink = img < 128
    s0 = orientation_score(img, atlas, ink)
    settled = s0 == 64.0
    if not settled:
        # candidate orientations are scored on rot90 VIEWS of the ink
        # mask (rotating the mask equals thresholding rotated pixels) —
        # a losing candidate costs no full-page copy or compare; only
        # the winner's gray canvas is materialized
        if s0 > -1.0:
            # a glyph-height band exists in place but is imperfect: the
            # common cause is an upside-down scan (a half-turn preserves
            # band structure), so only the cheap 180 candidate is tried
            # here — a quarter-turned page that presented a spurious
            # glyph-height band (a 1-char word's column band) is caught
            # by the last-resort four-way vote below, not here, so the
            # hot skewed-page path pays no extra rotations
            if orientation_score(None, atlas, np.rot90(ink, 2)) == 64.0:
                img = np.ascontiguousarray(np.rot90(img, 2))
                ink = np.ascontiguousarray(np.rot90(ink, 2))
                settled = True
        else:
            # no glyph-height band in place: quarter-turned, text-free,
            # or heavily skewed — try both quarter turns
            for k in (1, 3):
                if orientation_score(None, atlas, np.rot90(ink, k)) == 64.0:
                    img = np.ascontiguousarray(np.rot90(img, k))
                    ink = np.ascontiguousarray(np.rot90(ink, k))
                    settled = True
                    break

    fast_upright = False
    if settled:
        upright = img
    else:
        # no rotation yields a perfect glyph row: either a skewed page
        # (deskew restores it exactly, then the 180 re-vote below
        # settles direction) or a page with no text rows at all
        fast_upright = _max_band_height(ink) <= CELL
        pre_deskew = img
        if fast_upright:
            upright = img
        else:
            upright, _angle = deskew(img)
            ink = upright < 128
        up_score = orientation_score(upright, atlas, ink)
        if up_score < 64.0:  # a perfect in-place row can never be beaten
            # last-resort FOUR-way vote (half-turn first): upside-down
            # scans settle on k=2 after one extra score exactly as
            # before; a quarter-turned page that slipped past the band
            # heuristic reaches the k=1/3 candidates instead of being
            # OCRed sideways.  rot90 mask views are scored without a
            # copy or a compare; only the winner is materialized.
            best_k, best_score, best_src = 0, up_score, upright
            for k in (2, 1, 3):
                s = orientation_score(None, atlas, np.rot90(ink, k))
                if s > best_score:
                    best_k, best_score, best_src = k, s, upright
                    if s == 64.0:
                        break
            if best_score < 64.0 and upright is not pre_deskew:
                # the deskew itself may have been misled (a quarter-
                # turned barcode's bars read as a skewed line pattern,
                # so the shear destroyed the glyph grid): re-vote on the
                # PRE-deskew pixels — a perfect row there is proof the
                # page was an exact quarter/half turn with no real skew
                pre_ink = pre_deskew < 128
                for k in (1, 3, 2):
                    if orientation_score(None, atlas,
                                         np.rot90(pre_ink, k)) == 64.0:
                        best_k, best_score, best_src = k, 64.0, pre_deskew
                        break
            if best_k != 0 or best_src is not upright:
                upright = np.ascontiguousarray(np.rot90(best_src, best_k))
                ink = upright < 128
    irow = ink.any(axis=1)
    if not irow.any():
        return "", []
    oy = int(irow.argmax()) - MARGIN     # canonical-frame origin
    ox = int(ink.any(axis=0).argmax()) - MARGIN

    if fast_upright or _max_band_height(ink) <= CELL:
        text, word_spans = ocr_page(upright, atlas, charset, ink=ink)
        return text, [Span(s.text, s.conf, s.x0 - ox, s.y0 - oy,
                           s.x1 - ox, s.y1 - oy, s.kind)
                      for s in word_spans]

    (cy0, cx0, cy1, cx1, carea), (r_y, r_s, r_e, r_comp) = \
        connected_components_with_runs(ink)
    h = cy1 - cy0 + 1
    text_mask = h <= CELL                # glyph rows are exactly CELL tall
    big_idx = np.nonzero(~text_mask)[0]  # few: signature / marker / stray

    # QR Model 2 detection (U3, real spec): the three finder patterns of
    # a symbol are square-annulus connected components — locate them
    # (pixel-level 7x7 module check), group equal-pitch triples into
    # symbol bboxes, then decode the symbol region (format info ->
    # unmask -> zigzag codewords -> Reed-Solomon correction).
    qr_spans: list[Span] = []
    sig_spans: list[Span] = []
    qr_boxes: list[tuple[int, int, int, int]] = []
    rings: list[tuple[int, int, int, int]] = []
    for i in big_idx:
        y0, x0, y1, x1 = int(cy0[i]), int(cx0[i]), int(cy1[i]), int(cx1[i])
        if x1 - x0 == y1 - y0 and qrcode.is_finder_ring(
                upright[y0:y1 + 1, x0:x1 + 1]) is not None:
            rings.append((y0, x0, y1, x1))
    for (y0, x0, y1, x1) in qrcode.locate_symbols(rings):
        payload = qrcode.try_decode_region(upright[y0:y1 + 1, x0:x1 + 1])
        if payload is not None:
            qr_boxes.append((y0, x0, y1, x1))
            qr_spans.append(Span(
                text=payload, conf=1.0,
                x0=float(x0 - ox), y0=float(y0 - oy),
                x1=float(x1 + 1 - ox), y1=float(y1 + 1 - oy), kind="qr"))
    # 1-D symbology detection (U3, core/barcode.py): a barcode's bars
    # are thin equal-height components sharing EXACT top and bottom
    # rows — group by (y0, y1), decode the joint bbox by scanline.
    # EAN-13 is tried first (fixed 95-module geometry), then Code 128
    # (variable length, mod-103 check), then Code 39 ('*'-delimited
    # wide/narrow, 44-pattern table).  Each decoder's guard/parity/
    # checksum/structure chain rejects bar-ish non-symbols, and the
    # three cannot cross-read: run-count classes (59 / 6m+7 / 10n-1)
    # and exact width-sum checks are mutually exclusive.
    bc_spans: list[Span] = []
    bc_boxes: list[tuple[int, int, int, int]] = []
    bar_groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for i in big_idx:
        y0, x0, y1, x1 = int(cy0[i]), int(cx0[i]), int(cy1[i]), int(cx1[i])
        w, hh = x1 - x0 + 1, y1 - y0 + 1
        if w <= 4 * barcode.MODULE_W and hh >= 4 * w:
            bar_groups.setdefault((y0, y1), []).append((x0, x1))
    for (y0, y1), bars in bar_groups.items():
        if len(bars) < 16:   # EAN-13 renders 30 bars, min Code 128 is 16
            continue
        bx0 = min(b[0] for b in bars)
        bx1 = max(b[1] for b in bars)
        crop = upright[y0:y1 + 1, bx0:bx1 + 1]
        kind = "barcode"
        payload = barcode.try_decode_region(crop)
        if payload is None:
            kind = "code128"
            payload = barcode.try_decode_code128(crop)
        if payload is None:
            kind = "code39"
            payload = barcode.try_decode_code39(crop)
        if payload is not None:
            bc_boxes.append((y0, bx0, y1, bx1))
            bc_spans.append(Span(
                text=payload, conf=1.0,
                x0=float(bx0 - ox), y0=float(y0 - oy),
                x1=float(bx1 + 1 - ox), y1=float(y1 + 1 - oy),
                kind=kind))

    for i in big_idx:
        y0, x0, y1, x1 = int(cy0[i]), int(cx0[i]), int(cy1[i]), int(cx1[i])
        w, hh = x1 - x0 + 1, y1 - y0 + 1
        # components inside a decoded symbol (finder rings, alignment
        # pattern, bars) are symbol structure, never signatures
        if any(by0 <= y0 and y1 <= by1 and bx0 <= x0 and x1 <= bx1
               for (by0, bx0, by1, bx1) in qr_boxes + bc_boxes):
            continue
        if _is_p7_signature(w, hh):
            sig_spans.append(Span(
                text="", conf=round(int(carea[i]) / (w * hh), 4),
                x0=float(x0 - ox), y0=float(y0 - oy),
                x1=float(x1 + 1 - ox), y1=float(y1 + 1 - oy),
                kind="signature"))

    # components nested inside a decoded QR ring are the marker's interior
    # modules, not page text — drop them from the text set (vectorized)
    for (y0, x0, y1, x1) in qr_boxes:
        text_mask &= ~((cy0 >= y0) & (cy1 <= y1)
                       & (cx0 >= x0) & (cx1 <= x1))

    text, word_spans = "", []
    if text_mask.any():
        # crop to the glyph region and blank the FEW non-text components
        # inside it, so stray / signature / marker ink can't perturb the
        # grid locator.  Blanking uses each component's OWN ink runs, not
        # its bounding rectangle — a signature/QR/stray bbox overlapping a
        # text line must not erase glyph ink inside the rectangle.
        ty0 = int(cy0[text_mask].min())
        tx0 = int(cx0[text_mask].min())
        ty1 = int(cy1[text_mask].max())
        tx1 = int(cx1[text_mask].max())
        # blank directly in the INK MASK crop (a gray crop would only be
        # re-thresholded by ocr_page; setting a run to False equals
        # painting it paper) — saves a uint8 copy + full-crop compare
        text_ink = ink[ty0:ty1 + 1, tx0:tx1 + 1].copy()
        tw = tx1 - tx0 + 1
        blank = ~text_mask[r_comp]           # runs of non-text components
        for y, s, e in zip(r_y[blank], r_s[blank], r_e[blank]):
            if ty0 <= y <= ty1:
                text_ink[y - ty0,
                         max(int(s) - tx0, 0):
                         min(int(e) - tx0, tw)] = False
        text, word_spans = ocr_page(None, atlas, charset, ink=text_ink)
        word_spans = [Span(s.text, s.conf,
                           s.x0 + tx0 - ox, s.y0 + ty0 - oy,
                           s.x1 + tx0 - ox, s.y1 + ty0 - oy, s.kind)
                      for s in word_spans]

    sig_spans.sort(key=lambda s: (s.y0, s.x0))
    qr_spans.sort(key=lambda s: (s.y0, s.x0))
    bc_spans.sort(key=lambda s: (s.y0, s.x0))
    return text, word_spans + sig_spans + qr_spans + bc_spans
