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
  * square + QR-lite ring -> kind='qr' span, text = decoded payload
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

from . import qrlite
from .geometry import deskew
from .glyph_ocr import CELL, MARGIN, ocr_page
from .spans import Span


def _is_p7_signature(w: int, h: int) -> bool:
    ar = w / h
    return 0.2 < ar < 5.0 and 100 < w < 500 and 50 < h < 200


def process_image_page(img: np.ndarray, atlas: np.ndarray, charset: str
                       ) -> tuple[str, list[Span]]:
    """Full image route; returns (extracted_text, spans)."""
    from .components import connected_components

    upright, _angle = deskew(img)
    ink = upright < 128
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return "", []
    oy = int(ys.min()) - MARGIN          # canonical-frame origin
    ox = int(xs.min()) - MARGIN

    comps = connected_components(ink)
    qr_spans: list[Span] = []
    sig_spans: list[Span] = []
    text_comps: list[dict] = []
    qr_boxes: list[tuple[int, int, int, int]] = []
    strays: list[dict] = []
    for c in comps:
        w = c["x1"] - c["x0"] + 1
        h = c["y1"] - c["y0"] + 1
        if h <= CELL:
            text_comps.append(c)
            continue
        payload = (qrlite.try_decode(
            upright[c["y0"]:c["y1"] + 1, c["x0"]:c["x1"] + 1])
            if w == h else None)
        if payload is not None:
            qr_boxes.append((c["y0"], c["x0"], c["y1"], c["x1"]))
            qr_spans.append(Span(
                text=payload, conf=1.0,
                x0=float(c["x0"] - ox), y0=float(c["y0"] - oy),
                x1=float(c["x1"] + 1 - ox), y1=float(c["y1"] + 1 - oy),
                kind="qr"))
        elif _is_p7_signature(w, h):
            sig_spans.append(Span(
                text="", conf=round(c["area"] / (w * h), 4),
                x0=float(c["x0"] - ox), y0=float(c["y0"] - oy),
                x1=float(c["x1"] + 1 - ox), y1=float(c["y1"] + 1 - oy),
                kind="signature"))
        else:
            strays.append(c)

    # components nested inside a decoded QR ring are the marker's interior
    # modules, not page text — drop them from every bucket
    def _inside_qr(c) -> bool:
        return any(c["y0"] >= y0 and c["y1"] <= y1
                   and c["x0"] >= x0 and c["x1"] <= x1
                   for (y0, x0, y1, x1) in qr_boxes)

    text_comps = [c for c in text_comps if not _inside_qr(c)]

    text, word_spans = "", []
    if text_comps:
        # re-render ONLY the glyph components onto a clean cropped page so
        # stray / signature / marker ink can't perturb the grid locator
        ty0 = min(c["y0"] for c in text_comps)
        tx0 = min(c["x0"] for c in text_comps)
        ty1 = max(c["y1"] for c in text_comps)
        tx1 = max(c["x1"] for c in text_comps)
        text_img = np.full((ty1 - ty0 + 1, tx1 - tx0 + 1), 255,
                           dtype=upright.dtype)
        for c in text_comps:
            text_img[c["y0"] - ty0:c["y1"] + 1 - ty0,
                     c["x0"] - tx0:c["x1"] + 1 - tx0] = \
                upright[c["y0"]:c["y1"] + 1, c["x0"]:c["x1"] + 1]
        text, word_spans = ocr_page(text_img, atlas, charset)
        word_spans = [Span(s.text, s.conf,
                           s.x0 + tx0 - ox, s.y0 + ty0 - oy,
                           s.x1 + tx0 - ox, s.y1 + ty0 - oy, s.kind)
                      for s in word_spans]

    sig_spans.sort(key=lambda s: (s.y0, s.x0))
    qr_spans.sort(key=lambda s: (s.y0, s.x0))
    return text, word_spans + sig_spans + qr_spans
