"""Scanned-PDF OCR fallback (S4 completion): image-XObject-only pages
must route through the glyph-OCR kernel and extract byte-exactly, incl.
rotated / flipped / keystoned captures embedded in the pdf."""

import numpy as np

from ocr_gpu_services_spark.core.normalize import canonical_text
from ocr_gpu_services_spark.core.pdf_extract import extract_pdf
from ocr_gpu_services_spark.fixtures import imagegen
from ocr_gpu_services_spark.fixtures.pdf_write import (build_pdf,
                                                       content_stream_ops)


def _scan_img(lines, **plan_overrides):
    plan = {"lines": lines, "sig_seed": None, "qr_payload": None,
            "sig_x": 10, "qr_x": 10, "angle": 0.0, "bed": None,
            "persp": None, "flip": False, "turn": 0}
    plan.update(plan_overrides)
    return imagegen.render_image_page(plan), plan


def test_scanned_page_ocr_roundtrip():
    img, _ = _scan_img(["INVOICE TOTAL 42", "PAID IN FULL"])
    pdf = build_pdf([img])
    text, spans = extract_pdf(pdf)
    assert text == "INVOICE TOTAL 42\nPAID IN FULL"
    kinds = {s.kind for s in spans}
    assert kinds == {"word", "line"}
    assert [s.text for s in spans if s.kind == "word"] == \
        ["INVOICE", "TOTAL", "42", "PAID", "IN", "FULL"]
    assert [s.text for s in spans if s.kind == "line"] == \
        ["INVOICE TOTAL 42", "PAID IN FULL"]


def test_mixed_borndigital_and_scanned_pages():
    img, _ = _scan_img(["SCAN PAGE TWO"])
    digital = content_stream_ops(["first page line one",
                                  "first page line two"])
    text, spans = extract_pdf(build_pdf([digital, img]))
    assert text == canonical_text(
        "first page line one\nfirst page line two\n\nSCAN PAGE TWO")
    assert {s.kind for s in spans} == {"line", "word"}


def test_scanned_page_rotated_flipped_keystoned():
    # upside-down + skew on one page, perspective keystone on another,
    # quarter turn on a third — all must restore byte-exactly
    img1, _ = _scan_img(["BATCH SPARK 7"], flip=True, angle=2.0)
    img2, _ = _scan_img(["ARROW KERNEL 99"],
                        persp={"ddx": 20, "ddy": 14, "pad": (12, 9)})
    img3, _ = _scan_img(["RECEIPT 123"], turn=1)
    text, spans = extract_pdf(build_pdf([img1, img2, img3]))
    assert text == "BATCH SPARK 7\n\nARROW KERNEL 99\n\nRECEIPT 123"


def test_scanned_page_emits_qr_and_signature_spans():
    img, plan = _scan_img(["CONTRACT DUE"], sig_seed=99,
                          qr_payload="QR:7654321")
    text, spans = extract_pdf(build_pdf([img], compress=True))
    assert text == "CONTRACT DUE"
    by_kind = {}
    for s in spans:
        by_kind.setdefault(s.kind, []).append(s)
    assert [s.text for s in by_kind["qr"]] == ["QR:7654321"]
    meta = imagegen.canonical_meta(plan)
    sig = by_kind["signature"][0]
    assert (sig.x0, sig.y0, sig.x1, sig.y1) == meta["sig_span"]


def test_hex_string_page():
    from ocr_gpu_services_spark.fixtures.pdf_write import \
        content_stream_ops_hex
    ops = content_stream_ops_hex(["hex line one", "hex line two"])
    text, spans = extract_pdf(build_pdf([ops]))
    assert text == "hex line one\nhex line two"


def test_cid_font_page_via_tounicode():
    from ocr_gpu_services_spark.fixtures.pdf_write import CidPage
    lines = ["cid mapped text", "segunda línea"]
    text, spans = extract_pdf(build_pdf([CidPage(lines)]))
    assert text == canonical_text("cid mapped text\nsegunda línea")


def test_objstm_xref_stream_layout():
    """PDF 1.5: page tree and font objects live inside an /ObjStm
    container referenced by an XRef stream — the object-table expansion
    must surface them; mixing a CID page and a scanned page exercises
    streams staying outside the container."""
    from ocr_gpu_services_spark.fixtures.pdf_write import CidPage
    img, _ = _scan_img(["SCAN IN OBJSTM"])
    digital = content_stream_ops(["plain page first line",
                                  "plain page second line"])
    pdf = build_pdf([digital, CidPage(["cid in objstm"]), img],
                    objstm=True)
    assert pdf.startswith(b"%PDF-1.5")
    assert b"/ObjStm" in pdf and b"/Type /XRef" in pdf
    assert b"trailer" not in pdf             # no classic xref table
    text, spans = extract_pdf(pdf)
    assert text == ("plain page first line\nplain page second line\n\n"
                    "cid in objstm\n\nSCAN IN OBJSTM")


def test_textless_pdf_without_image_yields_empty():
    # no runs, no XObject -> no OCR route, empty text (not an error)
    text, spans = extract_pdf(build_pdf([content_stream_ops([])]))
    assert text == "" and spans == []
