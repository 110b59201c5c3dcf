"""Content-type sniffing by magic bytes (pure-Python twin of the Spark expr).

The reference dispatches on the uploaded *filename extension* with a
jpg/jpeg/png/pdf whitelist (/root/reference/src/api/v1/routers/ocr.py:51-57);
our batch engine has no filenames, so we sniff the payload bytes, which is
strictly more robust.  The Spark side implements the identical decision as a
built-in column expression (ocr_gpu_services_spark/operators/sniff.py); this
module is the oracle/kernel twin and the single source of truth for the
constants.
"""

from __future__ import annotations

MAGIC_PDF = b"%PDF-"
MAGIC_PNG = b"\x89PNG\r\n\x1a\n"
MAGIC_JPG = b"\xff\xd8\xff"

CT_HTML = "html"
CT_PDF = "pdf"
CT_IMAGE = "image"
CT_TEXT = "text"
CT_UNKNOWN = "unknown"


def sniff_content_type(payload: bytes | None, text: str | None) -> str:
    """Classify a raw payload.  Mirrors the whitelist semantics of the
    reference (pdf/png/jpg accepted; anything else with markup treated as
    html; empty payload falls back to the pre-extracted ``text`` column)."""
    if payload is None or len(payload) == 0:
        return CT_TEXT if text is not None else CT_UNKNOWN
    if payload[:5] == MAGIC_PDF:
        return CT_PDF
    if payload[:8] == MAGIC_PNG or payload[:3] == MAGIC_JPG:
        return CT_IMAGE
    return CT_HTML
