"""Keyword document classifier — exact semantics of the reference.

Mirrors /root/reference/src/infrastructure/services/classification_service.py:29-43:
* ordered type dict: invoice, receipt, contract, id (insertion order matters —
  FIRST type with >= 1 substring hit wins, later types never checked)
* a hit is a case-insensitive *substring* containment test
* confidence = matches / len(keywords) for the winning type
* no hit anywhere -> ("unknown", 0.0)

This module is the oracle/kernel twin; the Spark twin is a pure built-in
expression chain (ordered CASE WHEN) in
ocr_gpu_services_spark/functions/classify.py so classification never leaves
the JVM.
"""

from __future__ import annotations

DOCUMENT_KEYWORDS: list[tuple[str, list[str]]] = [
    ("invoice", ["invoice", "factura", "bill", "cuenta"]),
    ("receipt", ["receipt", "recibo", "ticket", "comprobante"]),
    ("contract", ["contract", "contrato", "agreement", "acuerdo"]),
    ("id", ["id", "identification", "identificación", "dni", "passport"]),
]


# keyword casefolding hoisted out of the per-document loop (the constants
# are already lowercase; kw.lower() ran 17x per classified document)
_KEYWORDS_LOWER: list[tuple[str, list[str]]] = [
    (t, [kw.lower() for kw in kws]) for t, kws in DOCUMENT_KEYWORDS]


def classify_text(text: str) -> tuple[str, float]:
    low = text.lower()
    for doc_type, keywords in _KEYWORDS_LOWER:
        matches = sum(1 for kw in keywords if kw in low)
        if matches > 0:
            return doc_type, matches / len(keywords)
    return "unknown", 0.0
