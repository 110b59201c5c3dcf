"""Deterministic text canonicalization shared by the pure-Python oracle and
every Spark kernel.

The reference performs only implicit canonicalization (``" ".join`` /
``.strip()``: /root/reference/src/ml/classifier/utils/filters.py:37,
/root/reference/src/infrastructure/services/classification_service.py:23).
The north rule demands explicit, deterministic Unicode + whitespace
canonicalization so extracted text is byte-identical across oracle, Spark,
and any parallelism level.  Rules (applied in this order):

1. line endings -> LF
2. every run of Unicode whitespace inside a block -> single ASCII space
3. block stripped
4. NFC normalization of the final string

``collapse_ws`` is the per-block rule; ``canonical_text`` is the final
document-level rule (blocks are joined by the caller before NFC).
"""

from __future__ import annotations

import re
import unicodedata

_WS_RE = re.compile(r"\s+")


def collapse_ws(s: str) -> str:
    """Collapse all whitespace runs to a single space and strip.

    Implemented as split/join, which is byte-identical to
    ``re.sub(r"\\s+", " ", s).strip()`` (str.split and regex \\s use the
    same Unicode whitespace set — verified by a full character sweep +
    hypothesis parity test in tests/test_properties.py) and ~3x faster in
    the extraction hot loop, where it runs once per DOM text node."""
    return " ".join(s.split())


def canonical_text(s: str) -> str:
    """Final document canonicalization: CRLF/CR -> LF, NFC."""
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    return unicodedata.normalize("NFC", s)
