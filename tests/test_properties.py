"""Property tests (SURVEY.md §5.2 item 5): the extraction core must be
total (never throws on arbitrary payload bytes), deterministic (same input
-> same bytes, always), and canonicalization idempotent."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_gpu_services_spark.core.extract import extract_document
from ocr_gpu_services_spark.core.normalize import canonical_text, collapse_ws
from ocr_gpu_services_spark.core.sniff import sniff_content_type

MAGICS = [b"", b"%PDF-", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
          b"<html>", b"<!DOCTYPE html>"]


@settings(max_examples=200, deadline=None)
@given(prefix=st.sampled_from(MAGICS), payload=st.binary(max_size=2048),
       pre_text=st.one_of(st.none(), st.text(max_size=200)))
def test_extract_document_is_total_and_deterministic(prefix, payload,
                                                     pre_text):
    """Arbitrary (possibly magic-prefixed, truncated, malformed) payloads
    must produce a row — error column, never an exception — and the exact
    same row on a second call (kernel rows are retried by Spark tasks, so
    nondeterminism would break byte-identity across retries)."""
    blob = prefix + payload
    r1 = extract_document(blob, pre_text)
    r2 = extract_document(blob, pre_text)
    ct, text, spans, _dt, _conf, err = r1
    assert ct in {"html", "pdf", "image", "text", "unknown"}
    assert (text is None) or isinstance(text, str)
    assert r1[0] == r2[0] and r1[1] == r2[1] and r1[5] == r2[5]
    assert [s.as_dict() for s in r1[2]] == [s.as_dict() for s in r2[2]]


@settings(max_examples=300, deadline=None)
@given(s=st.text(max_size=500))
def test_canonicalization_idempotent(s):
    c = canonical_text(collapse_ws(s))
    assert canonical_text(collapse_ws(c)) == c


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=64),
       text=st.one_of(st.none(), st.text(max_size=20)))
def test_sniff_total(payload, text):
    assert sniff_content_type(payload, text) in {
        "html", "pdf", "image", "text", "unknown"}
