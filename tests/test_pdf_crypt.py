"""Encrypted-PDF support (RC4 standard security handler, ISO 32000-1
§7.6): owner-locked files (empty USER password — the shape real tools
emit and every viewer opens silently) decrypt in place and extract
byte-identically to their plaintext twins; password-protected or AES
files degrade to the ``error`` column instead of crashing.  Parity: the
reference OCRs whatever pdf bytes its rasterizer opens
(/root/reference/routers/ocr.py) — owner-locked files included."""

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_gpu_services_spark.core import pdf_crypt as pc
from ocr_gpu_services_spark.core.extract import extract_document
from ocr_gpu_services_spark.core.pdf_extract import extract_pdf
from ocr_gpu_services_spark.fixtures.pdf_write import (CidPage, build_pdf,
                                                       content_stream_ops)

LINES = ["invoice total due now", "second line of body text",
         "third line closes the page"]


# ------------------------------------------------------------ primitives

def test_rc4_published_vectors():
    # the three canonical public RC4 test vectors
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == \
        "BBF316E8D940AF0AD3"
    assert pc.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert pc.rc4(b"Secret", b"Attack at dawn").hex().upper() == \
        "45A01F645FC35B383552544B9BF5"


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=16), st.binary(max_size=512))
def test_rc4_involution(key, data):
    assert pc.rc4(key, pc.rc4(key, data)) == data


def test_object_key_truncation():
    # Algorithm 1 caps the per-object key at 16 bytes (128-bit files:
    # 16+5 -> 16), 40-bit files get 5+5=10
    assert len(pc.object_key(b"k" * 16, 7, 0)) == 16
    assert len(pc.object_key(b"k" * 5, 7, 0)) == 10


def test_literal_string_escapes():
    # /O and /U may arrive as literal strings with escapes, not hex
    raw = bytes(range(32))
    esc = b"".join(b"\\%03o" % b for b in raw)
    body = b"<< /O (" + esc + b") >>"
    assert pc._string_after(body, b"/O") == raw


# ----------------------------------------------------------- round-trips

@pytest.mark.parametrize("bits", [40, 128])
@pytest.mark.parametrize("compress", [False, True, "lzw"])
def test_encrypted_text_pdf_matches_plain_twin(bits, compress):
    enc = build_pdf([content_stream_ops(LINES)],
                    compress=compress, encrypt=bits)
    plain = build_pdf([content_stream_ops(LINES)], compress=compress)
    assert b"/Encrypt" in enc
    assert LINES[0].encode() not in enc          # payload actually hidden
    te, se = extract_pdf(enc)
    tp, sp = extract_pdf(plain)
    assert te == tp and te
    assert [s.text for s in se] == [s.text for s in sp]


@pytest.mark.parametrize("bits", [40, 128])
def test_encrypted_scanned_page_ocr(bits):
    img = np.full((64, 128), 255, np.uint8)
    img[20:30, 10:100] = 0
    enc = build_pdf([img], compress=True, encrypt=bits)
    plain = build_pdf([img], compress=True)
    assert extract_pdf(enc) == extract_pdf(plain)


def test_encrypted_cid_page():
    assert extract_pdf(build_pdf([CidPage(LINES)], encrypt=128)) == \
        extract_pdf(build_pdf([CidPage(LINES)]))


def test_unencrypted_passthrough_is_identity():
    pdf = build_pdf([content_stream_ops(LINES)])
    assert pc.decrypt_pdf(pdf) is pdf


# ----------------------------------------------------------- error paths

def test_wrong_user_password_degrades_to_error():
    enc = build_pdf([content_stream_ops(LINES)], encrypt=128)
    bad = re.sub(rb"/U <[0-9a-f]{8}", b"/U <deadbeef", enc)
    ct, text, spans, _, _, err = extract_document(bad, None)
    assert text == "" and "password" in err


def test_aes_detected_and_rejected():
    enc = build_pdf([content_stream_ops(LINES)], encrypt=128)
    aes = enc.replace(b"/V 2 /R 3", b"/V 4 /R 4")
    ct, text, spans, _, _, err = extract_document(aes, None)
    assert text == "" and "unsupported" in err


def test_missing_encrypt_object_degrades():
    pdf = build_pdf([content_stream_ops(LINES)])
    # dangling /Encrypt ref in the trailer
    broken = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 99 0 R")
    ct, text, spans, _, _, err = extract_document(broken, None)
    assert text == "" and "Encrypt" in err


# ----------------------------------------------- modern (PDF 1.5) layout

@pytest.mark.parametrize("bits", [40, 128])
def test_encrypted_objstm_layout(bits):
    """The modern encrypted shape: ObjStm container + XRef stream.  The
    ObjStm stream is RC4'd per ITS object number (packed objects inside
    ride the container, spec §7.6.2); the XRef stream is never encrypted
    and carries /Encrypt + /ID in its dict."""
    args = dict(compress=True, objstm=True)
    e = build_pdf([content_stream_ops(LINES), CidPage(LINES)],
                  **args, encrypt=bits)
    p = build_pdf([content_stream_ops(LINES), CidPage(LINES)], **args)
    assert b"/Type /ObjStm" in e and b"/Encrypt" in e
    assert LINES[0].encode() not in e
    assert extract_pdf(e) == extract_pdf(p)


def test_encrypted_objstm_scanned_page():
    img = np.full((48, 96), 255, np.uint8)
    img[10:20, 5:90] = 0
    e = build_pdf([img], compress=True, objstm=True, encrypt=128)
    p = build_pdf([img], compress=True, objstm=True)
    assert extract_pdf(e) == extract_pdf(p)


# --------------------------------------------------------------- fixtures

def test_tiny_corpus_carries_both_key_widths():
    """Salt check (CLAUDE.md invariant): the 'pdfenc' side stream must
    land at least one 40-bit and one 128-bit row in tiny so the DuckDB
    gate decrypts both; goldens are pinned byte-identical separately."""
    from ocr_gpu_services_spark.fixtures import gen
    widths = set()
    for row in gen.gen_rows("tiny"):
        p = row.get("html")
        if p and p.startswith(b"%PDF") and b"/Encrypt" in p:
            widths.add(40 if b"/V 1 /R 2" in p else 128)
    assert widths == {40, 128}
