"""PDF standard security handler (RC4): decrypt-on-read + fixture-side
encryption.

Real crawl corpora contain owner-locked PDFs — encrypted with a non-empty
OWNER password but an EMPTY user password — which every viewer opens
silently (the reference's OCR stack reads them through its PDF rasterizer
the same way; parity: /root/reference/routers/ocr.py rasterizes whatever
pdf bytes arrive).  This module implements the published standard
security handler from ISO 32000-1 §7.6 (PDF 1.7): RC4 stream cipher,
/V 1 (40-bit, /R 2) and /V 2 (up to 128-bit, /R 3), empty-user-password
key derivation (Algorithm 2), /U verification (Algorithms 4/5), and
per-object keys (Algorithm 1).

Scope notes (documented, not silent):

* RC4 is LENGTH-PRESERVING, so decryption happens in place on the raw
  payload: every object's stored stream bytes are replaced with their
  plaintext and all offsets and /Length values stay valid — the regex
  extractor then parses the decrypted file exactly like an unencrypted
  one.  Decryption runs BEFORE filter decoding (spec order: the stored
  bytes are cipher(filter(data))).
* Object-level strings (doc-info /Title etc.) are NOT consumed by the
  extractor, so they are left encrypted; strings inside content streams
  become plaintext when their stream is decrypted (strings inside object
  streams are, per spec, not separately encrypted).
* XRef streams are never encrypted (spec) and are skipped; the /Encrypt
  dictionary's own entries are exempt by definition.
* /V 4+ (/AESV2, crypt filters) and non-empty USER passwords raise
  ValueError — the row degrades to its ``error`` column upstream
  (core/extract.py catches per-row).
"""

from __future__ import annotations

import hashlib
import re
import struct

# ISO 32000-1 §7.6.3.3 padding constant (public spec table)
PAD = bytes((
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A))


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA).  Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def file_key(o: bytes, p: int, id0: bytes, r: int, nbytes: int,
             user_pw: bytes = b"") -> bytes:
    """Algorithm 2: the file encryption key from the USER password."""
    md = hashlib.md5(_pad_password(user_pw) + o[:32]
                     + struct.pack("<i", p) + id0)
    key = md.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


def owner_value(owner_pw: bytes, user_pw: bytes, r: int,
                nbytes: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:nbytes]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for step in range(1, 20):
            o = rc4(bytes(b ^ step for b in key), o)
    return o


def user_value(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    u = hashlib.md5(PAD + id0).digest()
    u = rc4(key, u)
    for step in range(1, 20):
        u = rc4(bytes(b ^ step for b in key), u)
    return u + b"\x00" * 16          # R3: last 16 bytes are arbitrary


def verify_user_password(u: bytes, key: bytes, id0: bytes, r: int) -> bool:
    expect = user_value(key, id0, r)
    return u[:16] == expect[:16] if r >= 3 else u[:32] == expect[:32]


def object_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: per-object RC4 key."""
    md = hashlib.md5(key + num.to_bytes(3, "little")
                     + gen.to_bytes(2, "little"))
    return md.digest()[:min(len(key) + 5, 16)]


# ---------------------------------------------------------------- parse

_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
_XREF_TYPE_RE = re.compile(rb"/Type\s*/XRef\b")

_ESCAPES = {ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8,
            ord("f"): 12, ord("("): 40, ord(")"): 41, ord("\\"): 92}


def _string_after(body: bytes, name: bytes) -> bytes | None:
    """Value of ``name`` when it is a PDF string: ``<hex>`` or a literal
    ``( ... )`` with standard escapes (spec §7.3.4)."""
    m = re.search(re.escape(name) + rb"\s*", body)
    if not m:
        return None
    pos = m.end()
    if pos >= len(body):
        return None
    if body[pos:pos + 1] == b"<":
        h = re.match(rb"<([0-9A-Fa-f\s]*)>", body[pos:])
        if not h:
            return None
        hx = re.sub(rb"\s", b"", h.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    if body[pos:pos + 1] != b"(":
        return None
    out = bytearray()
    depth, k = 1, pos + 1
    while k < len(body) and depth:
        c = body[k]
        if c == 0x5C and k + 1 < len(body):          # backslash escape
            nxt = body[k + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                k += 2
            elif 0x30 <= nxt <= 0x37:                # \ooo octal
                oct_ = body[k + 1:k + 4]
                n = 0
                used = 0
                for ch in oct_:
                    if 0x30 <= ch <= 0x37:
                        n = n * 8 + (ch - 0x30)
                        used += 1
                    else:
                        break
                out.append(n & 0xFF)
                k += 1 + used
            else:                                     # \<other>: drop \
                out.append(nxt)
                k += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if not depth:
                break
        out.append(c)
        k += 1
    return bytes(out)


def _int_after(body: bytes, name: bytes, default: int | None = None):
    m = re.search(re.escape(name) + rb"\s+(-?\d+)", body)
    return int(m.group(1)) if m else default


def decrypt_pdf(data: bytes) -> bytes:
    """Return the decrypted-equivalent file, or ``data`` unchanged when
    no /Encrypt is present.  Raises ValueError for unsupported schemes
    or a non-empty user password (caller degrades the row to ``error``).
    """
    # search the TAIL only: the governing trailer (or XRef-stream dict)
    # of an incrementally-updated file is the last one, and a binary
    # content stream elsewhere could contain these bytes by coincidence
    tail = data[-4096:]
    em = _ENC_REF_RE.search(tail)
    if not em:
        return data
    enc_num = int(em.group(1))
    objects = [(int(m.group(1)), int(m.group(2)), m.start(3), m.group(3))
               for m in _OBJ_RE.finditer(data)]
    enc_body = next((b for n, g, s, b in objects if n == enc_num), None)
    if enc_body is None:
        raise ValueError("encrypted PDF: /Encrypt object missing")
    filt = re.search(rb"/Filter\s*/(\w+)", enc_body)
    if not filt or filt.group(1) != b"Standard":
        raise ValueError("unsupported PDF encryption filter")
    v = _int_after(enc_body, b"/V", 0)
    r = _int_after(enc_body, b"/R", 2)
    if v not in (1, 2) or r not in (2, 3):
        raise ValueError(f"unsupported PDF encryption (V={v} R={r})")
    o = _string_after(enc_body, b"/O")
    u = _string_after(enc_body, b"/U")
    p = _int_after(enc_body, b"/P")
    if o is None or u is None or p is None:
        raise ValueError("encrypted PDF: malformed /Encrypt dictionary")
    nbits = _int_after(enc_body, b"/Length", 40)
    nbytes = 5 if v == 1 else max(5, min(16, nbits // 8))
    idm = _ID_RE.search(tail)
    id0 = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
    key = file_key(o, p, id0, r, nbytes)
    if not verify_user_password(u, key, id0, r):
        raise ValueError("encrypted PDF: user password required")

    out = bytearray(data)
    for num, gen, bstart, body in objects:
        if num == enc_num:
            continue
        sm = _STREAM_START_RE.search(body)
        if not sm:
            continue
        head = body[:sm.start()]
        if _XREF_TYPE_RE.search(head):
            continue                      # XRef streams are never encrypted
        lm = _LENGTH_RE.search(head)
        if lm:
            start, length = sm.end(), int(lm.group(1))
        else:
            m2 = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.S)
            if not m2:
                continue
            start, length = m2.start(1), len(m2.group(1))
        plain = rc4(object_key(key, num, gen),
                    bytes(body[start:start + length]))
        out[bstart + start:bstart + start + length] = plain
    return bytes(out)
