"""Minimal PDF writer for fixture generation (stdlib only).

Emits standards-shaped PDFs: catalog/pages/page objects, Helvetica Type1
font, per-page content streams (optionally Flate-compressed), valid xref +
trailer.  The content streams deliberately exercise the full operator subset
the extractor supports — Td/TD/Tm/T*/Tj/TJ/' — including out-of-order text
emission and two-column layouts, so parser and generator are co-designed but
the parser is tested adversarially via the committed goldens (FIXTURES.md §1).
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def content_stream_ops(lines: list[str], *, two_col: bool = False,
                       scrambled: bool = False, use_tj: bool = False) -> bytes:
    """Build a content stream placing ``lines`` top-down; variants exercise
    different operators / emission orders."""
    ops = ["BT", "/F1 12 Tf", "14 TL"]
    if two_col:
        half = (len(lines) + 1) // 2
        cols = [(50.0, lines[:half]), (320.0, lines[half:])]
        for x, col_lines in cols:
            y = 742.0
            for i, ln in enumerate(col_lines):
                ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm")
                ops.append(f"({_esc(ln)}) Tj")
                y -= 14.0
    elif scrambled:
        # emit even-indexed lines first, then odd — positions still encode
        # the true reading order
        order = list(range(0, len(lines), 2)) + list(range(1, len(lines), 2))
        for i in order:
            y = 742.0 - i * 14.0
            ops.append(f"1 0 0 1 50 {y:.1f} Tm")
            if use_tj and " " in lines[i]:
                words = lines[i].split(" ")
                arr = " -180 ".join(f"({_esc(w)})" for w in words)
                ops.append(f"[{arr}] TJ")
            else:
                ops.append(f"({_esc(lines[i])}) Tj")
    else:
        ops.append("50 742 Td")
        first = True
        for ln in lines:
            if first:
                ops.append(f"({_esc(ln)}) Tj")
                first = False
            else:
                ops.append(f"({_esc(ln)}) '")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_pdf(pages: list, *, compress: bool = False) -> bytes:
    """Assemble a complete PDF.  Each page is either a content-stream
    ``bytes`` (born-digital text page) or a 2-D uint8 numpy array (a
    SCANNED page: the gray raster becomes a /DeviceGray 8-bit
    FlateDecode image XObject painted by the page's content stream —
    the shape real scan-to-PDF tools emit, which the extractor's OCR
    fallback must detect and route through the glyph-OCR kernel)."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    # allocate object numbers: 2 per text page, 3 per scanned page
    # (page, contents, image xobject), font last
    entries = []
    nxt = 3
    for p in pages:
        if isinstance(p, (bytes, bytearray)):
            entries.append((nxt, nxt + 1, None))
            nxt += 2
        else:
            entries.append((nxt, nxt + 1, nxt + 2))
            nxt += 3
    font_num = nxt
    kids = " ".join(f"{e[0]} 0 R" for e in entries)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               .encode())

    def stream_obj(body: bytes, extra: str = "") -> bytes:
        return ((f"<< {extra}/Length {len(body)} >>").encode()
                + b"\nstream\n" + body + b"\nendstream")

    for page, (pnum, cnum, xnum) in zip(pages, entries):
        if xnum is None:
            objs[pnum] = (
                f"<< /Type /Page /Parent 2 0 R /MediaBox "
                f"[0 0 {PAGE_W} {PAGE_H}] /Contents {cnum} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
            body = zlib.compress(page) if compress else bytes(page)
            filt = "/Filter /FlateDecode " if compress else ""
            objs[cnum] = stream_obj(body, filt)
        else:
            h, w = page.shape
            objs[pnum] = (
                f"<< /Type /Page /Parent 2 0 R /MediaBox "
                f"[0 0 {PAGE_W} {PAGE_H}] /Contents {cnum} 0 R "
                f"/Resources << /XObject << /Im0 {xnum} 0 R >> >> >>"
            ).encode()
            # paint the scan across the page; the extractor reads the
            # raster pixels directly, the cm matrix is presentation-only
            ops = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode("latin-1")
            objs[cnum] = stream_obj(ops)
            objs[xnum] = stream_obj(
                zlib.compress(page.tobytes()),
                f"/Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                f"/Filter /FlateDecode ")
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxnum = max(objs)
    out += f"xref\n0 {maxnum + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        off = offsets.get(num, 0)
        out += f"{off:010d} 00000 {'n' if num in offsets else 'f'} \n".encode()
    out += (f"trailer\n<< /Size {maxnum + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)
