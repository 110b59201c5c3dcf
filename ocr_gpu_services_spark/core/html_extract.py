"""Main-content extraction from HTML: stdlib DOM walk + Boilerpipe-style
number-of-words / link-density block classification.

This is the HTML analogue of the reference's "extract the document's text"
primary path (docTR ``result.render()`` at
/root/reference/src/api/v1/routers/ocr.py:72-74): one canonical text string
per document plus a flat span list
(/root/reference/src/infrastructure/services/optional_services.py:33-42).

Design (public knowledge only):
* Parsing: ``html.parser.HTMLParser`` (stdlib) streaming into a flat list of
  *text blocks*, flushed at block-level tag boundaries.
* Boilerplate classification: the published Boilerpipe
  ``NumWordsRulesClassifier`` decision tree (Kohlschütter et al., WSDM 2010,
  "Boilerplate Detection using Shallow Text Features") over
  (words, link_density) of the previous/current/next block.  Deterministic,
  no floats beyond exact ratios.

Output: ``(text, spans)`` where spans are block spans
``(text, conf, x0, y0, x1, y1, kind='block')`` with x0/x1 = char offsets of
the block inside the final text and y0/y1 = block ordinal, so geometry stays
meaningful without a renderer.

Used verbatim by both the golden oracle and the Spark ``mapInArrow`` kernel —
that shared implementation is what makes byte-identity across parallelism
levels structural rather than coincidental.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

from .html_tokenize import _CDATA_CLOSE, _SCAN
from .normalize import canonical_text, collapse_ws
from .spans import Span

# Subtrees that never contribute content text.
SKIP_TAGS = {
    "script", "style", "noscript", "template", "head", "title",
    "nav", "footer", "aside", "form", "header", "button", "iframe",
    "svg", "select", "option", "object", "embed",
}

# Tags that terminate/open a text block.
BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "body", "html",
    "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "figure", "figcaption", "hr", "br",
    "address", "fieldset", "legend",
}

HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


@dataclass
class _Block:
    tag: str
    pieces: list = field(default_factory=list)        # (collapsed_piece, is_link)

    def finish(self):
        # single pass over pieces (this runs once per flushed block on
        # every document; it was 3 generator passes)
        link_chars = total_chars = 0
        parts = []
        for p, is_link in self.pieces:
            parts.append(p)
            n = len(p)
            total_chars += n
            if is_link:
                link_chars += n
        text = collapse_ws(" ".join(parts))
        words = len(text.split()) if text else 0
        link_density = (link_chars / total_chars) if total_chars > 0 else 0.0
        return text, words, link_density


class _BlockHandler:
    """Event consumer shared by the fast tokenizer (production path) and
    the stdlib HTMLParser (cross-check twin in tests)."""

    def __init__(self):
        self.blocks: list[tuple[str, int, float, str]] = []  # (text, words, ld, tag)
        self._skip_depth = 0
        self._link_depth = 0
        self._cur = _Block("body")

    # -- flushing ---------------------------------------------------------
    def _flush(self, next_tag: str):
        text, words, ld = self._cur.finish()
        if text:
            self.blocks.append((text, words, ld, self._cur.tag))
        self._cur = _Block(next_tag)

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush(tag if tag not in ("br", "hr") else self._cur.tag)

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a" and self._link_depth:
            self._link_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush(self._cur.tag)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in SKIP_TAGS:
            self.handle_endtag(tag)
        else:
            # self-closing skip tag opens nothing
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        piece = collapse_ws(data)
        if piece:
            self._cur.pieces.append((piece, self._link_depth > 0))


def _is_content(prev, curr, nxt) -> bool:
    """Boilerpipe NumWordsRulesClassifier (published decision tree).

    prev/curr/nxt are (words, link_density) tuples; prev/nxt may be (0, 0.0)
    at the edges.
    """
    p_words, p_ld = prev
    c_words, c_ld = curr
    n_words, _ = nxt
    if c_ld > 0.333333:
        return False
    if p_ld <= 0.555556:
        if c_words <= 16 and n_words <= 15 and p_words <= 4:
            return False
        return True
    # high-link-density predecessor
    if c_words <= 40 and n_words <= 17:
        return False
    return True


class _StdlibBlockParser(_BlockHandler, HTMLParser):
    """stdlib-tokenized twin (tests assert corpus-wide equality with the
    fast tokenizer; see html_tokenize.py)."""

    def __init__(self):
        _BlockHandler.__init__(self)
        HTMLParser.__init__(self, convert_charrefs=True)


def _blocks_fused(raw: str) -> list[tuple[str, int, float, str]]:
    """Fused tokenizer + block extractor: the feed_events scan loop and the
    _BlockHandler event logic inlined into ONE function with local state.

    Profiling put the per-event Python method dispatch (4 hook calls per
    markup token, ~140 events/doc over 70% of the corpus) at a third of
    HTML-route CPU; fusing removes every hook call and the per-block
    dataclass.  Event-for-event identical to
    ``feed_events(raw, _BlockHandler())`` — pinned three-ways against the
    handler and the stdlib twin over the whole corpus
    (tests/test_core.py::test_fast_tokenizer_matches_stdlib).

    Two algebraic shortcuts (exact, not approximations):
    * pieces are ``collapse_ws`` outputs (nonempty, single internal
      spaces, no edge whitespace), so the per-flush
      ``collapse_ws(" ".join(parts))`` is the identity and is skipped;
    * ``len(text.split())`` therefore equals the sum of per-piece token
      counts, accumulated at data time (``len(toks)``) instead of
      re-scanning the joined block.
    """
    blocks: list[tuple[str, int, float, str]] = []
    skip_depth = 0
    link_depth = 0
    cur_tag = "body"
    parts: list[str] = []
    link_chars = total_chars = words = 0

    def flush(next_tag: str) -> None:
        nonlocal parts, link_chars, total_chars, words, cur_tag
        if parts:
            blocks.append((" ".join(parts), words,
                           link_chars / total_chars, cur_tag))
            parts = []
            link_chars = total_chars = words = 0
        cur_tag = next_tag

    search = _SCAN.search
    pos = 0
    n = len(raw)
    while pos < n:
        m = search(raw, pos)
        if m is None:
            break
        s = m.start()
        if s > pos and not skip_depth:
            d = raw[pos:s]
            toks = (unescape(d) if "&" in d else d).split()
            if toks:
                piece = " ".join(toks)
                parts.append(piece)
                ln = len(piece)
                total_chars += ln
                if link_depth:
                    link_chars += ln
                words += len(toks)
        pos = m.end()
        close, name, selfclose = m.group(1, 2, 3)
        if name is None:                        # comment/declaration/PI
            continue
        tag = name.lower()
        if close:
            # handle_endtag
            if tag in SKIP_TAGS:
                if skip_depth:
                    skip_depth -= 1
            elif not skip_depth:
                if tag == "a" and link_depth:
                    link_depth -= 1
                if tag in BLOCK_TAGS:
                    flush(cur_tag)
        elif selfclose:
            # handle_startendtag: starttag then endtag (skip tags net out)
            if tag not in SKIP_TAGS and not skip_depth:
                if tag in BLOCK_TAGS:
                    flush(tag if tag not in ("br", "hr") else cur_tag)
                    flush(cur_tag)
        else:
            # handle_starttag
            if tag in SKIP_TAGS:
                skip_depth += 1
            elif not skip_depth:
                if tag == "a":
                    link_depth += 1
                if tag in BLOCK_TAGS:
                    flush(tag if tag not in ("br", "hr") else cur_tag)
            cd = _CDATA_CLOSE.get(tag)
            if cd is not None:                  # CDATA content element
                # raw CDATA body bypasses unescape (feed_events calls
                # handle_data directly); script/style are SKIP_TAGS so
                # the body is dropped by the skip guard exactly as the
                # handler drops it — only the position jump matters
                mc = cd.search(raw, pos)
                if mc is None:
                    pos = n
                else:
                    # handle_endtag(tag): tag is a SKIP_TAG
                    if skip_depth:
                        skip_depth -= 1
                    pos = mc.end()
    if pos < n and not skip_depth:
        d = raw[pos:]
        toks = (unescape(d) if "&" in d else d).split()
        if toks:
            piece = " ".join(toks)
            parts.append(piece)
            ln = len(piece)
            total_chars += ln
            if link_depth:
                link_chars += ln
            words += len(toks)
    flush(cur_tag)
    return blocks


def extract_html(payload: bytes,
                 _stdlib_tokenizer: bool = False) -> tuple[str, list[Span]]:
    """Extract main content text + block spans from raw HTML bytes."""
    raw = payload.decode("utf-8", errors="replace")
    if _stdlib_tokenizer:
        parser = _StdlibBlockParser()
        parser.feed(raw)
        parser.close()
        parser._flush(parser._cur.tag)
        blocks = parser.blocks
    else:
        blocks = _blocks_fused(raw)
    feats = [(w, ld) for (_, w, ld, _) in blocks]
    kept: list[tuple[str, str]] = []
    for i, (text, words, ld, tag) in enumerate(blocks):
        prev = feats[i - 1] if i > 0 else (0, 0.0)
        nxt = feats[i + 1] if i + 1 < len(blocks) else (0, 0.0)
        # headings are kept when low-link-density: they label the content
        # that follows (reference keeps all rendered text; we only drop
        # boilerplate).
        if tag in HEADING_TAGS:
            if ld <= 0.333333 and i + 1 < len(blocks) and _is_content(
                (words, ld), feats[i + 1],
                feats[i + 2] if i + 2 < len(blocks) else (0, 0.0),
            ):
                kept.append((text, tag))
            continue
        if _is_content(prev, (words, ld), nxt):
            kept.append((text, tag))

    spans: list[Span] = []
    offset = 0
    parts: list[str] = []
    for idx, (text, tag) in enumerate(kept):
        norm = canonical_text(text)
        parts.append(norm)
        spans.append(Span(
            text=norm, conf=1.0,
            x0=float(offset), y0=float(idx),
            x1=float(offset + len(norm)), y1=float(idx),
            kind="block",
        ))
        offset += len(norm) + 2  # the "\n\n" joiner
    return canonical_text("\n\n".join(parts)), spans
