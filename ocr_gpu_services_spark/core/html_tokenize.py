"""Fast HTML event tokenizer feeding the block extractor.

Profiling showed stdlib ``html.parser`` at ~83% of HTML extraction time
(0.5 ms/doc); this single-regex tokenizer emits the only four events the
block extractor consumes — handle_starttag / handle_endtag /
handle_startendtag / handle_data (char/entity refs decoded) — ~4x faster.

Semantics match ``HTMLParser(convert_charrefs=True)`` for well-formed
markup: comments/declarations/PIs are silent, tag names lowercase,
attributes tolerated (quoted '>' included), script/style bodies are CDATA
(one data event until the matching close tag).  Edge behavior on
pathological fragments (bare '<', unterminated tags at EOF) is total and
deterministic but may differ from the stdlib in where data chunks split;
``tests/test_core.py::test_fast_tokenizer_matches_stdlib`` pins equality
of the *extraction result* over the whole fixture corpus.

Used by BOTH the golden oracle and the Spark kernel (one shared module =
structural byte-identity; see html_extract.py docstring).
"""

from __future__ import annotations

import re
from html import unescape

_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script[^>]*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style[^>]*>", re.IGNORECASE),
}

# one scan token = comment | declaration/PI | complete tag.  The attr
# run uses a POSSESSIVE star (Python 3.11): the alternatives are
# mutually exclusive at every position (plain chars / slash / quoted
# string start on disjoint characters), so possessive matching accepts
# the identical language — but a failing tag (a '<name' with no
# terminating '>' in 4 KB of garbage) fails in linear time instead of
# exponentially re-splitting the run.  A fuzz probe caught the
# backtracking blowup: 4 KB of random bytes sniffed as HTML took >10 s
# per document with the old `(?:...)*` — a crawl-scale DoS, present
# since round 1 and never triggered by well-formed fixtures.
# '/' is consumed as attr content only when NOT followed by '>' —
# otherwise the greedy attr run would swallow the self-close slash of
# '<iframe/>' and the skip-tag depth counter would never come back
# down.  The comment alternative is first (a comment may contain '>')
# and swallows to EOF when unterminated, matching the old find-based
# behavior.  groups: (1)=closing '/', (2)=tag name, (3)=self-close '/'
_SCAN = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<(?:"
    r"[!?][^>]*>"
    r"|(/)?([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"(?:[^<>'\"/]+|/(?!>)|\"[^\"]*\"|'[^']*')*+"
    r"(/)?>"
    r")",
    re.DOTALL,
)


def _data(handler, s: str) -> None:
    if s:
        handler.handle_data(unescape(s) if "&" in s else s)


def feed_events(raw: str, handler) -> None:
    """Tokenize ``raw`` and invoke the handler's four event hooks.

    Repeated C-level ``_SCAN.search(raw, pos)`` calls locate every
    markup token; text between tokens (including bare '<' that opens no
    tag) is data.  CDATA bodies (script/style) are jumped by moving
    ``pos`` past the close tag and resuming the search THERE — a plain
    ``finditer`` is wrong here because a match that *starts* inside the
    jumped region but *ends* past it would be skipped while the iterator
    still advanced past its end, swallowing real markup after the CDATA
    close (e.g. ``<script><p x='</script><b>z</b>'>`` lost the <b>
    events).  Event content is identical to the original find/match loop
    — only the data-chunk SPLIT may differ, which the block extractor is
    insensitive to (the corpus-level extraction-equality test pins
    this)."""
    pos = 0
    n = len(raw)
    while pos < n:
        m = _SCAN.search(raw, pos)
        if m is None:
            break
        s = m.start()
        if s > pos:
            _data(handler, raw[pos:s])
        pos = m.end()
        close, name, selfclose = m.group(1), m.group(2), m.group(3)
        if name is None:                        # comment/declaration/PI
            continue
        tag = name.lower()
        if close:
            handler.handle_endtag(tag)
        elif selfclose:
            handler.handle_startendtag(tag, [])
        else:
            handler.handle_starttag(tag, [])
            cd = _CDATA_CLOSE.get(tag)
            if cd is not None:                  # CDATA content element
                mc = cd.search(raw, pos)
                if mc is None:
                    handler.handle_data(raw[pos:])
                    pos = len(raw)
                else:
                    handler.handle_data(raw[pos:mc.start()])
                    handler.handle_endtag(tag)
                    pos = mc.end()
    if pos < len(raw):
        _data(handler, raw[pos:])
