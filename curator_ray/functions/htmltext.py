"""Boilerplate-removing HTML → text extraction — stdlib only.

Implements the published jusText algorithm (Pomikálek 2011,
https://corpus.tools/wiki/Justext/Algorithm — the same algorithm the
reference wraps via the ``justext`` package in
``stages/text/download/html_extractors/justext.py:71``):

1. segment the DOM into textual blocks at block-level tags, dropping
   ``<script>/<style>/<head>`` content and tracking per-block link density;
2. context-free classify each block: BAD (high link density), SHORT
   (too little text), NEAR-GOOD (moderate stopword density), GOOD (long +
   stopword-dense);
3. context-sensitive pass: SHORT/NEAR-GOOD blocks inherit GOOD when
   adjacent to GOOD neighbours (main content clusters), else BAD.

No lxml/justext in the sandbox, so parsing uses ``html.parser``. The
default thresholds match the reference's ``JusTextExtractor`` defaults
(``html_extractors/justext.py:16-23``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# words covering ~the top of English frequency lists; jusText ships
# per-language stoplists — English is the only one bundled here, others
# can be passed by the caller
EN_STOP_WORDS = frozenset(
    """a about above after again all also am an and any are as at be because been
    before being below between both but by can did do does doing down during each
    few for from further had has have having he her here hers herself him himself
    his how i if in into is it its itself just me more most my myself no nor not
    now of off on once only or other our ours ourselves out over own same she
    should so some such than that the their theirs them themselves then there
    these they this those through to too under until up very was we were what
    when where which while who whom why will with you your yours yourself
    yourselves""".split()
)

_BLOCK_TAGS = frozenset(
    "blockquote caption center col colgroup dd div dl dt fieldset form h1 h2 h3 h4"
    " h5 h6 legend li optgroup option p pre table td textarea tfoot th thead tr"
    " ul ol section article aside header footer nav main".split()
)
_SKIP_TAGS = frozenset(("script", "style", "head", "select", "noscript", "svg"))
_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

GOOD, BAD, SHORT, NEAR_GOOD = "good", "bad", "short", "near-good"


class _Segmenter(HTMLParser):
    """Split HTML into (text, link_char_count, is_heading) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._in_link = 0
        self._skip = 0
        self._heading = 0

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, self._link_chars, self._heading > 0))
        self._parts, self._link_chars = [], 0

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS or tag == "br":
            self._flush()
        if tag == "a":
            self._in_link += 1
        if tag in _HEADING_TAGS:
            self._heading += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._in_link:
            self._in_link -= 1
        if tag in _HEADING_TAGS and self._heading:
            self._heading -= 1

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self._parts.append(data)
        if self._in_link:
            self._link_chars += len(data)


def _classify(
    text: str,
    link_chars: int,
    stop_words: frozenset[str],
    length_low: int,
    length_high: int,
    stopwords_low: float,
    stopwords_high: float,
    max_link_density: float,
) -> str:
    if len(text) and link_chars / len(text) > max_link_density:
        return BAD
    words = text.lower().split()
    density = sum(w.strip(".,;:!?\"'()") in stop_words for w in words) / max(len(words), 1)
    if len(text) < length_low:
        return BAD if link_chars else SHORT
    if density >= stopwords_high:
        return GOOD if len(text) > length_high else NEAR_GOOD
    if density >= stopwords_low:
        return NEAR_GOOD
    return BAD


def extract_html_text(
    html: str,
    stop_words: frozenset[str] = EN_STOP_WORDS,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    keep_headings: bool = True,
) -> list[str] | None:
    """Return the non-boilerplate paragraphs of ``html`` (None if nothing
    survives) — the ``extract_text`` contract of the reference's HTML
    extractor algorithms."""
    seg = _Segmenter()
    try:
        seg.feed(html)
        seg.close()
    except Exception:  # malformed markup: salvage what was segmented
        pass
    seg._flush()
    if not seg.blocks:
        return None
    labels = [
        _classify(t, lc, stop_words, length_low, length_high, stopwords_low, stopwords_high, max_link_density)
        for t, lc, _ in seg.blocks
    ]
    # context-sensitive pass: SHORT / NEAR-GOOD resolve by their nearest
    # non-ambiguous neighbours (GOOD on either side -> GOOD, else BAD;
    # NEAR-GOOD needs only one GOOD side)
    n = len(labels)
    resolved = list(labels)
    for i in range(n):
        if labels[i] not in (SHORT, NEAR_GOOD):
            continue
        prev = next((labels[j] for j in range(i - 1, -1, -1) if labels[j] in (GOOD, BAD)), BAD)
        nxt = next((labels[j] for j in range(i + 1, n) if labels[j] in (GOOD, BAD)), BAD)
        if labels[i] == NEAR_GOOD:
            resolved[i] = GOOD if GOOD in (prev, nxt) else BAD
        else:
            resolved[i] = GOOD if prev == GOOD and nxt == GOOD else BAD
    # headings adjacent to good content are kept
    if keep_headings:
        for i, (_t, _lc, is_h) in enumerate(seg.blocks):
            if is_h and resolved[i] == BAD:
                nxt = next((resolved[j] for j in range(i + 1, n) if not seg.blocks[j][2]), BAD)
                if nxt == GOOD:
                    resolved[i] = GOOD
    out = [t for (t, _lc, _h), lab in zip(seg.blocks, resolved) if lab == GOOD]
    return out or None


def decode_html(content: bytes | str) -> str | None:
    """Bytes → str with charset sniffing (reference ``download/utils.py``
    ``decode_html``): try utf-8, then a charset= meta hint, then latin-1."""
    if isinstance(content, str):
        return content
    try:
        return content.decode("utf-8")
    except UnicodeDecodeError:
        m = re.search(rb'charset=["\']?([\w-]+)', content[:2048], re.I)
        if m:
            try:
                return content.decode(m.group(1).decode("ascii", "ignore"), "replace")
            except LookupError:
                pass
        return content.decode("latin-1", "replace")
