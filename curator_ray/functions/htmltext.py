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


# ---------------------------------------------------------------------------
# Resiliparse-style and Trafilatura-style extraction (reference
# ``html_extractors/resiliparse.py:21`` / ``trafilatura.py:24`` — both wrap
# external libraries absent in this sandbox; the algorithms below implement
# the documented behavior: resiliparse = fast rule-based visible-text dump
# with optional main-content heuristics, trafilatura = main-content
# delimitation with fallbacks, paragraph dedup, and size gates. Both apply
# the reference's added stopword-density paragraph filter.)
# ---------------------------------------------------------------------------

_BOILER_TAGS = frozenset(("nav", "header", "footer", "aside", "form"))
_BOILER_HINT = re.compile(
    r"nav|menu|footer|header|side(bar)?|banner|breadcrumb|cookie|advert|"
    r"\bad[sv]?\b|social|share|comment|widget|related|pagination|skip",
    re.I,
)
_LIST_TAGS = frozenset(("li", "dd", "dt"))


class _VisibleTextSegmenter(HTMLParser):
    """Visible-text blocks with boilerplate ancestry: each block is
    (text, link_chars, boiler_depth>0, is_list_item, is_heading)."""

    def __init__(self, alt_texts: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.alt_texts = alt_texts
        self.blocks: list[tuple[str, int, bool, bool, bool]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._in_link = 0
        self._skip = 0
        self._heading = 0
        self._list_item = 0
        self._boiler = 0
        self._boiler_stack: list[str] = []  # tags that incremented _boiler

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._parts)).strip()
        if text:
            self.blocks.append(
                (text, self._link_chars, self._boiler > 0, self._list_item > 0, self._heading > 0)
            )
        self._parts, self._link_chars = [], 0

    def _is_boiler(self, tag: str, attrs: list) -> bool:
        if tag in _BOILER_TAGS:
            return True
        for k, v in attrs:
            if k in ("class", "id", "role") and v and _BOILER_HINT.search(v):
                return True
        return False

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS or tag == "br":
            self._flush()
        if tag == "img" and self.alt_texts and not self._skip:
            alt = next((v for k, v in attrs if k == "alt" and v), None)
            if alt:
                self._parts.append(" " + alt + " ")
        if not self._skip and self._is_boiler(tag, attrs):
            self._boiler += 1
            self._boiler_stack.append(tag)
        if tag == "a":
            self._in_link += 1
        if tag in _HEADING_TAGS:
            self._heading += 1
        if tag in _LIST_TAGS:
            self._list_item += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        if self._boiler_stack and self._boiler_stack[-1] == tag:
            self._boiler_stack.pop()
            self._boiler -= 1
        if tag == "a" and self._in_link:
            self._in_link -= 1
        if tag in _HEADING_TAGS and self._heading:
            self._heading -= 1
        if tag in _LIST_TAGS and self._list_item:
            self._list_item -= 1

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self._parts.append(data)
        if self._in_link:
            self._link_chars += len(data)


def _segment_visible(html: str, alt_texts: bool = False) -> list[tuple[str, int, bool, bool, bool]]:
    seg = _VisibleTextSegmenter(alt_texts=alt_texts)
    try:
        seg.feed(html)
        seg.close()
    except Exception:  # malformed markup: salvage what was segmented
        pass
    seg._flush()
    return seg.blocks


def _stopword_density_filter(
    paragraphs: list[str], stop_words: frozenset[str], required_density: float
) -> list[str]:
    """The reference's added paragraph gate (resiliparse.py:60-78 /
    trafilatura.py:119-137): keep paragraphs whose stopword fraction meets
    the density bar."""
    out = []
    for p in paragraphs:
        words = p.split()
        if not words:
            continue
        density = sum(w in stop_words for w in words) / len(words)
        if density >= required_density:
            out.append(p)
    return out


def extract_resiliparse_style(
    html: str,
    stop_words: frozenset[str] = EN_STOP_WORDS,
    required_stopword_density: float = 0.32,
    main_content: bool = True,
    alt_texts: bool = False,
) -> list[str] | None:
    """Resiliparse ``extract_plain_text`` semantics (reference
    ``html_extractors/resiliparse.py:21-79``): every visible text node in
    the body with basic formatting (list items bulleted), ``main_content``
    dropping nav/header/footer/aside and boilerplate-classed containers —
    then the reference's stopword-density paragraph filter."""
    blocks = _segment_visible(html, alt_texts=alt_texts)
    if main_content:
        blocks = [b for b in blocks if not b[2]]
    paragraphs = [("• " + t) if is_li else t for t, _lc, _b, is_li, _h in blocks]
    out = _stopword_density_filter(paragraphs, stop_words, required_stopword_density)
    return out or None


def extract_trafilatura_style(
    html: str,
    stop_words: frozenset[str] = EN_STOP_WORDS,
    required_stopword_density: float = 0.32,
    min_extracted_size: int = 250,
    max_link_density: float = 0.5,
    min_duplcheck_size: int = 100,
    max_repetitions: int = 2,
) -> list[str] | None:
    """Trafilatura-cascade semantics (reference
    ``html_extractors/trafilatura.py:24-150``): (1) main-content
    delimitation — drop boilerplate containers and link-dense blocks; (2) if
    the extraction is smaller than ``min_extracted_size`` chars, fall back to
    the jusText classifier, then to the raw visible-text baseline; (3) drop
    paragraphs of >= ``min_duplcheck_size`` chars repeated more than
    ``max_repetitions`` times (trafilatura's deduplicate=True default in the
    reference wrapper); (4) the stopword-density paragraph filter."""
    blocks = _segment_visible(html)
    main = [
        t
        for t, lc, boiler, _li, _h in blocks
        if not boiler and (len(t) == 0 or lc / len(t) <= max_link_density)
    ]
    if sum(len(t) for t in main) < min_extracted_size:
        fallback = extract_html_text(html, stop_words)
        if fallback:
            main = fallback
        else:  # baseline: any visible text beats returning nothing
            main = [t for t, _lc, _b, _li, _h in blocks]
    seen: dict[str, int] = {}
    deduped = []
    for p in main:
        if len(p) >= min_duplcheck_size:
            seen[p] = seen.get(p, 0) + 1
            if seen[p] > max_repetitions:
                continue
        deduped.append(p)
    out = _stopword_density_filter(deduped, stop_words, required_stopword_density)
    return out or None
