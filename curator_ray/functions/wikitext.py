"""Wikitext (MediaWiki markup) → plain text — regex-based, stdlib only.

The reference parses wikitext with ``mwparserfromhell`` and strips
templates / media wikilinks / tags / categories / ``__MAGIC__`` words
(``stages/text/download/wikipedia/extract.py:580-660``). That package is
absent here, so this module cleans the same constructs with an ordered
regex pipeline over the public MediaWiki markup grammar:

templates ``{{...}}`` (nested), tables ``{|...|}``, HTML comments,
``<ref>``/``<gallery>``/etc. tag bodies, media/category links, wikilinks
(keep display text), external links (keep label), bold/italic quotes,
headings (kept as their title text), magic words, list bullets.

Plain prose passes through unchanged — which is what makes the
download→iterate→extract pipeline oracle-checkable on synthetic dumps.
"""

from __future__ import annotations

import re

_MEDIA_PREFIXES = "File|Image|Media"
_CAT_PREFIXES = "Category"

_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_TAG_BODY = re.compile(
    r"<(ref|gallery|timeline|noinclude|math|score|source|syntaxhighlight)\b[^>]*>.*?</\1\s*>",
    re.S | re.I,
)
_RE_SELF_TAG = re.compile(r"<[^>]+/\s*>|<ref\b[^>]*>", re.I)
_RE_HTML_TAG = re.compile(r"</?[a-zA-Z][^>]*>")
_RE_MEDIA_LINK = re.compile(rf"\[\[(?:{_MEDIA_PREFIXES}):.*?\]\]", re.I | re.S)
_RE_CAT_LINK = re.compile(rf"\[\[(?:{_CAT_PREFIXES}):(.*?)\]\]", re.I)
_RE_WIKILINK = re.compile(r"\[\[(?:[^\[\]|]*\|)?([^\[\]|]*)\]\]")
_RE_EXTLINK = re.compile(r"\[(?:https?|ftp)://\S*\s+([^\]]*)\]")
_RE_BARE_EXTLINK = re.compile(r"\[(?:https?|ftp)://[^\]\s]*\]")
_RE_MAGIC = re.compile(r"__[A-Z]*__")
_RE_HEADING = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$", re.M)
_RE_QUOTES = re.compile(r"'{2,5}")
_RE_BULLET = re.compile(r"^[*#:;]+\s*", re.M)
_RE_BLANK = re.compile(r"\n{3,}")


def _strip_nested(text: str, open_tok: str, close_tok: str) -> str:
    """Remove balanced nested ``open_tok...close_tok`` spans."""
    out: list[str] = []
    depth = 0
    i, n = 0, len(text)
    lo, lc = len(open_tok), len(close_tok)
    while i < n:
        if text.startswith(open_tok, i):
            depth += 1
            i += lo
        elif depth and text.startswith(close_tok, i):
            depth -= 1
            i += lc
        else:
            if not depth:
                out.append(text[i])
            i += 1
    return "".join(out)


def clean_wikitext(raw: str) -> str:
    """Render wikitext to plain text (section headings kept as lines)."""
    t = _RE_COMMENT.sub("", raw)
    t = _RE_TAG_BODY.sub("", t)
    t = _strip_nested(t, "{{", "}}")
    t = _strip_nested(t, "{|", "|}")
    t = _RE_MEDIA_LINK.sub("", t)
    t = _RE_CAT_LINK.sub("", t)
    t = _RE_WIKILINK.sub(r"\1", t)
    t = _RE_EXTLINK.sub(r"\1", t)
    t = _RE_BARE_EXTLINK.sub("", t)
    t = _RE_SELF_TAG.sub("", t)
    t = _RE_HTML_TAG.sub("", t)
    t = _RE_MAGIC.sub("", t)
    t = _RE_HEADING.sub(r"\2", t)
    t = _RE_QUOTES.sub("", t)
    t = _RE_BULLET.sub("", t)
    t = "\n".join(line.rstrip() for line in t.splitlines())
    return _RE_BLANK.sub("\n\n", t).strip()
