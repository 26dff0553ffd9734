"""Text analysis & curation operators: scores, filters, modifiers.

Ray-Data-native counterparts of the reference's Score/Filter/ScoreFilter
stages and heuristic DocumentFilters
(``stages/text/filters/score_filter.py:29-330``,
``filters/heuristic/string.py:40-470``) plus graft-required text-analysis ops
(language-ID heuristic, quality scoring, token counting, fingerprinting).

Everything is a ``map_batches(fn, batch_format="pyarrow")`` over vectorized
pyarrow.compute / numpy kernels — no per-row Python in hot paths except where
a kernel genuinely doesn't exist (fingerprints, which loop docs but vectorize
within each doc).
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ----------------------------------------------------------------- scorers

_WORD_SPLIT = r"\s+"
# BPE-ish token pattern: words, numbers, or single non-space symbols
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = (
    "the of and to in a is that it was for on are as with his they at be this "
    "have from or had by not but what all were when we there can an your which"
).split()


def _texts(batch: pa.Table, field: str) -> pa.ChunkedArray:
    col = batch.column(field)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # null doc == empty doc: downstream numpy kernels turn null list
        # lengths into NaN -> garbage ints (crashes np.repeat) otherwise
        col = pc.fill_null(col, "")
    return col


def word_count(arr) -> pa.Array:
    """Number of whitespace-separated words (0 for empty/blank strings)."""
    trimmed = pc.utf8_trim_whitespace(arr)
    splits = pc.split_pattern_regex(trimmed, _WORD_SPLIT)
    n = pc.list_value_length(splits)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int32()), n)


def token_count(arr) -> pa.Array:
    """BPE-ish token count (letter runs, digit runs, single symbols)."""
    return pc.count_substring_regex(arr, _TOKEN_RE)


def char_count(arr) -> pa.Array:
    return pc.utf8_length(arr)


def _ratio(num, den) -> pa.Array:
    num = pc.cast(num, pa.float64())
    den = pc.cast(den, pa.float64())
    return pc.if_else(pc.greater(den, 0.0), pc.divide(num, pc.max_element_wise(den, 1.0)), pa.scalar(0.0))


def non_alpha_numeric_ratio(arr) -> pa.Array:
    """Fraction of characters that are not alphanumeric
    (reference NonAlphaNumericFilter, heuristic/string.py:40-60)."""
    total = pc.utf8_length(arr)
    alnum = pc.count_substring_regex(arr, r"[a-zA-Z0-9]")
    return _ratio(pc.subtract(total, alnum), total)


def symbols_to_words_ratio(arr) -> pa.Array:
    syms = pc.count_substring_regex(arr, r"[#\$%&\*\+\-/<=>@\^_\|~]|\.{3}")
    return _ratio(syms, word_count(arr))


def numbers_ratio(arr) -> pa.Array:
    digits = pc.count_substring_regex(arr, r"[0-9]")
    return _ratio(digits, pc.utf8_length(arr))


def url_count(arr) -> pa.Array:
    return pc.count_substring_regex(arr, r"https?://|www\.")


def whitespace_ratio(arr) -> pa.Array:
    ws = pc.count_substring_regex(arr, r"\s")
    return _ratio(ws, pc.utf8_length(arr))


def punctuation_ratio(arr) -> pa.Array:
    p = pc.count_substring_regex(arr, r"[.!?]")
    return _ratio(p, word_count(arr))


def ellipsis_ratio(arr) -> pa.Array:
    e = pc.count_substring_regex(arr, r"\.\.\.|…")
    return _ratio(e, word_count(arr))


def mean_word_length(arr) -> pa.Array:
    letters = pc.count_substring_regex(arr, r"\S")
    return _ratio(letters, word_count(arr))


def stopword_ratio(arr) -> pa.Array:
    """Fraction of words that are common English stopwords
    (reference CommonEnglishWordsFilter analog)."""
    pattern = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"
    hits = pc.count_substring_regex(arr, pattern)
    return _ratio(hits, word_count(arr))


def quality_score(arr) -> pa.Array:
    """Composite [0,1] quality heuristic: penalize extreme length, symbol
    soup, missing stopwords, whitespace floods."""
    wc = pc.cast(word_count(arr), pa.float64())
    length_ok = pc.and_(pc.greater_equal(wc, 5.0), pc.less_equal(wc, 5000.0))
    s1 = pc.if_else(length_ok, pa.scalar(0.25), pa.scalar(0.0))
    s2 = pc.if_else(pc.less(non_alpha_numeric_ratio(arr), 0.3), pa.scalar(0.25), pa.scalar(0.0))
    s3 = pc.if_else(pc.greater(stopword_ratio(arr), 0.05), pa.scalar(0.25), pa.scalar(0.0))
    s4 = pc.if_else(pc.less(whitespace_ratio(arr), 0.35), pa.scalar(0.25), pa.scalar(0.0))
    return pc.add(pc.add(s1, s2), pc.add(s3, s4))


_LANG_MARKERS = {
    "en": r"(?i)\b(the|and|of|to|is|that|was|with)\b",
    "de": r"(?i)\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"(?i)\b(le|la|les|et|est|dans|pour|que)\b",
    "es": r"(?i)\b(el|los|las|es|en|por|para|una)\b",
    "it": r"(?i)\b(il|gli|che|di|per|con|una|sono)\b",
}


_PARITY_LETTERS = "abcdefghijklmnopqrstuvwx"  # 24 bits


def letter_parity_signature(arr, letters: str = _PARITY_LETTERS) -> pa.Array:
    """Per-document bit signature: bit i = (count of letters[i]) mod 2.

    A deterministic, SQL-expressible stand-in for a content SimHash: two
    documents differing by a small edit flip few parities, so Hamming
    distance over this signature is a (crude) edit-similarity signal. Used
    by the oracle-checked ``simhash_docs`` query — DuckDB reproduces it with
    ``length(text) - length(replace(text, ch, ''))`` parities and verifies
    the full banding+verify+connected-components pipeline via
    ``bit_count(xor(...))`` + a recursive-CTE closure."""
    sig = np.zeros(len(arr), dtype=np.int64)
    for i, ch in enumerate(letters):
        cnt = pc.count_substring(arr, ch).to_numpy(zero_copy_only=False).astype(np.int64)
        sig |= (cnt & 1) << i
    return pa.array(sig, pa.int64())


def lang_id(arr) -> pa.Array:
    """n-gram/stopword-marker language heuristic -> 2-letter code or 'xx'."""
    wc = pc.cast(word_count(arr), pa.float64())
    scores = []
    langs = list(_LANG_MARKERS)
    for lang in langs:
        scores.append(_ratio(pc.count_substring_regex(arr, _LANG_MARKERS[lang]), wc))
    mat = np.stack([np.asarray(s) for s in scores], axis=1)
    best = mat.argmax(axis=1)
    best_score = mat.max(axis=1)
    out = np.array(langs, dtype=object)[best]
    out[best_score < 0.05] = "xx"
    return pa.array(out.tolist(), pa.string())


# ------------------------------------------------------------ stage wrappers


def score_stage(ds, scorer, text_field: str, score_field: str):
    """Reference ``Score`` stage: append a score column."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(score_field, scorer(_texts(batch, text_field)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def filter_stage(ds, scorer, text_field: str, min_value=None, max_value=None, invert: bool = False):
    """Reference ``Filter``/``ScoreFilter``: threshold-filter on a scorer."""

    def fn(batch: pa.Table) -> pa.Table:
        s = scorer(_texts(batch, text_field))
        mask = pa.array(np.ones(len(batch), dtype=bool))
        if min_value is not None:
            mask = pc.and_(mask, pc.greater_equal(s, min_value))
        if max_value is not None:
            mask = pc.and_(mask, pc.less_equal(s, max_value))
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- modifiers


def modify_stage(ds, modifier, text_field: str):
    def fn(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(text_field)
        return batch.set_column(idx, text_field, modifier(_texts(batch, text_field)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def newline_normalizer(arr) -> pa.Array:
    """Collapse 3+ newlines to 2 (reference NewlineNormalizer)."""
    return pc.replace_substring_regex(arr, r"\n{3,}", "\n\n")


def url_remover(arr) -> pa.Array:
    return pc.replace_substring_regex(arr, r"https?://\S+|www\.\S+", "")


def unicode_whitespace_normalizer(arr) -> pa.Array:
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(arr, r"[ \t]+", " "))


def markdown_remover(arr) -> pa.Array:
    out = pc.replace_substring_regex(arr, r"\*\*([^*]*)\*\*", r"\1")
    out = pc.replace_substring_regex(out, r"\*([^*]*)\*", r"\1")
    out = pc.replace_substring_regex(out, r"_([^_]*)_", r"\1")
    return pc.replace_substring_regex(out, r"\[([^\]]*)\]\([^)]*\)", r"\1")


def lowercase(arr) -> pa.Array:
    return pc.utf8_lower(arr)


def quotation_remover(arr) -> pa.Array:
    """Strip one pair of surrounding quotes (reference QuotationRemover)."""
    return pc.replace_substring_regex(arr, r'^\s*"(.*)"\s*$', r"\1")


def slicer(arr, start: int = 0, stop: int | None = None) -> pa.Array:
    """Reference Slicer modifier: keep chars [start, stop)."""
    return pc.utf8_slice_codeunits(arr, start, stop if stop is not None else 2**31 - 1)


_BOILERPLATE_LINE = r"(?mi)^.*\b(terms of use|privacy policy|cookie policy|all rights reserved|javascript must be enabled)\b.*$\n?"


def boilerplate_remover(arr) -> pa.Array:
    """Drop C4-style boilerplate lines (reference BoilerPlateStringModifier)."""
    return pc.replace_substring_regex(arr, _BOILERPLATE_LINE, "")


def line_remover(arr, patterns: list[str]) -> pa.Array:
    """Drop lines whose ENTIRE content equals one of ``patterns``
    (reference LineRemover, modifiers/string/line_remover.py:17-33).

    Vectorized: split to lines, mask exact matches, re-join with rebuilt
    list offsets — no Python over rows."""
    if arr.null_count:
        arr = pc.fill_null(arr, "")  # null doc == empty doc
    splits = pc.split_pattern(arr, "\n")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = splits.flatten()
    lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.invert(
        pc.is_in(flat, value_set=pa.array(sorted(set(patterns)), pa.string()))
    ).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)[keep]
    counts = np.zeros(len(lengths), dtype=np.int32)
    np.add.at(counts, doc_idx, 1)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat.filter(pa.array(keep))),
        "\n",
    )


def fasttext_label(arr, label: str) -> pa.Array:
    """Prefix a fastText training label, flattening newlines and escaping
    embedded label markers (reference FastTextLabelModifier,
    modifiers/fasttext/fasttext_label.py:17-25)."""
    out = pc.replace_substring(arr, "\n", " ")
    out = pc.replace_substring(out, "__label__", " ")
    return pc.binary_join_element_wise(pa.scalar(label + " "), out, "")


_CONTROL_CHARS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"
# &amp; must unescape LAST so "&amp;lt;" single-unescapes to "&lt;"
_HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]

# ---------------------------------------------------------------- mojibake
# The published ftfy fix_encoding core (the algorithm the reference's
# UnicodeReformatter delegates to, modifiers/unicode/unicode_reformatter.py:23):
# UTF-8 bytes mis-decoded as cp1252/latin-1 leave a recognizable signature —
# a UTF-8 lead character (U+00C2..U+00F4) followed by characters whose
# "sloppy-cp1252" byte lies in the UTF-8 continuation range 0x80..0xBF.
# Repair = re-encode the matched run through sloppy-cp1252 (cp1252 for the
# 0x80..0x9F printables, latin-1 identity otherwise) and strictly re-decode
# as UTF-8; a failed decode leaves the run untouched. Run-limited matching
# means genuine Latin-1 prose ("déjà vu") never matches: the follower set is
# punctuation/C1 territory, not letters.
_BYTE_FOR: dict[int, int] = {}
_TRAIL = [chr(c) for c in range(0x80, 0xC0)]
for _b in range(0x80, 0xA0):
    try:
        _ch = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:  # 0x81 0x8D 0x8F 0x90 0x9D are undefined
        continue
    _BYTE_FOR[ord(_ch)] = _b
    _TRAIL.append(_ch)
_T_CLS = "[" + re.escape("".join(_TRAIL)) + "]"
_MOJI_SEQ = re.compile(
    "(?:[\xc2-\xdf]%(t)s|[\xe0-\xef]%(t)s{2}|[\xf0-\xf4]%(t)s{3})+" % {"t": _T_CLS}
)


def _repair_mojibake_run(m: "re.Match[str]") -> str:
    seg = m.group()
    bs = bytes(_BYTE_FOR.get(ord(c), ord(c)) for c in seg)
    try:
        return bs.decode("utf-8")
    except UnicodeDecodeError:
        return seg


def fix_mojibake_text(s: str, max_passes: int = 3) -> str:
    """Repair cp1252/latin-1-mis-decoded UTF-8 in ``s``; iterates so
    double-encoded text ("ÃƒÂ©" -> "Ã©" -> "é") converges."""
    for _ in range(max_passes):
        new = _MOJI_SEQ.sub(_repair_mojibake_run, s)
        if new == s:
            return s
        s = new
    return s


def fix_mojibake(arr) -> pa.Array:
    """Vectorized wrapper: the UTF-8-lead-char pre-filter runs as an Arrow
    regex over every row; the per-row Python repair only touches the (rare
    in clean corpora) matching minority."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mask = pc.match_substring_regex(arr, "[\xc2-\xf4]").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(mask == True)  # noqa: E712 — mask may contain None
    if not len(idx):
        return arr
    vals = np.asarray(arr.to_pylist(), dtype=object)
    for i in idx:
        if vals[i] is not None:
            vals[i] = fix_mojibake_text(vals[i])
    return pa.array(vals, pa.string())


def unicode_reformatter(arr, normalization: str | None = None,
                        remove_control_chars: bool = True,
                        unescape_html: bool = True,
                        fix_encoding: bool = True) -> pa.Array:
    """Vectorized counterpart of the reference UnicodeReformatter
    (modifiers/unicode/unicode_reformatter.py:21-): mojibake repair via the
    published ftfy fix_encoding round-trip heuristic (``fix_mojibake``, the
    ftfy package itself is absent in this sandbox), control-character
    removal (C0 minus tab/LF/CR, DEL, C1), basic named-entity unescaping,
    and Unicode normalization. Repair runs FIRST — C1 controls and entities
    can be bytes of a mis-decoded sequence."""
    out = arr
    if fix_encoding:
        out = fix_mojibake(out)
    if unescape_html:
        for ent, ch in _HTML_ENTITIES:
            out = pc.replace_substring(out, ent, ch)
    if remove_control_chars:
        out = pc.replace_substring_regex(out, _CONTROL_CHARS, "")
    if normalization:
        # pyarrow's utf8_normalize does not apply canonical COMPOSITION in
        # this build (verified: NFKC decomposes ligatures but leaves
        # e+U+0301 uncomposed), so normalize with unicodedata — only on the
        # non-ASCII minority (ASCII rows are normalization fixed points:
        # char length == byte length).
        import unicodedata

        ascii_mask = pc.equal(pc.utf8_length(out), pc.binary_length(out)).to_numpy(
            zero_copy_only=False
        )
        idx = np.flatnonzero(~ascii_mask)
        if len(idx):
            vals = np.asarray(out.to_pylist(), dtype=object)
            for i in idx:
                vals[i] = unicodedata.normalize(normalization, vals[i])
            out = pa.array(vals, pa.string())
    return out


def sort_batch_by_length(ds, text_field: str, descending: bool = False):
    """Reorder rows WITHIN each batch by text length — the reference's
    ``SortByLengthStage`` (``stages/text/classifiers/utils.py:24``), which
    packs similar-length texts together for efficient batched inference.
    In-batch only: no shuffle, ordering across batches is not defined."""

    def fn(batch: pa.Table) -> pa.Table:
        lengths = pc.utf8_length(_texts(batch, text_field))
        order = pc.sort_indices(lengths, sort_keys=[("", "descending" if descending else "ascending")])
        return batch.take(order)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------------- code filters


def line_count(arr) -> pa.Array:
    """Reference NumberOfLinesOfCodeFilter (heuristic/code/code.py)."""
    return pc.add(pc.count_substring(arr, "\n"), 1)


def python_comment_to_code_ratio(arr) -> pa.Array:
    """# comment lines / total lines (reference PythonCommentToCodeFilter)."""
    comments = pc.count_substring_regex(arr, r"(?m)^\s*#")
    return _ratio(comments, line_count(arr))


def general_comment_to_code_ratio(arr) -> pa.Array:
    """//, /* */ and # comment markers per line (GeneralCommentToCodeFilter)."""
    comments = pc.count_substring_regex(arr, r"(?m)^\s*(//|#|/\*)")
    return _ratio(comments, line_count(arr))


def xml_header_present(arr) -> pa.Array:
    """Reference XMLHeaderFilter: document starts with an XML prolog."""
    return pc.match_substring_regex(arr, r"^\s*<\?xml")


def alpha_fraction(arr) -> pa.Array:
    """Reference AlphaFilter: fraction of alphabetic characters."""
    letters = pc.count_substring_regex(arr, r"[a-zA-Z]")
    return _ratio(letters, pc.utf8_length(arr))


# --------------------------------------------------------------- repetition


def _repeated_segment_ratio(arr, pattern: str) -> pa.Array:
    """Fraction of segments (split on ``pattern``) that are duplicates of an
    earlier segment in the same document — reference RepeatedLines/Paragraphs
    (``filters/heuristic/repetition/repetition.py:24-157``). Vectorized: one
    murmur pass over every segment in the batch + ragged run counting."""
    from ..functions.murmur import hash_bytes_grouped
    from ..functions.shingles import _string_array_buffers

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    splits = pc.split_pattern(arr, pattern)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    counts = pc.list_value_length(splits).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = splits.flatten()
    if len(flat) == 0:
        return pa.array(np.zeros(len(arr)), pa.float64())
    data, offsets = _string_array_buffers(flat)
    lengths = offsets[1:] - offsets[:-1]
    h = hash_bytes_grouped(data, offsets[:-1], lengths, seed=1, bits=64).view(np.int64)
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    # duplicates within a doc: sort by (doc, hash), count rows beyond the
    # first of each (doc, hash) run
    order = np.lexsort((h, doc_idx))
    sd, sh = doc_idx[order], h[order]
    first = np.concatenate([[True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])])
    dup_per_doc = np.bincount(sd[~first], minlength=len(counts))
    ratio = np.where(counts > 0, dup_per_doc / np.maximum(counts, 1), 0.0)
    return pa.array(ratio, pa.float64())


def repeated_lines_ratio(arr) -> pa.Array:
    return _repeated_segment_ratio(arr, "\n")


def repeated_paragraphs_ratio(arr) -> pa.Array:
    return _repeated_segment_ratio(arr, "\n\n")


# ------------------------------------------------------------- fingerprints


def fingerprint_stage(ds, text_field: str, fp_len: int = 16, winnow_window: int = 4, out_field: str = "fingerprint"):
    """Rolling-hash document fingerprint (min winnowed fp as int64).

    One vectorized ``batch_fingerprints`` pass over the whole batch (same
    selection as per-doc ``doc_fingerprints``) + a ``np.minimum.reduceat``
    over doc boundaries — no Python loop over rows."""
    from ..functions.winnow import batch_fingerprints

    def fn(batch: pa.Table) -> pa.Table:
        fps, doc_idx = batch_fingerprints(batch.column(text_field), fp_len, winnow_window)
        out = np.zeros(len(batch), dtype=np.uint64)
        if len(fps):
            starts = np.flatnonzero(np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]]))
            out[doc_idx[starts]] = np.minimum.reduceat(fps, starts)  # min over uint64
        return batch.append_column(out_field, pa.array(out.view(np.int64), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------- splitter / joiner


def document_splitter(ds, text_field: str, separator: str, id_field: str = "doc_id"):
    """Reference DocumentSplitter (modules/splitter.py:22): one row per segment."""

    def fn(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(_texts(batch, text_field), separator)
        lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
        ids = batch.column(id_field).to_numpy(zero_copy_only=False)
        seg = np.concatenate([np.arange(n) for n in lengths]) if len(lengths) else np.zeros(0, np.int64)
        return pa.table(
            {
                id_field: pa.array(np.repeat(ids, lengths)),
                "segment_id": pa.array(seg, pa.int64()),
                text_field: splits.combine_chunks().flatten() if isinstance(splits, pa.ChunkedArray) else splits.flatten(),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def document_joiner(ds, text_field: str, separator: str, id_field: str = "doc_id"):
    """Reference DocumentJoiner (modules/joiner.py:24): re-join segments."""

    def join_group(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("segment_id").to_numpy())
        texts = np.asarray(group.column(text_field).to_pylist(), dtype=object)[order]
        return pa.table(
            {
                id_field: group.column(id_field).slice(0, 1),
                text_field: pa.array([separator.join(texts.tolist())], pa.string()),
            }
        )

    return ds.groupby(id_field).map_groups(join_group, batch_format="pyarrow")
