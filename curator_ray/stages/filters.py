"""The reference's full heuristic DocumentFilter set, vectorized.

Counterparts of ``nemo_curator/stages/text/filters/heuristic/string.py:40-501``
(Gopher / C4 string heuristics), ``heuristic/repetition/repetition.py:24-203``
(Gopher repetition filters) and ``heuristic/code/code.py:100-268`` (Starcoder
code heuristics). The reference scores one Python string at a time inside a
``DocumentFilter``; here every scorer is a batch kernel over a pyarrow string
column — flat segment/word arrays + ``np.add/maximum/minimum.reduceat`` over
per-document boundaries, one regex pass per batch — composed with
``text.score_stage`` / ``text.filter_stage``.

Semantics notes (each deviation is deliberate and documented):
- "sentences" follow the reference's ``get_sentences`` = non-blank lines
  (``text_utils.py:79-83``), "paragraphs" = ``split("\\n\\n")`` including
  empties (``text_utils.py:72-76``);
- ratios whose reference denominator can be zero (no lines/words) return the
  neutral "keep" value instead of raising, chosen per filter and mirrored in
  the DuckDB oracle SQL;
- alpha checks use ``[a-zA-Z]`` (the reference's ``regex`` module
  ``[[:alpha:]]`` is Unicode-aware; RE2 — used by both Arrow and DuckDB — is
  not, and the corpora here are ASCII).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _ratio, token_count

# constants mirroring stages/text/utils/constants.py:19-80
END_MARKS = (".", "?", "!", '"', "'")
ELLIPSIS_MARKS = ["...", "[...]", "…", "(...)", "[…]", "-»", "read more..", "read more"]
BULLET_CHARS = "•‣⁃⁌⁍∙○●◘◦⦾⦿"
COMMON_ENGLISH_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
POLICY_SUBSTRINGS = [
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "privacy overview",
    "use of cookies",
    "use cookies",
    "privacy & cookies policy",
    "privacy and cookies policy",
]
# reference regex_url (constants.py:78)
URL_REGEX = r"https?://(?:[A-Za-z0-9$\-_@.&+/:=?#~]|[!*\(\),]|(?:%[0-9A-Fa-f]{2}))+"
PAREN_REGEX = r"[{}⟨⟩\[\]()]"
WHITESPACE_CLASS = "[\t\n\r\x08 ]"  # white_space_list incl. \b (constants.py:55)


# ------------------------------------------------------------------ helpers


def _as_array(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.fill_null("") if arr.null_count else arr


def _flat_segments(arr, pattern: str) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split every doc on ``pattern`` -> (flat segments, counts, doc_idx)."""
    splits = pc.split_pattern(_as_array(arr), pattern)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    counts = pc.list_value_length(splits).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = splits.flatten()
    return flat, counts, np.repeat(np.arange(len(counts)), counts)


def _flat_words(arr) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace word split of the trimmed text, empty words dropped —
    the reference's ``str.split()`` semantics (``get_word_splitter("en")``)."""
    trimmed = pc.utf8_trim_whitespace(_as_array(arr))
    splits = pc.split_pattern_regex(trimmed, r"\s+")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    counts = pc.list_value_length(splits).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = splits.flatten()
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    doc_idx = doc_idx[nonempty]
    counts = np.bincount(doc_idx, minlength=len(counts)).astype(np.int64)
    return flat, counts, doc_idx


def _per_doc_sum(values: np.ndarray, doc_idx: np.ndarray, n_docs: int) -> np.ndarray:
    return np.bincount(doc_idx, weights=values, minlength=n_docs)


def _ratio_or(num: np.ndarray, den: np.ndarray, empty_value: float) -> pa.Array:
    out = np.where(den > 0, num / np.maximum(den, 1), empty_value)
    return pa.array(out, pa.float64())


# -------------------------------------------------------- string.py filters


def non_alphanum_ratio_ref(arr) -> pa.Array:
    """Gopher NonAlphaNumericFilter (string.py:40-58): 1 - matches of the
    reference's ``[a-zA-Z0-9\\n?!,.]`` class over nchar; empty doc -> 1.0."""
    arr = _as_array(arr)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    hits = pc.count_substring_regex(arr, r"[a-zA-Z0-9\n?!,.]").to_numpy(zero_copy_only=False)
    return _ratio_or(nchar - hits, nchar, 1.0)


def bullet_lines_ratio(arr) -> pa.Array:
    """BulletsFilter (string.py:146-172): fraction of non-blank lines whose
    stripped form starts with a unicode bullet; no lines -> 0.0 (keep)."""
    flat, counts, doc_idx = _flat_segments(arr, "\n")
    nonblank = pc.match_substring_regex(flat, r"\S").to_numpy(zero_copy_only=False)
    bullet = pc.match_substring_regex(flat, rf"^\s*[{BULLET_CHARS}]").to_numpy(zero_copy_only=False)
    n = len(counts)
    lines = _per_doc_sum(nonblank.astype(np.float64), doc_idx, n)
    hits = _per_doc_sum((nonblank & bullet).astype(np.float64), doc_idx, n)
    return _ratio_or(hits, lines, 0.0)


def whitespace_ratio_ref(arr) -> pa.Array:
    """WhiteSpaceFilter (string.py:175-194): chars in the reference's
    white_space_list over nchar; empty doc -> 1.0."""
    arr = _as_array(arr)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    ws = pc.count_substring_regex(arr, WHITESPACE_CLASS).to_numpy(zero_copy_only=False)
    return _ratio_or(ws.astype(np.float64), nchar, 1.0)


def parentheses_ratio(arr) -> pa.Array:
    """ParenthesesFilter (string.py:197-213); empty doc -> 1.0."""
    arr = _as_array(arr)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    hits = pc.count_substring_regex(arr, PAREN_REGEX).to_numpy(zero_copy_only=False)
    return _ratio_or(hits.astype(np.float64), nchar, 1.0)


def long_word_max(arr) -> pa.Array:
    """LongWordFilter (string.py:216-238): max word length; no words -> 0."""
    flat, counts, doc_idx = _flat_words(arr)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.zeros(len(counts), dtype=np.int64)
    if len(lens):
        starts = np.flatnonzero(np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]]))
        out[doc_idx[starts]] = np.maximum.reduceat(lens, starts)
    return pa.array(out, pa.int64())


def mean_word_length_ref(arr) -> pa.Array:
    """MeanWordLengthFilter (string.py:305-331); no words -> 0.0."""
    flat, counts, doc_idx = _flat_words(arr)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    total = _per_doc_sum(lens, doc_idx, len(counts))
    return _ratio_or(total, counts.astype(np.float64), 0.0)


def punct_lines_ratio(arr) -> pa.Array:
    """PunctuationFilter (string.py:334-354): fraction of non-blank lines NOT
    ending (stripped) with . ? ! \" ' ; no lines -> 0.0 (keep)."""
    flat, counts, doc_idx = _flat_segments(arr, "\n")
    nonblank = pc.match_substring_regex(flat, r"\S").to_numpy(zero_copy_only=False)
    ends = pc.match_substring_regex(flat, r"[.?!\"']\s*$").to_numpy(zero_copy_only=False)
    n = len(counts)
    lines = _per_doc_sum(nonblank.astype(np.float64), doc_idx, n)
    miss = _per_doc_sum((nonblank & ~ends).astype(np.float64), doc_idx, n)
    return _ratio_or(miss, lines, 0.0)


_ELLIPSIS_END_RE = (
    r"(?i)(" + "|".join(m.replace("\\", "\\\\")
                        .replace(".", r"\.")
                        .replace("(", r"\(")
                        .replace(")", r"\)")
                        .replace("[", r"\[")
                        .replace("]", r"\]") for m in ELLIPSIS_MARKS)
    + r")\s*$"
)


def ellipsis_lines_ratio(arr) -> pa.Array:
    """EllipsisFilter (string.py:357-381): fraction of non-blank lines whose
    stripped lowercase form ends with an ellipsis mark; no lines -> 0.0."""
    flat, counts, doc_idx = _flat_segments(arr, "\n")
    nonblank = pc.match_substring_regex(flat, r"\S").to_numpy(zero_copy_only=False)
    hits = pc.match_substring_regex(flat, _ELLIPSIS_END_RE).to_numpy(zero_copy_only=False)
    n = len(counts)
    lines = _per_doc_sum(nonblank.astype(np.float64), doc_idx, n)
    h = _per_doc_sum((nonblank & hits).astype(np.float64), doc_idx, n)
    return _ratio_or(h, lines, 0.0)


def common_word_count(arr) -> pa.Array:
    """CommonEnglishWordsFilter (string.py:384-413) without the early-exit
    (the keep decision ``count >= cutoff`` is identical): exact lowercase word
    matches against the reference's common_english_words set."""
    flat, counts, doc_idx = _flat_words(arr)
    hits = pc.is_in(flat, value_set=pa.array(COMMON_ENGLISH_WORDS)).to_numpy(zero_copy_only=False)
    return pa.array(_per_doc_sum(hits.astype(np.int64), doc_idx, len(counts)).astype(np.int64), pa.int64())


def words_with_alpha_ratio(arr) -> pa.Array:
    """WordsWithoutAlphabetsFilter (string.py:416-442): fraction of words
    containing an alphabetic char; no words -> 1.0 (keep)."""
    flat, counts, doc_idx = _flat_words(arr)
    hits = pc.match_substring_regex(flat, r"[a-zA-Z]").to_numpy(zero_copy_only=False)
    h = _per_doc_sum(hits.astype(np.float64), doc_idx, len(counts))
    return _ratio_or(h, counts.astype(np.float64), 1.0)


def urls_ratio(arr) -> pa.Array:
    """UrlsFilter (string.py:112-143): URL characters over nchar, computed as
    nchar - len(text with URLs removed); empty doc -> 1.0."""
    arr = _as_array(arr)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    stripped = pc.utf8_length(pc.replace_substring_regex(arr, URL_REGEX, "")).to_numpy(
        zero_copy_only=False
    )
    return _ratio_or(nchar - stripped, nchar, 1.0)


_PORN_URL_RE = r"https?://(?:[A-Za-z0-9$\-_@.&+/:=?#~]|[!*\(\),]|(?:%[0-9A-Fa-f]{2}))*porn"


def porn_url_flag(arr) -> pa.Array:
    """PornographicUrlsFilter (string.py:445-467): 1 iff any URL contains
    'porn' (same URL char class, so the match cannot bleed past the URL)."""
    hits = pc.match_substring_regex(_as_array(arr), _PORN_URL_RE)
    return pc.cast(hits, pa.int64())


def substring_present(arr, substring: str, position: str = "any") -> pa.Array:
    """SubstringFilter (string.py:470-501)."""
    arr = _as_array(arr)
    if position == "prefix":
        hits = pc.starts_with(arr, substring)
    elif position == "suffix":
        hits = pc.ends_with(arr, substring)
    elif position == "any":
        hits = pc.match_substring(arr, substring)
    else:
        raise ValueError(f"Invalid position: {position}. Must be one of: prefix, suffix, any.")
    return pc.cast(hits, pa.int64())


def boilerplate_paragraph_ratio(arr, extra_substrings: list[str] | None = None) -> pa.Array:
    """BoilerPlateStringFilter (string.py:265-302): fraction of paragraphs
    (split on blank lines, empties kept) containing a policy substring;
    any 'lorem ipsum' -> 1.0. The reference's four long C4 cookie-banner
    paragraphs are passed via ``extra_substrings`` rather than inlined."""
    flat, counts, doc_idx = _flat_segments(arr, "\n\n")
    low = pc.utf8_lower(flat)
    subs = POLICY_SUBSTRINGS + (extra_substrings or [])
    hit = np.zeros(len(low), dtype=bool)
    for s in subs:
        hit |= pc.match_substring(low, s).to_numpy(zero_copy_only=False)
    lorem = pc.match_substring(low, "lorem ipsum").to_numpy(zero_copy_only=False)
    n = len(counts)
    hits = _per_doc_sum(hit.astype(np.float64), doc_idx, n)
    ratio = np.where(counts > 0, hits / np.maximum(counts, 1), 0.0)
    has_lorem = _per_doc_sum(lorem.astype(np.float64), doc_idx, n) > 0
    ratio[has_lorem] = 1.0
    return pa.array(ratio, pa.float64())


# ------------------------------------------------- repetition.py filters


def _segment_stats(arr, pattern: str, nonblank_only: bool):
    """Per doc: (n_segments, n_unique, total_chars, unique_chars) where
    'unique' keeps the first occurrence of each distinct segment."""
    from ..functions.murmur import hash_bytes_grouped
    from ..functions.shingles import _string_array_buffers

    flat, counts, doc_idx = _flat_segments(arr, pattern)
    if nonblank_only:
        keep = pc.match_substring_regex(flat, r"\S").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        n_docs = len(counts)
        counts = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    n_docs = len(counts)
    if len(flat) == 0:
        z = np.zeros(n_docs)
        return counts.astype(np.float64), z, z, z
    data, offsets = _string_array_buffers(flat)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h = hash_bytes_grouped(data, offsets[:-1], lengths, seed=3, bits=64).view(np.int64)
    # first occurrence of each (doc, segment-hash), in positional order
    pos = np.arange(len(h))
    order = np.lexsort((pos, h, doc_idx))
    sd, sh = doc_idx[order], h[order]
    first_sorted = np.concatenate([[True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])])
    first = np.zeros(len(h), dtype=bool)
    first[order] = first_sorted
    # char lengths per the reference's "".join() measure (codepoints == bytes
    # for ASCII; hash is over utf-8 bytes, length over codepoints)
    cp_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    n_seg = counts.astype(np.float64)
    n_uniq = _per_doc_sum(first.astype(np.float64), doc_idx, n_docs)
    tot_chars = _per_doc_sum(cp_lens, doc_idx, n_docs)
    uniq_chars = _per_doc_sum(cp_lens * first, doc_idx, n_docs)
    return n_seg, n_uniq, tot_chars, uniq_chars


def repeated_lines_unique_ratio(arr) -> pa.Array:
    """RepeatedLinesFilter (repetition.py:24-43): unique/total non-blank
    lines; no lines -> 1.0 (keep)."""
    n_seg, n_uniq, _, _ = _segment_stats(arr, "\n", nonblank_only=True)
    return _ratio_or(n_uniq, n_seg, 1.0)


def repeated_paragraphs_unique_ratio(arr) -> pa.Array:
    """RepeatedParagraphsFilter (repetition.py:46-65): split('\\n\\n') with
    empties kept, unique/total."""
    n_seg, n_uniq, _, _ = _segment_stats(arr, "\n\n", nonblank_only=False)
    return _ratio_or(n_uniq, n_seg, 1.0)


def repeated_lines_char_ratio(arr) -> pa.Array:
    """RepeatedLinesByCharFilter (repetition.py:68-88): chars of unique lines
    over chars of all lines; zero total chars -> 1.0."""
    _, _, tot, uniq = _segment_stats(arr, "\n", nonblank_only=True)
    return _ratio_or(uniq, tot, 1.0)


def repeated_paragraphs_char_ratio(arr) -> pa.Array:
    """RepeatedParagraphsByCharFilter (repetition.py:91-111)."""
    _, _, tot, uniq = _segment_stats(arr, "\n\n", nonblank_only=False)
    return _ratio_or(uniq, tot, 1.0)


def _word_gram_hashes(arr, n: int):
    """Flat word n-gram rolling hashes per doc -> (gram_hash, gram_doc,
    gram_pos_in_doc, words flat array, word doc_idx, word counts)."""
    from ..functions.murmur import hash_bytes_grouped
    from ..functions.shingles import _string_array_buffers

    flat, counts, doc_idx = _flat_words(arr)
    n_docs = len(counts)
    if len(flat) == 0:
        e = np.zeros(0, np.int64)
        return e, e, e, flat, doc_idx, counts
    data, offsets = _string_array_buffers(flat)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    wh = hash_bytes_grouped(data, offsets[:-1], lengths, seed=5, bits=64)
    # rolling polynomial combine of n consecutive word hashes (wraparound
    # arithmetic; 64-bit collisions negligible at batch scale)
    P = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        acc = np.zeros(len(wh) - n + 1, dtype=np.uint64) if len(wh) >= n else np.zeros(0, np.uint64)
        for j in range(n):
            acc = acc * P + wh[j : len(wh) - n + 1 + j] if len(acc) else acc
    # a gram starting at flat position i is valid iff all n words are in the
    # same doc
    starts = np.flatnonzero(np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]])) if len(doc_idx) else np.zeros(0, np.int64)
    doc_start = np.zeros(n_docs, dtype=np.int64)
    if len(starts):
        doc_start[doc_idx[starts]] = starts
    valid = np.zeros(len(acc), dtype=bool)
    if len(acc):
        gram_doc_all = doc_idx[: len(acc)]
        valid = gram_doc_all == doc_idx[np.minimum(np.arange(len(acc)) + n - 1, len(doc_idx) - 1)]
    gram_idx = np.flatnonzero(valid)
    gram_doc = doc_idx[gram_idx]
    gram_pos = gram_idx - doc_start[gram_doc]
    return acc[gram_idx].view(np.int64), gram_doc, gram_pos, flat, doc_idx, counts


def repeating_top_ngrams_ratio(arr, n: int = 2) -> pa.Array:
    """RepeatingTopNGramsFilter (repetition.py:114-154): chars claimed by the
    most frequent word n-gram over nchar (via ``text.replace`` count like the
    reference); < n words -> 1.0. Tie-break: earliest first occurrence (the
    reference's dict-order tie-break is unspecified)."""
    arr = _as_array(arr)
    gh, gd, gp, flat, wdoc, counts = _word_gram_hashes(arr, n)
    n_docs = len(counts)
    out = np.ones(n_docs, dtype=np.float64)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(gh) == 0:
        out[nchar == 0] = 1.0
        return pa.array(out, pa.float64())
    # count + first position per (doc, gram)
    order = np.lexsort((gp, gh, gd))
    sd, sh, sp = gd[order], gh[order], gp[order]
    new_run = np.concatenate([[True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])])
    run_starts = np.flatnonzero(new_run)
    run_sizes = np.diff(np.append(run_starts, len(sd)))
    run_doc = sd[run_starts]
    run_first = sp[run_starts]  # min pos within run (pos lexsorted last)
    # per doc: max count, tie -> min first position (vectorized argmax)
    sel = np.lexsort((run_first, -run_sizes, run_doc))
    rd = run_doc[sel]
    top_rows = sel[np.flatnonzero(np.concatenate([[True], rd[1:] != rd[:-1]]))]
    # reconstruct top gram strings and count occurrences in the raw text
    # (one C-level str.count per doc; the n-gram counting above is vectorized)
    words = flat.to_pylist()
    starts = np.flatnonzero(np.concatenate([[True], wdoc[1:] != wdoc[:-1]])) if len(wdoc) else np.zeros(0, np.int64)
    doc_start = np.zeros(n_docs, dtype=np.int64)
    if len(starts):
        doc_start[wdoc[starts]] = starts
    texts = arr.to_pylist()
    for r in top_rows:
        d = int(run_doc[r])
        s = doc_start[d] + run_first[r]
        gram = " ".join(words[s : s + n])
        t = texts[d] or ""
        if len(t) == 0:
            out[d] = 1.0
            continue
        out[d] = (t.count(gram) * len(gram)) / len(t)
    out[(counts < n)] = 1.0
    return pa.array(out, pa.float64())


def repeating_dup_ngrams_ratio(arr, n: int = 2) -> pa.Array:
    """RepeatingDuplicateNGramsFilter (repetition.py:157-203): chars covered
    by duplicate n-grams (overlap-aware, exactly the reference's counting)
    over nchar; < n words -> 1.0."""
    arr = _as_array(arr)
    gh, gd, gp, flat, wdoc, counts = _word_gram_hashes(arr, n)
    n_docs = len(counts)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.zeros(n_docs, dtype=np.float64)
    out[counts < n] = 1.0
    out[nchar == 0] = 1.0
    if len(gh) == 0:
        return pa.array(out, pa.float64())
    # dup = gram seen earlier in the same doc (not the first occurrence)
    order = np.lexsort((gp, gh, gd))
    sd, sh = gd[order], gh[order]
    first_sorted = np.concatenate([[True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])])
    dup = np.zeros(len(gh), dtype=bool)
    dup[order] = ~first_sorted
    wlens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    # per-doc coverage-aware char count (vectorized within each doc)
    starts = np.flatnonzero(np.concatenate([[True], wdoc[1:] != wdoc[:-1]])) if len(wdoc) else np.zeros(0, np.int64)
    doc_start = np.zeros(n_docs, dtype=np.int64)
    if len(starts):
        doc_start[wdoc[starts]] = starts
    cs = np.concatenate([[0], np.cumsum(wlens)])
    for d in np.unique(gd[dup]):
        if counts[d] < n or nchar[d] == 0:
            continue
        sel = (gd == d) & dup
        pos = gp[sel]  # ascending (gram order preserved)
        ends = pos + n
        prev_end = np.concatenate([[0], np.maximum.accumulate(ends)[:-1]])
        new_start = np.maximum(pos, prev_end)
        overlap = new_start - pos
        base = doc_start[d]
        chars = cs[base + ends] - cs[base + new_start]
        nspaces = np.minimum(n - overlap, n - 1)
        out[d] = float(chars.sum() + nspaces.sum()) / nchar[d]
    return pa.array(out, pa.float64())


# ------------------------------------------------------ code.py filters


def tokenizer_fertility(arr) -> pa.Array:
    """TokenizerFertilityFilter (code.py:100-120) with the package's regex
    token counter standing in for the SentencePiece model (absent in this
    environment): chars per token; 0 tokens -> -1."""
    arr = _as_array(arr)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    toks = token_count(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(np.where(toks > 0, nchar / np.maximum(toks, 1), -1.0), pa.float64())


def html_boilerplate_text_ratio(arr, min_lang_content_num_chars: int = 100) -> pa.Array:
    """HTMLBoilerplateFilter (code.py:166-197): visible-text over source
    length. Regex stand-in for BeautifulSoup (absent here): drop script/style
    blocks, then all tags; < min chars of text -> 0."""
    arr = _as_array(arr)
    src_len = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    no_blocks = pc.replace_substring_regex(
        arr, r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>", ""
    )
    text = pc.replace_substring_regex(no_blocks, r"<[^>]*>", "")
    text_len = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    ratio = np.where(src_len > 0, text_len / np.maximum(src_len, 1), 0.0)
    ratio[text_len < min_lang_content_num_chars] = 0.0
    return pa.array(ratio, pa.float64())


def histogram_char_ratio(arr, char_class: str = r"[\x20-\x7E\t\n\r]") -> pa.Array:
    """HistogramFilter (histogram/histogram.py:24-) — the NLLB cheap-language
    check: fraction of characters inside the trusted set. The reference
    downloads per-language histograms (no network here); the default trusted
    set is printable ASCII, configurable per language. Empty doc -> 1.0."""
    arr = _as_array(arr)
    nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    hits = pc.count_substring_regex(arr, char_class).to_numpy(zero_copy_only=False).astype(np.float64)
    return _ratio_or(hits, nchar, 1.0)


def token_count_filter(ds, text_field: str = "text", min_tokens: int = 0, max_tokens: int | None = None):
    """TokenCountFilter (filters/token/token_count.py:23-): keep documents
    whose token count is inside [min_tokens, max_tokens]; the package's regex
    token counter stands in for the HF tokenizer."""
    from .text import filter_stage

    return filter_stage(
        ds, lambda a: token_count(a), text_field, min_value=min_tokens, max_value=max_tokens
    )


def histogram_filter(ds, text_field: str = "text", threshold: float = 0.8, char_class: str = r"[\x20-\x7E\t\n\r]"):
    """HistogramFilter (filters/histogram/histogram.py:24-): keep documents
    whose trusted-charset ratio is at least ``threshold``."""
    from .text import filter_stage

    return filter_stage(
        ds, lambda a: histogram_char_ratio(a, char_class), text_field, min_value=threshold
    )


def per_extension_stage(ds, rules: dict[str, dict], text_field: str = "text", ext_field: str = "extension"):
    """PerExtensionFilter (code.py:200-268) with the CSV replaced by an
    explicit ``rules`` dict: extension -> {include, line_max, line_mean,
    alphanum_frac, alpha_frac}. Rows whose extension has no rule, or whose
    rule sets include=False, are dropped; threshold checks mirror the
    reference's per-row params."""

    def fn(batch: pa.Table) -> pa.Table:
        exts = batch.column(ext_field).to_pylist()
        texts = batch.column(text_field)
        n = len(batch)
        nchar = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
        alnum = pc.count_substring_regex(texts, r"[a-zA-Z0-9]").to_numpy(zero_copy_only=False)
        alpha = pc.count_substring_regex(texts, r"[a-zA-Z]").to_numpy(zero_copy_only=False)
        flat, counts, doc_idx = _flat_segments(texts, "\n")
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        line_max = np.zeros(n, dtype=np.int64)
        if len(lens):
            starts = np.flatnonzero(np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]]))
            line_max[doc_idx[starts]] = np.maximum.reduceat(lens, starts)
        line_mean = np.where(counts > 0, _per_doc_sum(lens.astype(np.float64), doc_idx, n) / np.maximum(counts, 1), 0.0)
        keep = np.zeros(n, dtype=bool)
        for i, ext in enumerate(exts):
            rule = rules.get(ext)
            if not rule or not rule.get("include", True):
                continue
            ok = True
            if rule.get("line_max") is not None:
                ok &= line_max[i] <= rule["line_max"]
            if rule.get("line_mean") is not None:
                ok &= line_mean[i] <= rule["line_mean"]
            if rule.get("alphanum_frac") is not None and nchar[i] > 0:
                ok &= (alnum[i] / nchar[i]) >= rule["alphanum_frac"]
            if rule.get("alpha_frac") is not None and nchar[i] > 0:
                ok &= (alpha[i] / nchar[i]) >= rule["alpha_frac"]
            keep[i] = ok
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
