"""Heuristic-filter kernels vs naive per-document reference semantics.

Each naive checker below re-states the scoring rule of the corresponding
reference DocumentFilter (string.py / repetition.py / code.py, see
curator_ray/stages/filters.py docstrings) in direct per-doc Python; the
vectorized batch kernels must agree on every doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.stages import filters as F

DOCS = [
    "the cat sat on the mat the cat sat",
    "• first\n• second\nplain line.\n• third",
    "line one...\nline two\nline one...\n\nline one...",
    "word " * 20 + "supercalifragilisticexpialidocious",
    "visit https://example.com/page?x=1 now",
    "see http://www.porn-site.example/x for bad things",
    "12345 67890 mixed12 words",
    "(parens) [brackets] {braces} plain",
    "a b a b a b a b a b",
    "",
    "   ",
    "Privacy Policy\n\nreal content here\n\nterms of use apply",
    "lorem ipsum dolor sit amet",
    "<html><script>var x=1;</script><body>" + "Visible text content. " * 10 + "</body></html>",
]


def arr():
    return pa.array(DOCS, pa.string())


def words(t):
    return t.strip().split()


def lines(t):
    return [x for x in t.split("\n") if x.strip()]


def test_long_word_max():
    got = F.long_word_max(arr()).to_pylist()
    want = [max((len(w) for w in words(t)), default=0) for t in DOCS]
    assert got == want


def test_mean_word_length():
    got = F.mean_word_length_ref(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        ws = words(t)
        want = sum(len(w) for w in ws) / len(ws) if ws else 0.0
        assert g == pytest.approx(want)


def test_common_word_count():
    got = F.common_word_count(arr()).to_pylist()
    cw = set(F.COMMON_ENGLISH_WORDS)
    want = [sum(w in cw for w in words(t)) for t in DOCS]
    assert got == want


def test_words_with_alpha_ratio():
    got = F.words_with_alpha_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        ws = words(t)
        want = sum(any(c.isascii() and c.isalpha() for c in w) for w in ws) / len(ws) if ws else 1.0
        assert g == pytest.approx(want)


def test_bullet_lines_ratio():
    got = F.bullet_lines_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        ls = lines(t)
        want = sum(l.strip().startswith(tuple(F.BULLET_CHARS)) for l in ls) / len(ls) if ls else 0.0
        assert g == pytest.approx(want)


def test_punct_lines_ratio():
    got = F.punct_lines_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        ls = lines(t)
        want = sum(not l.strip().endswith(F.END_MARKS) for l in ls) / len(ls) if ls else 0.0
        assert g == pytest.approx(want)


def test_ellipsis_lines_ratio():
    got = F.ellipsis_lines_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        ls = lines(t)
        want = (
            sum(any(l.strip().lower().endswith(m) for m in F.ELLIPSIS_MARKS) for l in ls) / len(ls)
            if ls
            else 0.0
        )
        assert g == pytest.approx(want)


def test_urls_ratio_and_porn_flag():
    import re

    pat = re.compile(F.URL_REGEX)
    got = F.urls_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        want = sum(len(u) for u in pat.findall(t)) / len(t) if len(t) else 1.0
        assert g == pytest.approx(want)
    flags = F.porn_url_flag(arr()).to_pylist()
    want_flags = [int(any("porn" in u for u in pat.findall(t))) for t in DOCS]
    assert flags == want_flags


def test_parens_whitespace_nonalnum_histogram():
    got = F.parentheses_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        want = sum(c in "{}⟨⟩[]()" for c in t) / len(t) if len(t) else 1.0
        assert g == pytest.approx(want)
    got = F.whitespace_ratio_ref(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        want = sum(c in "\t\n\r\b " for c in t) / len(t) if len(t) else 1.0
        assert g == pytest.approx(want)
    got = F.non_alphanum_ratio_ref(arr()).to_pylist()
    import re

    alnum = re.compile(r"[a-zA-Z0-9\n?!,.]")
    for g, t in zip(got, DOCS):
        want = (len(t) - len(alnum.findall(t))) / len(t) if len(t) else 1.0
        assert g == pytest.approx(want)
    got = F.histogram_char_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        want = sum(("\x20" <= c <= "\x7e") or c in "\t\n\r" for c in t) / len(t) if len(t) else 1.0
        assert g == pytest.approx(want)


def test_substring_present():
    a = arr()
    assert F.substring_present(a, "the", "prefix").to_pylist()[0] == 1
    assert F.substring_present(a, "sat", "suffix").to_pylist()[0] == 1
    assert F.substring_present(a, "cat", "any").to_pylist()[0] == 1
    assert F.substring_present(a, "dog", "any").to_pylist()[0] == 0
    with pytest.raises(ValueError):
        F.substring_present(a, "x", "middle")


def test_boilerplate_ratio():
    got = F.boilerplate_paragraph_ratio(arr()).to_pylist()
    for g, t in zip(got, DOCS):
        paras = t.split("\n\n")
        if any("lorem ipsum" in p.strip().lower() for p in paras):
            want = 1.0
        else:
            want = sum(
                any(s in p.strip().lower() for s in F.POLICY_SUBSTRINGS) for p in paras
            ) / len(paras)
        assert g == pytest.approx(want)


def test_repeated_segments():
    got_l = F.repeated_lines_unique_ratio(arr()).to_pylist()
    got_lc = F.repeated_lines_char_ratio(arr()).to_pylist()
    for gl, glc, t in zip(got_l, got_lc, DOCS):
        ls = lines(t)
        if ls:
            uniq = list(dict.fromkeys(ls))
            assert gl == pytest.approx(len(uniq) / len(ls))
            tot = sum(len(x) for x in ls)
            assert glc == pytest.approx(sum(len(x) for x in uniq) / tot if tot else 1.0)
        else:
            assert gl == 1.0 and glc == 1.0
    got_p = F.repeated_paragraphs_unique_ratio(arr()).to_pylist()
    for gp_, t in zip(got_p, DOCS):
        ps = t.split("\n\n")
        assert gp_ == pytest.approx(len(set(ps)) / len(ps))


def naive_top_ngram_ratio(t, n):
    ws = words(t)
    if len(ws) < n:
        return 1.0
    grams = [tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    counts: dict = {}
    first: dict = {}
    for i, g in enumerate(grams):
        counts[g] = counts.get(g, 0) + 1
        first.setdefault(g, i)
    top = max(counts, key=lambda g: (counts[g], -first[g]))
    gram = " ".join(top)
    return (t.count(gram) * len(gram)) / len(t) if len(t) else 1.0


def naive_dup_ngram_ratio(t, n):
    ws = words(t)
    if len(ws) < n:
        return 1.0
    grams = [tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    counts: dict = {}
    dup_chars = 0
    overlap = 0
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
        if counts[g] > 1:
            dup_chars += sum(len(w) for w in g[overlap:]) + min(n - overlap, n - 1)
            overlap = n
        overlap = max(overlap - 1, 0)
    return dup_chars / len(t) if len(t) else 1.0


@pytest.mark.parametrize("n", [2, 3])
def test_repeating_ngram_filters(n):
    got_top = F.repeating_top_ngrams_ratio(arr(), n).to_pylist()
    got_dup = F.repeating_dup_ngrams_ratio(arr(), n).to_pylist()
    for gt, gd, t in zip(got_top, got_dup, DOCS):
        assert gt == pytest.approx(naive_top_ngram_ratio(t, n)), t
        assert gd == pytest.approx(naive_dup_ngram_ratio(t, n)), t


def test_tokenizer_fertility_and_html():
    got = F.tokenizer_fertility(arr()).to_pylist()
    assert got[9] == -1.0  # empty doc, 0 tokens
    assert got[0] == pytest.approx(len(DOCS[0]) / 9)  # 9 regex tokens
    html = F.html_boilerplate_text_ratio(arr(), min_lang_content_num_chars=10).to_pylist()
    t = DOCS[13]
    stripped = "Visible text content. " * 10
    assert html[13] == pytest.approx(len(stripped) / len(t))
    assert html[0] == pytest.approx(1.0)  # no tags: all visible


def test_per_extension_stage(ray_session):
    import ray

    tbl = pa.table(
        {
            "text": ["short code\nok", "x" * 500, "alpha beta gamma", "no rule"],
            "extension": ["py", "py", "txt", "exe"],
        }
    )
    ds = ray.data.from_arrow(tbl)
    rules = {
        "py": {"include": True, "line_max": 100},
        "txt": {"include": True, "alpha_frac": 0.5},
        "exe": {"include": False},
    }
    out = F.per_extension_stage(ds, rules).take_all()
    kept = sorted(r["text"][:5] for r in out)
    assert kept == ["alpha", "short"]


def test_token_count_and_histogram_filters(ray_session):
    import ray

    from curator_ray.stages.filters import histogram_filter, token_count_filter
    from curator_ray.stages.text import token_count

    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": ["one two three", "a", "日本語のテキストです", "four five six seven eight"],
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept = token_count_filter(ds, min_tokens=3, max_tokens=5).take_all()
    want = [r for r in tbl.to_pylist() if 3 <= token_count(pa.array([r["text"]])).to_pylist()[0] <= 5]
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in want)

    kept = histogram_filter(ray.data.from_arrow(tbl), threshold=0.8).take_all()
    # the Japanese doc falls outside the printable-ASCII trusted set
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 3]
