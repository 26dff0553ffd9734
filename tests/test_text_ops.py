"""Text analysis / filter / modifier operator tests."""

import pyarrow as pa
import pytest
import ray.data

from curator_ray.stages.text import (
    document_joiner,
    document_splitter,
    filter_stage,
    fingerprint_stage,
    lang_id,
    markdown_remover,
    mean_word_length,
    newline_normalizer,
    non_alpha_numeric_ratio,
    punctuation_ratio,
    quality_score,
    score_stage,
    stopword_ratio,
    token_count,
    url_count,
    url_remover,
    whitespace_ratio,
    word_count,
)


def test_word_count():
    arr = pa.array(["one two three", "  spaced   out  ", "", "single"])
    assert word_count(arr).to_pylist() == [3, 2, 0, 1]


def test_token_count():
    arr = pa.array(["hello, world! 123", ""])
    # hello , world ! 123 -> 5 tokens
    assert token_count(arr).to_pylist() == [5, 0]


def test_ratios():
    arr = pa.array(["abc!!", "12345", "     "])
    r = non_alpha_numeric_ratio(arr).to_pylist()
    assert abs(r[0] - 2 / 5) < 1e-9
    assert r[1] == 0.0
    assert r[2] == 1.0
    assert url_count(pa.array(["see https://x.com and www.y.org"])).to_pylist() == [2]
    assert whitespace_ratio(pa.array(["a b"])).to_pylist() == [pytest.approx(1 / 3)]
    assert punctuation_ratio(pa.array(["Hi. There!"])).to_pylist() == [pytest.approx(1.0)]
    assert mean_word_length(pa.array(["ab cd"])).to_pylist() == [pytest.approx(2.0)]


def test_stopword_and_quality():
    good = "the cat sat on the mat and it was happy with all of that for sure"
    bad = "@@@@ #### $$$$ %%%%"
    s = stopword_ratio(pa.array([good, bad])).to_pylist()
    assert s[0] > 0.2 and s[1] == 0.0
    q = quality_score(pa.array([good, bad])).to_pylist()
    assert q[0] == 1.0 and q[1] <= 0.5


def test_lang_id():
    arr = pa.array(
        [
            "the quick brown fox and the lazy dog that was here",
            "der Hund ist nicht mit der Katze und das ist gut",
            "le chat est dans la maison et il est content pour que",
            "@@@@",
        ]
    )
    assert lang_id(arr).to_pylist() == ["en", "de", "fr", "xx"]


def test_modifiers():
    assert newline_normalizer(pa.array(["a\n\n\n\nb"])).to_pylist() == ["a\n\nb"]
    assert url_remover(pa.array(["go to https://x.com now"])).to_pylist() == ["go to  now"]
    assert markdown_remover(pa.array(["**bold** and [link](http://x)"])).to_pylist() == ["bold and link"]


def test_score_filter_stages(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["one two three four five", "tiny", "a b c d e f g"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    scored = score_stage(ds, word_count, "text", "n_words").take_all()
    assert [r["n_words"] for r in scored] == [5, 1, 7]
    kept = filter_stage(ds, word_count, "text", min_value=5).take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 3]
    inv = filter_stage(ds, word_count, "text", min_value=5, invert=True).take_all()
    assert [r["doc_id"] for r in inv] == [2]


def test_fingerprint_deterministic(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["some shared long content here", "some shared long content here", "else"]),
        }
    )
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprint_stage(ray.data.from_arrow(tbl), "text").take_all()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_splitter_joiner_roundtrip(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a|b|c", "xyz"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    split = document_splitter(ds, "text", "|")
    rows = sorted(split.take_all(), key=lambda r: (r["doc_id"], r["segment_id"]))
    assert [r["text"] for r in rows] == ["a", "b", "c", "xyz"]
    joined = {r["doc_id"]: r["text"] for r in document_joiner(split, "text", "|").take_all()}
    assert joined == {1: "a|b|c", 2: "xyz"}


def test_repeated_lines_paragraphs():
    from curator_ray.stages.text import repeated_lines_ratio, repeated_paragraphs_ratio

    arr = pa.array(
        [
            "a\nb\na\nc",  # 1 dup of 4 lines
            "x\ny\nz",  # none
            "",  # single empty segment
            "p\np\np\np",  # 3 dups of 4
        ]
    )
    r = repeated_lines_ratio(arr).to_pylist()
    assert r[0] == pytest.approx(0.25)
    assert r[1] == 0.0
    assert r[3] == pytest.approx(0.75)
    p = repeated_paragraphs_ratio(pa.array(["one\n\ntwo\n\none", "solo"])).to_pylist()
    assert p[0] == pytest.approx(1 / 3)
    assert p[1] == 0.0


def test_code_filters():
    from curator_ray.stages.text import (
        alpha_fraction,
        general_comment_to_code_ratio,
        line_count,
        python_comment_to_code_ratio,
        xml_header_present,
    )

    code = "# comment\nx = 1\n# another\ny = 2"
    arr = pa.array([code, "no comments here"])
    assert line_count(arr).to_pylist() == [4, 1]
    assert python_comment_to_code_ratio(arr).to_pylist() == [pytest.approx(0.5), 0.0]
    g = general_comment_to_code_ratio(pa.array(["// c\nint x;\n/* block */"])).to_pylist()
    assert g[0] == pytest.approx(2 / 3)
    assert xml_header_present(pa.array(['<?xml version="1.0"?><a/>', "<html>"])).to_pylist() == [True, False]
    assert alpha_fraction(pa.array(["ab12"])).to_pylist() == [pytest.approx(0.5)]


def test_more_modifiers():
    from curator_ray.stages.text import boilerplate_remover, quotation_remover, slicer

    assert quotation_remover(pa.array(['"hello"', "plain"])).to_pylist() == ["hello", "plain"]
    assert slicer(pa.array(["abcdef"]), 1, 4).to_pylist() == ["bcd"]
    out = boilerplate_remover(pa.array(["keep me\nAll Rights Reserved 2024\nand me"])).to_pylist()
    assert out[0] == "keep me\nand me"


def test_sort_batch_by_length(ray_session):
    from curator_ray.stages.text import sort_batch_by_length

    tbl = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(["mediumtext", "ab", "the longest text here"])}
    )
    out = sort_batch_by_length(ray.data.from_arrow(tbl), "text").take_all()
    assert [r["doc_id"] for r in out] == [2, 1, 3]
    out_d = sort_batch_by_length(ray.data.from_arrow(tbl), "text", descending=True).take_all()
    assert [r["doc_id"] for r in out_d] == [3, 1, 2]


def test_line_remover():
    from curator_ray.stages.text import line_remover

    arr = pa.array(
        [
            "keep\nREMOVE\nalso keep",
            "REMOVE\nREMOVE",
            "no match",
            "partial REMOVE stays",
        ]
    )
    out = line_remover(arr, ["REMOVE"]).to_pylist()
    assert out == ["keep\nalso keep", "", "no match", "partial REMOVE stays"]


def test_fasttext_label():
    from curator_ray.stages.text import fasttext_label

    arr = pa.array(["line one\nline two", "has __label__x inside"])
    out = fasttext_label(arr, "__label__en").to_pylist()
    assert out == ["__label__en line one line two", "__label__en has  x inside"]


def test_unicode_reformatter():
    from curator_ray.stages.text import unicode_reformatter

    arr = pa.array(["a\x00b\x07c", "&amp; &lt;tag&gt;", "&amp;lt;", "café"])
    out = unicode_reformatter(arr, normalization="NFC").to_pylist()
    assert out[0] == "abc"
    assert out[1] == "& <tag>"
    assert out[2] == "&lt;"  # double-escaped entity unescapes exactly once
    assert out[3] == "café"  # NFC composes e + combining acute


def test_line_remover_null_text():
    from curator_ray.stages.text import line_remover

    out = line_remover(pa.array(["keep\nDROP", None]), ["DROP"]).to_pylist()
    assert out == ["keep", ""]


def test_fix_mojibake_classic_fixtures():
    from curator_ray.stages.text import fix_mojibake

    good = "déjà vu — naïve café"
    cases = pa.array(
        [
            "Ã©",  # é through latin-1
            "This â€” that, â€œquotedâ€\x9d, donâ€™t",  # cp1252 punctuation family
            "ÃƒÂ©",  # double-encoded é converges over two passes
            "SÃ£o Paulo â€“ AtlÃ¢ntico",
            good,  # genuine accented text is untouched
            "plain ascii stays",
            None,
        ]
    )
    out = fix_mojibake(cases).to_pylist()
    assert out[0] == "é"
    assert out[1] == "This — that, “quoted”, don’t"
    assert out[2] == "é"
    assert out[3] == "São Paulo – Atlântico"
    assert out[4] == good
    assert out[5] == "plain ascii stays"
    assert out[6] is None


def test_unicode_reformatter_repairs_before_stripping():
    from curator_ray.stages.text import unicode_reformatter

    # U+201D mis-decodes to "â€" + C1 control 0x9D: the control char is PART
    # of the broken sequence, so repair must run before control stripping
    arr = pa.array(["â€\x9dend"])
    assert unicode_reformatter(arr).to_pylist() == ["”end"]
    # and with repair disabled, the old deterministic behavior holds
    assert unicode_reformatter(arr, fix_encoding=False).to_pylist() == ["â€end"]
