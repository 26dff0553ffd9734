"""Math-curation stage family (reference stages/math): token splitter,
chunk merge, center crop, FineMath scorer, MIME content extraction.

Splitter/merge semantics are checked against a direct Python re-implementation
of the reference algorithm (chunking.py:66-119) and by the exact split→merge
roundtrip the ``token_chunk_roundtrip`` oracle relies on."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.stages.math import (
    MathContentExtractor,
    center_crop,
    finemath_scorer,
    math_content_extract,
    merge_chunks,
    notebook_to_text,
    token_splitter,
)
from curator_ray.stages.text import token_count


def _ref_chunks(text: str, max_tokens: int, sep: str) -> list[tuple[str, int]]:
    """Direct port of the reference greedy loop (chunking.py:77-117), with
    the repo's token kernel standing in for the HF tokenizer."""
    raw = text.split(sep)
    paragraphs = []
    for i, p in enumerate(raw):
        if p.strip():
            paragraphs.append(p if i == len(raw) - 1 else p + sep)
    chunks, cur, count = [], [], 0
    for p in paragraphs:
        n = token_count(pa.array([p]))[0].as_py()
        if count + n > max_tokens and count > 0:
            chunks.append(("".join(cur), count))
            cur, count = [], 0
        cur.append(p)
        count += n
    if cur:
        chunks.append(("".join(cur), count))
    return chunks


TEXTS = [
    "one two three\n\nfour five\n\nsix seven eight nine\n\nten",
    "single paragraph only",
    "a\n\n\n\nb",  # blank paragraph dropped
    "",  # no chunks at all
    "x " * 50 + "\n\nshort",  # first paragraph alone exceeds the budget
]


@pytest.mark.usefixtures("ray_session")
def test_token_splitter_matches_reference_loop():
    import ray

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS})
    )
    out = token_splitter(ds, max_length_tokens=5, separator="\n\n").to_pandas()
    for i, text in enumerate(TEXTS):
        want = _ref_chunks(text, 5, "\n\n")
        got = out[out.doc_id == i].sort_values("chunk_id")
        assert list(got.chunk_id) == list(range(len(want)))
        assert list(got.text) == [t for t, _ in want]
        assert list(got.n_tokens) == [n for _, n in want]


@pytest.mark.usefixtures("ray_session")
def test_merge_chunks_dedup_filter_sum():
    import ray

    rows = pa.table(
        {
            "doc_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "chunk_id": pa.array([1, 0, 1, 2, 0, 1, 0], pa.int64()),
            "text": ["B", "A", "B-dup", "NO USEFUL CONTENT", "x", "", "\n"],
            "n_tokens": pa.array([2, 1, 9, 9, 1, 0, 0], pa.int64()),
        }
    )
    out = (
        merge_chunks(
            ray.data.from_arrow(rows),
            groupby_columns=["doc_id"],
            sum_columns=["n_tokens"],
            separator="|",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 1: dup chunk 1 dropped (keep first), marker chunk dropped, sorted merge
    assert list(out.doc_id) == [1, 2]
    d1 = out[out.doc_id == 1].iloc[0]
    assert d1.text == "A|B" and d1.n_tokens == 3
    assert out[out.doc_id == 2].iloc[0].text == "x"  # empty chunk dropped
    # doc 3 had only a newline chunk -> no output row


@pytest.mark.usefixtures("ray_session")
def test_split_merge_roundtrip_exact():
    import ray

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 40))) for _ in range(30)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(30), pa.int64()), "text": texts})
    )
    chunked = token_splitter(ds, max_length_tokens=4, separator=" ")
    merged = merge_chunks(
        chunked, groupby_columns=["doc_id"], sum_columns=["n_tokens"], separator=""
    ).to_pandas()
    got = dict(zip(merged.doc_id, merged.text))
    assert got == {i: t for i, t in enumerate(texts)}


@pytest.mark.usefixtures("ray_session")
def test_center_crop():
    import ray

    long = "".join(chr(ord("a") + i % 26) for i in range(100))
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1], "text": ["short", long]}))
    out = center_crop(ds, center_crop_chars=10).to_pandas().sort_values("doc_id")
    assert out.iloc[0].text == "short"
    m = len(long) // 2
    assert out.iloc[1].text == long[m - 10 : m + 10]


def test_notebook_to_text():
    nb = {
        "nbformat": 4,
        "nbformat_minor": 5,
        "cells": [
            {"cell_type": "markdown", "source": ["# title\n", "prose"]},
            {
                "cell_type": "code",
                "source": ["print(1)\n"],
                "outputs": [
                    {"output_type": "stream", "text": ["1\n"]},
                    {"output_type": "execute_result", "data": {"text/plain": ["42"]}},
                ],
            },
            {"cell_type": "raw", "source": ["raw"]},
        ],
    }
    assert notebook_to_text(json.dumps(nb)) == "# title\nproseprint(1)\n1\n42raw"


@pytest.mark.usefixtures("ray_session")
def test_math_content_extract_routing():
    import ray

    nb = json.dumps(
        {"nbformat": 4, "nbformat_minor": 5,
         "cells": [{"cell_type": "markdown", "source": ["math doc"]}]}
    )
    html = (
        "<html><head><title>t</title></head><body>"
        + "<p>" + "the of and to in a is that it was for on are " * 20 + "</p>"
        + "</body></html>"
    )
    rows = pa.table(
        {
            "binary_content": pa.array(
                [nb.encode(), html.encode(), b"plain text body", None], pa.binary()
            ),
            "url": ["http://x/1.ipynb", "http://x/2.html", "http://x/3.txt", "http://x/4"],
            "mime_type": [None, "text/html", "text/plain", "text/plain"],
        }
    )
    out = (
        math_content_extract(ray.data.from_arrow(rows), stopwords_low=0.0, stopwords_high=0.0)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out.type) == ["notebook", "html", "text"]  # null byte row dropped
    assert out.iloc[0].text == "math doc"
    assert "the of and" in out.iloc[1].text
    assert out.iloc[2].text == "plain text body"
    assert out.magic_mime_type.isna().all()  # libmagic absent in sandbox


def test_extractor_xml_declaration_stripped():
    ex = MathContentExtractor()
    batch = pa.table(
        {
            "binary_content": pa.array([b'<?xml version="1.0"?>hello'], pa.binary()),
            "url": ["http://x/a.txt"],
            "mime_type": ["text/plain"],
        }
    )
    out = ex(batch)
    assert out.column("text").to_pylist() == ["hello"]


@pytest.mark.usefixtures("ray_session")
def test_finemath_scorer_shape():
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": ["solve x", "math " * 300, "no equations here at all", "y = 2"],
            }
        )
    )
    out = finemath_scorer(ds).to_pandas()
    assert len(out) == 4
    assert ((out.finemath_scores >= 0) & (out.finemath_scores <= 5)).all()
    assert (out.finemath_int_scores == out.finemath_scores.round().astype(int)).all()
    # deterministic: same input -> same scores
    out2 = finemath_scorer(
        ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": ["solve x", "math " * 300, "no equations here at all", "y = 2"]})
        )
    ).to_pandas()
    a = out.sort_values("doc_id").finemath_scores.to_numpy()
    b = out2.sort_values("doc_id").finemath_scores.to_numpy()
    assert np.allclose(a, b)


def test_token_splitter_null_text(ray_session):
    import ray

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1], "text": ["para one\n\npara two", None]})
    )
    out = token_splitter(ds, max_length_tokens=2).to_pandas()
    # null doc == empty doc: contributes no chunks, no crash
    assert set(out.doc_id) == {0}


def test_center_crop_interleaved_order(ray_session):
    import ray

    long_a = "a" * 100
    long_b = "b" * 80
    tbl = pa.table({"doc_id": [0, 1, 2, 3], "text": [long_a, "s1", long_b, "s2"]})
    out = (
        center_crop(ray.data.from_arrow(tbl), center_crop_chars=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out.text) == ["a" * 10, "s1", "b" * 10, "s2"]
