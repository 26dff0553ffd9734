"""Translation family: segmentation rules, echo translate, exact reassembly."""

from __future__ import annotations

import pyarrow as pa
import pytest

from curator_ray.stages.translation import (
    IdentityTranslationClient,
    reassemble_stage,
    segment_stage,
    translate_documents,
)


TRICKY = [
    "plain text line",
    "  indented line\n\tanother with tab lead",
    "```\ncode line stays\n```\nafter block",
    "<tag>\n{\"k\": [1, 2]}\n[1, 2, 3]\n12345\nreal words",
    "",
    "trailing newline\n",
    "{not json but braces}",
]


@pytest.mark.usefixtures("ray_session")
def test_identity_roundtrip_exact():
    import ray

    tbl = pa.table({"doc_id": list(range(len(TRICKY))), "text": TRICKY})
    out = translate_documents(
        ray.data.from_arrow(tbl), client_factory=IdentityTranslationClient
    ).to_pandas().sort_values("doc_id")
    assert list(out.text) == TRICKY  # exact-structure preservation


@pytest.mark.usefixtures("ray_session")
def test_segment_kinds():
    import ray

    doc = "words here\n```\nin code\n```\n<tag>\n123\n{\"a\": 1}\n  lead words"
    segs = segment_stage(ray.data.from_arrow(pa.table({"doc_id": [0], "text": [doc]})))
    rows = sorted(segs.take_all(), key=lambda r: r["line_idx"])
    kinds = [r["kind"] for r in rows]
    #          words  ```  in-code  ```  <tag>  123  json  lead-words
    assert kinds == [1, 0, 0, 0, 0, 0, 0, 1]
    assert rows[7]["lead"] == "  " and rows[7]["text"] == "lead words"
    assert rows[2]["text"] == "in code"  # verbatim inside the fence


@pytest.mark.usefixtures("ray_session")
def test_echo_translation_structure():
    import ray

    doc = "```\ncode\n```\nhello world\n  spaced words\n42"
    out = translate_documents(
        ray.data.from_arrow(pa.table({"doc_id": [0], "text": [doc]}))
    ).take_all()
    assert out[0]["text"] == "```\ncode\n```\n[de] hello world\n  [de] spaced words\n42"


@pytest.mark.usefixtures("ray_session")
def test_reassemble_orders_lines_across_blocks():
    import ray

    # shuffled line rows (as if translate ran out of order) rejoin by line_idx
    rows = pa.table(
        {
            "doc_id": [0, 0, 0],
            "line_idx": [2, 0, 1],
            "kind": [1, 1, 1],
            "lead": ["", "", "  "],
            "text": ["c", "a", "b"],
        }
    )
    out = reassemble_stage(ray.data.from_arrow(rows)).take_all()
    assert out[0]["text"] == "a\n  b\nc"
