"""End-to-end text-curation composite: clean -> filter -> exact-dedup."""

from __future__ import annotations

import pyarrow as pa
import pytest

from curator_ray.pipelines.text_curation import TextCurationConfig, text_curation_survivors


@pytest.mark.usefixtures("ray_session")
def test_text_curation_pipeline():
    import ray

    texts = {
        0: "w " * 29 + "common tail",          # 31 words, kept
        1: "w " * 29 + "common tail",          # exact dup of 0 -> removed
        2: "too short",                        # 2 words -> filtered
        3: "x " * 100 + "long",                # 101 words -> filtered
        4: "&amp; " + "y " * 24 + "end",       # unicode cleaned, 27 words, kept
        5: "visit https://spam.example now " + "z " * 22 + "fin",  # url stripped, kept
    }
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(texts), pa.int64()), "text": list(texts.values())})
    )
    out = (
        text_curation_survivors(ds, TextCurationConfig(min_words=20, max_words=60))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out.doc_id) == [0, 4, 5]
    assert out[out.doc_id == 4].iloc[0].text.startswith("& y")
    assert "https" not in out[out.doc_id == 5].iloc[0].text
