"""Interleaved family: header dims, validity, aspect filter, sample repair."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.functions.imageinfo import image_dims
from curator_ray.functions.png import encode_png
from curator_ray.stages.interleaved import INTERLEAVED_SCHEMA


def _sample_rows(rows):
    cols = {f.name: [] for f in INTERLEAVED_SCHEMA}
    for sid, pos, mod, text, blob in rows:
        cols["sample_id"].append(sid)
        cols["position"].append(pos)
        cols["modality"].append(mod)
        cols["content_type"].append(None)
        cols["text_content"].append(text)
        cols["binary_content"].append(blob)
        cols["source_ref"].append(None)
        cols["materialize_error"].append(None)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in INTERLEAVED_SCHEMA], schema=INTERLEAVED_SCHEMA
    )


# -------------------------------------------------------------- image_dims


def test_image_dims_png_and_jpeg():
    px = np.zeros((13, 24, 3), dtype=np.uint8)
    assert image_dims(encode_png(px)) == (24, 13)
    from curator_ray.functions.jpeg import encode_jpeg

    assert image_dims(encode_jpeg(px)) == (24, 13)


def test_image_dims_gif_bmp_garbage():
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    assert image_dims(gif) == (320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -48) + b"\x00" * 8
    assert image_dims(bmp) == (64, 48)  # top-down BMP: negative height
    assert image_dims(b"definitely not an image") is None
    assert image_dims(b"") is None


# ----------------------------------------------------------- Ray pipeline


@pytest.mark.usefixtures("ray_session")
def test_aspect_filter_and_repair():
    import ray

    from curator_ray.stages.interleaved import aspect_ratio_filter_stage

    wide = encode_png(np.zeros((10, 30, 3), np.uint8))  # ar 3.0 -> drop
    ok = encode_png(np.zeros((10, 15, 3), np.uint8))  # ar 1.5 -> keep
    rows = _sample_rows(
        [
            ("s1", -1, "metadata", "{}", None),
            ("s1", 0, "text", "hello", None),
            ("s1", 1, "image", None, wide),
            ("s1", 2, "text", "world", None),
            ("s2", -1, "metadata", "{}", None),
            ("s2", 0, "image", None, wide),  # only content row -> orphan meta
            ("s3", 0, "image", None, ok),
            ("s3", 1, "image", None, b"broken bytes"),  # unreadable -> drop
            ("s4", 5, "video", None, None),  # invalid modality row
        ]
    )
    out = aspect_ratio_filter_stage(ray.data.from_arrow(rows)).to_pandas()
    # s1: image dropped, texts re-indexed 0,1; metadata kept at -1
    s1 = out[out.sample_id == "s1"]
    assert list(s1.position) == [-1, 0, 1]
    assert list(s1.modality) == ["metadata", "text", "text"]
    assert list(s1.text_content)[1:] == ["hello", "world"]
    # s2: all content gone -> metadata orphan dropped -> sample disappears
    assert "s2" not in set(out.sample_id)
    # s3: ok image survives at position 0, broken one dropped
    s3 = out[out.sample_id == "s3"]
    assert list(s3.position) == [0]
    # s4: invalid modality dropped entirely
    assert "s4" not in set(out.sample_id)
    # global ordering
    assert list(out.sample_id) == sorted(out.sample_id)


@pytest.mark.usefixtures("ray_session")
def test_text_length_filter():
    import ray

    from curator_ray.stages.interleaved import text_length_filter_stage

    rows = _sample_rows(
        [
            ("a", 0, "text", "", None),
            ("a", 1, "text", "keep me", None),
            ("b", 0, "text", "", None),
        ]
    )
    out = text_length_filter_stage(ray.data.from_arrow(rows)).to_pandas()
    assert list(out.sample_id) == ["a"]
    assert list(out.position) == [0]
    assert list(out.text_content) == ["keep me"]


@pytest.mark.usefixtures("ray_session")
def test_derive_interleaved_roundtrip():
    import ray

    from curator_ray.stages.interleaved import (
        aspect_ratio_filter_stage,
        derive_interleaved_table,
    )

    docs = pa.table({"doc_id": ["d1", "d2"], "text": ["word " * 30, "x" * 7]})
    tbl = derive_interleaved_table(ray.data.from_arrow(docs)).to_pandas()
    assert set(tbl.sample_id) == {"d1", "d2"}
    assert len(tbl) == 8  # 4 rows per sample
    img = tbl[(tbl.sample_id == "d2") & (tbl.modality == "image")].iloc[0]
    L = 7
    assert image_dims(img.binary_content) == (8 + L % 24, 8 + L % 13)
    # the filter output stays schema-stable
    out = aspect_ratio_filter_stage(
        derive_interleaved_table(ray.data.from_arrow(docs))
    ).to_pandas()
    assert set(out.columns) == set(INTERLEAVED_SCHEMA.names)
