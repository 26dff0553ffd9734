"""Image stage tests: decode/resize/embed/score/removal (F8)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from curator_ray.functions.png import decode_png
from curator_ray.sources.synth import generate_rows
from curator_ray.stages.image import (
    FakeClipEmbedder,
    aesthetic_filter_stage,
    decode_image,
    decode_stage,
    embed_stage,
    image_removal_stage,
    resize_stage,
)


@pytest.fixture(scope="module")
def img_ds_table():
    return generate_rows(np.arange(0, 40))


def test_decode_stage(ray_session, img_ds_table):
    ds = ray.data.from_arrow(img_ds_table)
    out = decode_stage(ds, verify_phash=True).take_all()
    assert len(out) == 40
    for r in out[:5]:
        assert len(r["pixels"]) == 32 * 32 * 3
        assert r["phash_recomputed"] == r["phash"]


def test_jpeg_decode_real():
    # JPEG decode is real now (functions/jpeg.py): round-trip through the stage API
    from curator_ray.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    px = decode_image(encode_jpeg(img, quality=95), "jpeg")
    assert px.shape == (24, 24, 3)
    # truncated/garbage stream still raises cleanly
    with pytest.raises(Exception):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_resize_stage(ray_session, img_ds_table):
    ds = ray.data.from_arrow(img_ds_table)
    out = resize_stage(ds, 16, 16).take_all()
    for r in out[:5]:
        px = decode_png(r["bytes"])
        assert px.shape == (16, 16, 3)
        assert r["w"] == 16 and r["h"] == 16


def test_embed_stage_deterministic(ray_session, img_ds_table):
    ds = ray.data.from_arrow(img_ds_table)
    out = {r["image_id"]: r["embedding"] for r in embed_stage(ds, dim=32).take_all()}
    out2 = {r["image_id"]: r["embedding"] for r in embed_stage(ds, dim=32).take_all()}
    for k in out:
        np.testing.assert_array_equal(out[k], out2[k])
    # exact-dup image (role 7) has identical embedding to anchor
    np.testing.assert_allclose(out["img_000000007"], out["img_000000000"], rtol=1e-6)
    # embeddings are unit-normalized
    assert abs(np.linalg.norm(out["img_000000000"]) - 1.0) < 1e-5


def test_aesthetic_filter(ray_session, img_ds_table):
    ds = embed_stage(ray.data.from_arrow(img_ds_table), dim=64).materialize()
    kept = aesthetic_filter_stage(ds, threshold=5.0).take_all()
    assert 0 < len(kept) <= 40
    for r in kept[:5]:
        assert r["aesthetic_score"] >= 5.0


def test_image_removal_stage(ray_session, img_ds_table, tmp_path):
    # F8: multiple removal parquet files, string image ids
    d = tmp_path / "removal"
    d.mkdir()
    pq.write_table(pa.table({"id": pa.array(["img_000000003", "img_000000007"])}), d / "a.parquet")
    pq.write_table(pa.table({"id": pa.array(["img_000000011"])}), d / "b.parquet")
    ds = ray.data.from_arrow(img_ds_table)
    out = image_removal_stage(ds, str(d)).take_all()
    ids = {r["image_id"] for r in out}
    assert len(out) == 37
    assert not {"img_000000003", "img_000000007", "img_000000011"} & ids

    with pytest.raises(FileNotFoundError):
        image_removal_stage(ds, str(tmp_path / "empty_dir_missing"))


def test_embedding_feeds_semantic_dedup(ray_session, img_ds_table):
    # image pipeline composition: embed -> semantic dedup finds exact-dup images
    from curator_ray.config import SemanticDedupConfig
    from curator_ray.stages.ids import with_ids
    from curator_ray.stages.semantic import semantic_duplicate_ids

    ds = with_ids(ray.data.from_arrow(img_ds_table), key_field="image_id")
    emb = embed_stage(ds, dim=64).select_columns(["_id", "embedding"]).materialize()
    removal, _ = semantic_duplicate_ids(emb, SemanticDedupConfig(n_clusters=4, eps=1e-6))
    # roles 7 (exact) and 8 (brightness+2) collapse onto their anchors
    assert removal.count() >= 4
