"""WebDataset tar IO round trip + NSFW filter stage."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pytest


def test_webdataset_round_trip(ray_session, tmp_path):
    import ray

    from curator_ray.sources.synth import write_synth_dataset
    from curator_ray.sources.tar import read_webdataset, write_webdataset

    src = str(tmp_path / "src")
    write_synth_dataset(src, n_rows=60, rows_per_file=30)
    out = str(tmp_path / "wds")
    ds = ray.data.read_parquet(src)
    manifest = write_webdataset(ds, out, images_per_tar=16).take_all()
    assert sum(r["n_images"] for r in manifest) == 60
    tars = sorted(glob.glob(os.path.join(out, "*.tar")))
    assert tars and all(os.path.exists(t[:-4] + ".parquet") for t in tars)
    # every shard respects the member cap
    assert all(r["n_images"] <= 16 for r in manifest)

    back = read_webdataset(out).take_all()
    assert len(back) == 60
    orig = {r["image_id"]: r for r in ray.data.read_parquet(src).take_all()}
    for r in back:
        o = orig[r["image_id"]]
        assert r["bytes"] == o["bytes"]  # byte-identical pixels (PSNR = inf)
        assert r["caption"] == o["caption"]
        assert r["fmt"] == o["fmt"]
        assert r["phash"] == o["phash"]  # sidecar metadata recovered
        assert r["w"] == o["w"] and r["h"] == o["h"]


def test_webdataset_deterministic_names(ray_session, tmp_path):
    import ray

    from curator_ray.sources.synth import write_synth_dataset
    from curator_ray.sources.tar import write_webdataset

    src = str(tmp_path / "src")
    write_synth_dataset(src, n_rows=20, rows_per_file=20)
    names = []
    for run in range(2):
        out = str(tmp_path / f"wds{run}")
        write_webdataset(ray.data.read_parquet(src), out, images_per_tar=8).take_all()
        names.append(sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "*.tar"))))
    assert names[0] == names[1]  # sha256-of-members shard names


def test_read_webdataset_missing_dir(ray_session, tmp_path):
    from curator_ray.sources.tar import read_webdataset

    with pytest.raises(FileNotFoundError):
        read_webdataset(str(tmp_path / "nope"))


def test_nsfw_filter_stage(ray_session):
    import numpy as np
    import ray

    from curator_ray.stages.image import FakeNsfwScorer, nsfw_filter_stage

    rng = np.random.RandomState(0)
    emb = rng.normal(size=(50, 64)).astype(np.float32)
    flat = pa.array(emb.ravel(), pa.float32())
    tbl = pa.table(
        {
            "image_id": pa.array([f"i{i}" for i in range(50)], pa.string()),
            "embedding": pa.FixedSizeListArray.from_arrays(flat, 64),
        }
    )
    scored = FakeNsfwScorer()(tbl)
    scores = scored.column("nsfw_score").to_numpy()
    assert ((scores >= 0) & (scores <= 1)).all()
    kept = nsfw_filter_stage(ray.data.from_arrow(tbl), threshold=0.5).take_all()
    assert len(kept) == int((scores < 0.5).sum())
    assert all(r["nsfw_score"] < 0.5 for r in kept)


def test_flagship_webdataset_survivors(ray_session, tmp_path):
    from curator_ray.sources.synth import write_synth_dataset
    from curator_ray.pipelines.image_dedup import image_dedup_workflow
    from curator_ray.sources.tar import read_webdataset

    src = str(tmp_path / "src")
    write_synth_dataset(src, n_rows=60, rows_per_file=30)
    out = str(tmp_path / "out")
    counters = image_dedup_workflow(
        src, out, use_substring=False, checkpoint=False, survivors_format="webdataset"
    )
    back = read_webdataset(os.path.join(out, "survivors")).take_all()
    assert len(back) == counters["survivors"] > 0
    assert counters["survivors"] + counters["num_duplicates"] == 60


def test_webdataset_captionless_schema(ray_session, tmp_path):
    """Shards without .txt members must still emit a caption column (null)
    so all blocks of one Dataset share a schema."""
    import ray

    from curator_ray.sources.tar import read_webdataset, write_webdataset

    tbl = pa.table(
        {
            "image_id": pa.array([f"i{k}" for k in range(4)], pa.string()),
            "bytes": pa.array([b"\x00" * 8] * 4, pa.binary()),
            "fmt": pa.array(["png"] * 4, pa.string()),
            "caption": pa.array(["has caption", "also has", None, None], pa.string()),
        }
    )
    out = str(tmp_path / "wds_mixed")
    # 2 images per tar -> one shard with .txt members, one without
    write_webdataset(ray.data.from_arrow(tbl), out, images_per_tar=2).take_all()
    back = read_webdataset(out)
    rows = {r["image_id"]: r for r in back.take_all()}
    assert len(rows) == 4 and "caption" in back.schema().names
    assert rows["i0"]["caption"] == "has caption"
    assert rows["i3"]["caption"] is None
