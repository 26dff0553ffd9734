"""Flagship workflow end-to-end + resume (F9) + invariants (F8)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from curator_ray.config import FuzzyDedupConfig
from curator_ray.functions.png import decode_png
from curator_ray.pipelines.image_dedup import image_dedup_workflow
from curator_ray.sources.synth import write_synth_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return write_synth_dataset(str(d), n_rows=300, rows_per_file=100)


def _run(synth_dir, out):
    return image_dedup_workflow(
        synth_dir,
        str(out),
        fuzzy=FuzzyDedupConfig(char_ngrams=12),
        use_substring=False,
    )


def test_workflow_end_to_end(ray_session, synth_dir, tmp_path):
    counters = _run(synth_dir, tmp_path / "out")
    # every decade contributes a cluster {0,7,8} at minimum (exact caption
    # dup + near-dup image); 30 decades -> >= 60 duplicates
    assert counters["num_duplicates"] >= 60
    assert counters["num_duplicates"] <= 120
    assert counters["survivors"] == 300 - counters["num_duplicates"]

    # invariants: survivors carry byte-identical payloads and captions
    surv = ray.data.read_parquet(str(tmp_path / "out" / "survivors")).take_all()
    orig = {
        r["image_id"]: r
        for r in ray.data.read_parquet(synth_dir).take_all()
    }
    assert len(surv) == counters["survivors"]
    for r in surv[:50]:
        o = orig[r["image_id"]]
        assert r["caption"] == o["caption"]
        assert r["bytes"] == o["bytes"]
        np.testing.assert_array_equal(decode_png(r["bytes"]), decode_png(o["bytes"]))

    # exactly one survivor per duplicate cluster: anchors (role 0) survive
    # their decade unless merged across decades; check no decade lost both
    # its anchor-copy pair entirely
    surv_ids = {r["image_id"] for r in surv}
    for dec in range(0, 300, 10):
        decade = {f"img_{i:09d}" for i in range(dec, dec + 10)}
        assert decade & surv_ids


def test_workflow_resume_skips_completed(ray_session, synth_dir, tmp_path):
    out = tmp_path / "out_resume"
    c1 = _run(synth_dir, out)
    # re-run: all stages complete -> identical counters, no recompute errors
    c2 = _run(synth_dir, out)
    assert c1["num_duplicates"] == c2["num_duplicates"]
    manifest_files = list((out / "_checkpoints").glob("*.json"))
    assert len(manifest_files) >= 4  # minhash, lsh, simhash, removal, survivors


def test_workflow_resume_mid_stage(ray_session, synth_dir, tmp_path):
    out = tmp_path / "out_mid"
    c1 = _run(synth_dir, out)
    # simulate a crash after the edge stages: delete only downstream manifests
    for f in (out / "_checkpoints").glob("removal_ids.*.json"):
        f.unlink()
    for f in (out / "_checkpoints").glob("survivors.*.json"):
        f.unlink()
    c2 = _run(synth_dir, out)
    assert c2["num_duplicates"] == c1["num_duplicates"]
    assert c2["survivors"] == c1["survivors"]
