"""Streaming (checkpoint=False) workflow parity with the checkpointed path."""

import pytest

from curator_ray.config import FuzzyDedupConfig
from curator_ray.pipelines.image_dedup import image_dedup_workflow
from curator_ray.sources.synth import write_synth_dataset


def test_streaming_matches_checkpointed(ray_session, tmp_path):
    src = write_synth_dataset(str(tmp_path / "synth"), n_rows=200, rows_per_file=100)
    fuzzy = FuzzyDedupConfig(char_ngrams=12)
    c_ck = image_dedup_workflow(
        src, str(tmp_path / "ck"), fuzzy=fuzzy, use_substring=False, checkpoint=True
    )
    c_st = image_dedup_workflow(
        src, str(tmp_path / "st"), fuzzy=fuzzy, use_substring=False, checkpoint=False
    )
    assert c_st["num_duplicates"] == c_ck["num_duplicates"]
    assert c_st["survivors"] == c_ck["survivors"]
    # streaming path must not leave checkpoint or cache artifacts
    assert not (tmp_path / "st" / "_checkpoints").exists()
    assert not (tmp_path / "st" / "_cache").exists()


def test_lazy_sigs_matches_materialized(ray_session, tmp_path):
    """sigs_materialize=False (zero plasma-resident signature copy, for
    corpora whose projection outgrows aggregate plasma) must be a pure
    execution-strategy change: identical duplicates and survivors."""
    src = write_synth_dataset(str(tmp_path / "synth"), n_rows=200, rows_per_file=100)
    fuzzy = FuzzyDedupConfig(char_ngrams=12)
    c_mat = image_dedup_workflow(
        src, str(tmp_path / "mat"), fuzzy=fuzzy, use_substring=False, checkpoint=False
    )
    c_lazy = image_dedup_workflow(
        src,
        str(tmp_path / "lazy"),
        fuzzy=fuzzy,
        use_substring=False,
        checkpoint=False,
        sigs_materialize=False,
    )
    assert c_lazy["num_duplicates"] == c_mat["num_duplicates"]
    assert c_lazy["survivors"] == c_mat["survivors"]
