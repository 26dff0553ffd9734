"""Dup-pair recall vs known cluster structure (north-rule criterion proxy).

The reference's GPU stack can't run in this sandbox; the authoritative
conformance anchor is its own golden test corpus (exercised in
test_fuzzy_golden.py). This file adds the quantitative pair-recall check on a
larger synthetic corpus whose true duplicate clusters are known by
construction (roles 7/8 per decade share the anchor's caption exactly; role 8
additionally sits within pHash Hamming 4)."""

import numpy as np
import pytest
import ray.data

from curator_ray.config import FuzzyDedupConfig, SimHashConfig
from curator_ray.functions.metrics import cluster_pairs, labels_to_clusters, pair_recall_precision
from curator_ray.pipelines.fuzzy import fuzzy_candidate_edges
from curator_ray.stages.cc import connected_components
from curator_ray.stages.ids import with_ids
from curator_ray.stages.simhash import simhash_candidate_edges
from curator_ray.sources.synth import write_synth_dataset


def test_pair_metrics_unit():
    exp = [{1, 2, 3}, {4, 5}]
    got = [{1, 2}, {4, 5}]
    r, p = pair_recall_precision(exp, got)
    assert r == pytest.approx(2 / 4)
    assert p == 1.0
    assert cluster_pairs([{3, 1, 2}]) == {(1, 2), (1, 3), (2, 3)}


def test_fuzzy_plus_simhash_recall(ray_session, tmp_path):
    n = 500
    path = write_synth_dataset(str(tmp_path / "s"), n_rows=n, rows_per_file=100)
    ds = with_ids(
        ray.data.read_parquet(path, columns=["image_id", "caption", "phash"]), key_field="image_id"
    ).materialize()

    id_of = {r["image_id"]: r["_id"] for r in ds.take_all()}
    # ground truth: every decade's anchor + roles 7, 8 form one cluster
    expected = []
    for dec in range(0, n, 10):
        expected.append(
            {id_of[f"img_{i:09d}"] for i in (dec, dec + 7, dec + 8)}
        )

    edges = fuzzy_candidate_edges(ds, FuzzyDedupConfig(char_ngrams=12)).union(
        simhash_candidate_edges(ds, SimHashConfig())
    )
    labels = connected_components(edges, FuzzyDedupConfig())
    got = labels_to_clusters({r["v"]: r["group"] for r in labels.take_all()})
    recall, _precision = pair_recall_precision(expected, got)
    assert recall >= 0.99
