"""Fuzzy-dedup conformance on the reference's golden corpus.

Ports the end-to-end expectations of
``tests/stages/deduplication/fuzzy/test_fuzzy_workflow.py:74-267``:
5 docs (ids [1, 2, 300, 4, -1]) with seed=42, char_ngrams=5,
minhashes_per_band=1, num_bands in {5, 10} -> duplicate clusters exactly
[[4, -1], [1, 2, 300]]; exactly one survivor per cluster;
num_duplicates == |removal_ids|; a no-duplicate corpus yields zero output.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from curator_ray.config import FuzzyDedupConfig
from curator_ray.pipelines.fuzzy import fuzzy_duplicate_ids
from curator_ray.stages.cc import connected_components, removal_ids

DOC_IDS = [1, 2, 300, 4, -1]
TEXTS = [
    "A test string",
    "A different test string",
    "A different object",
    "The quick brown fox jumps over the lazy dog",
    "The quick black cat jumps over the lazy dog",
]


def _dataset():
    return ray.data.from_arrow(
        pa.table({"_id": pa.array(DOC_IDS, pa.int64()), "caption": pa.array(TEXTS)})
    )


@pytest.mark.parametrize("num_bands", [5, 10])
@pytest.mark.parametrize("use_64bit", [False, True])
def test_fuzzy_golden_clusters(ray_session, num_bands, use_64bit):
    cfg = FuzzyDedupConfig(
        seed=42, char_ngrams=5, num_bands=num_bands, minhashes_per_band=1, use_64bit_hash=use_64bit
    )
    removal, labels = fuzzy_duplicate_ids(_dataset(), cfg)
    lab = {r["v"]: r["group"] for r in labels.take_all()}
    clusters = {}
    for v, g in lab.items():
        clusters.setdefault(g, set()).add(v)
    assert sorted(map(sorted, clusters.values())) == [[-1, 4], [1, 2, 300]]
    removed = [r["_id"] for r in removal.take_all()]
    # exactly one survivor per cluster
    assert len(removed) == 5 - 2
    assert removed == sorted(removed)
    for members in clusters.values():
        assert len(members - set(removed)) == 1


def test_fuzzy_no_duplicates(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "_id": pa.array([1, 2, 3, 4], pa.int64()),
                "caption": pa.array(
                    [
                        "A test string",
                        "Very different thing",
                        "Something completely else that doesn't match",
                        "The quick black cat jumps over the lazy dog",
                    ]
                ),
            }
        )
    )
    cfg = FuzzyDedupConfig(seed=42, char_ngrams=5, num_bands=10, minhashes_per_band=1)
    removal, labels = fuzzy_duplicate_ids(ds, cfg)
    assert labels is None
    assert removal.count() == 0


def test_fuzzy_distributed_cc_matches_driver(ray_session):
    # force the distributed HashMin path and compare against the driver path
    base = FuzzyDedupConfig(seed=42, char_ngrams=5, num_bands=10, minhashes_per_band=1)
    dist = FuzzyDedupConfig(
        seed=42,
        char_ngrams=5,
        num_bands=10,
        minhashes_per_band=1,
        cc_driver_fallback_edges=0,
        cc_num_partitions=4,
    )
    _, labels_a = fuzzy_duplicate_ids(_dataset(), base)
    _, labels_b = fuzzy_duplicate_ids(_dataset(), dist)
    a = {r["v"]: r["group"] for r in labels_a.take_all()}
    b = {r["v"]: r["group"] for r in labels_b.take_all()}
    assert a == b


def test_fuzzy_with_cache_dir(ray_session, tmp_path):
    cfg = FuzzyDedupConfig(seed=42, char_ngrams=5, num_bands=10, minhashes_per_band=1)
    removal, labels = fuzzy_duplicate_ids(_dataset(), cfg, cache_dir=str(tmp_path))
    assert removal.count() == 3
    assert (tmp_path / "minhash").exists()


def test_fuzzy_cache_resume_with_fingerprint(ray_session, tmp_path):
    cfg = FuzzyDedupConfig(seed=42, char_ngrams=5, num_bands=10, minhashes_per_band=1)
    removal, _ = fuzzy_duplicate_ids(
        _dataset(), cfg, cache_dir=str(tmp_path), input_fingerprint="corpus-v1"
    )
    assert removal.count() == 3

    # same fingerprint: the cached signature parquet must be reused, not
    # rewritten (the lazy minhash Dataset is built but never executed);
    # evidence is the manifest short-circuit leaving every file untouched
    import os

    sig_dir = tmp_path / "minhash"
    mtimes = {f: os.path.getmtime(sig_dir / f) for f in os.listdir(sig_dir)}
    removal3, _ = fuzzy_duplicate_ids(
        _dataset(), cfg, cache_dir=str(tmp_path), input_fingerprint="corpus-v1"
    )
    assert removal3.count() == 3
    assert {f: os.path.getmtime(sig_dir / f) for f in os.listdir(sig_dir)} == mtimes

    # different fingerprint: cache must be rebuilt, not silently reused
    removal4, _ = fuzzy_duplicate_ids(
        _dataset(), cfg, cache_dir=str(tmp_path), input_fingerprint="corpus-v2"
    )
    assert removal4.count() == 3
    assert {f: os.path.getmtime(sig_dir / f) for f in os.listdir(sig_dir)} != mtimes
