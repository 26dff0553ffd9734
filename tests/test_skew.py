"""Hot-key skew stress: the north rule mandates explicit handling of skewed
band keys. This engine bounds them structurally — the per-batch combiner sends
at most ONE representative row per (bucket, block) into any wide operation, so
a bucket holding 50k copies of one caption contributes <= num_blocks rows to
the shuffle instead of 50k x num_bands."""

import time

import numpy as np
import pyarrow as pa
import ray.data

from curator_ray.config import FuzzyDedupConfig
from curator_ray.pipelines.fuzzy import fuzzy_duplicate_ids
from curator_ray.stages.exact import exact_duplicate_ids
from curator_ray.stages.lsh import _local_bands_batch
from curator_ray.stages.minhash import minhash_stage


def _hot_corpus(n_hot=50_000, n_cold=10_000, blocks=20):
    """One caption repeated n_hot times + n_cold unique captions."""
    rng = np.random.RandomState(0)
    # cold captions must be pairwise dissimilar: random hex word soup, no
    # shared template (a shared template IS a real near-duplicate at k=12)
    caps = ["the exact same hot caption repeated everywhere"] * n_hot + [
        " ".join(format(x, "x") for x in rng.randint(0, 2**60, 8)) for _ in range(n_cold)
    ]
    ids = np.arange(len(caps), dtype=np.int64)
    perm = rng.permutation(len(caps))
    caps = [caps[i] for i in perm]
    ids = ids[perm]
    tables = []
    per = len(caps) // blocks + 1
    for s in range(0, len(caps), per):
        tables.append(
            pa.table({"_id": pa.array(ids[s : s + per], pa.int64()), "caption": pa.array(caps[s : s + per])})
        )
    return tables


def test_hot_bucket_rep_bound(ray_session):
    # the combiner invariant directly: one rep row per (bucket, batch)
    cfg = FuzzyDedupConfig(char_ngrams=12, num_bands=4, minhashes_per_band=4)
    tbl = pa.table(
        {"_id": pa.array(np.arange(10_000, dtype=np.int64)), "caption": pa.array(["same hot caption"] * 10_000)}
    )
    sig = minhash_stage(ray.data.from_arrow(tbl), cfg).take_batch(10_000, batch_format="pyarrow")
    reps = _local_bands_batch(sig, cfg=cfg, band_range=range(4), emit="reps")
    # 10k identical rows in one batch -> exactly one rep per band
    assert reps.num_rows == 4
    assert reps.column("cnt").to_pylist() == [10_000] * 4


def test_hot_key_dedup_correct_and_bounded(ray_session):
    tables = _hot_corpus(n_hot=50_000, n_cold=10_000)
    ds = ray.data.from_arrow(tables).materialize()
    t0 = time.time()
    removal_ds = exact_duplicate_ids(ds)
    removed = removal_ds.count()
    exact_secs = time.time() - t0
    assert removed == 50_000 - 1

    cfg = FuzzyDedupConfig(char_ngrams=12)
    t0 = time.time()
    removal, _ = fuzzy_duplicate_ids(ds, cfg)
    n = removal.count()
    fuzzy_secs = time.time() - t0
    # all 50k hot rows form one cluster; cold rows are unique
    assert n == 50_000 - 1
    # sanity wall-time bound: the hot key must not serialize the job
    assert exact_secs < 60 and fuzzy_secs < 120, (exact_secs, fuzzy_secs)
