"""Overflow of the driver-side duplicated-bucket table degrades, not aborts.

dup_bucket_table raises DupBucketOverflow past its row cap; every broadcast
call site (lsh, exact, substring) must catch it and transparently finish in
sortscan mode with identical results — a long job that CAN complete by
switching modes must never die on a recoverable path.
"""

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.config import FuzzyDedupConfig
from curator_ray.stages.sortagg import DupBucketOverflow, dup_bucket_table


def _edge_set(ds):
    got = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        got.update(zip(t.column("src").to_pylist(), t.column("dst").to_pylist()))
    return got


def _star_oracle(keys, reps):
    groups: dict[int, list[int]] = {}
    for k, r in zip(keys.tolist(), reps.tolist()):
        groups.setdefault(int(k), []).append(int(r))
    out = set()
    for members in groups.values():
        m = min(members)
        out.update((m, r) for r in members if r != m)
    return out


def _reps_ds(ray, seed=0, n=400, nkeys=40):
    rng = np.random.RandomState(seed)
    keys = rng.randint(0, nkeys, n).astype(np.int64)
    reps = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "bucket_hi": pa.array(keys, pa.int64()),
                "bucket_lo": pa.array(np.zeros(n, np.int64), pa.int64()),
                "rep": pa.array(reps, pa.int64()),
            }
        )
    ).repartition(8)
    return ds, keys, reps


def test_dup_bucket_table_overflow_raises(ray_session):
    import ray

    ds, _, _ = _reps_ds(ray)
    with pytest.raises(DupBucketOverflow):
        dup_bucket_table(ds, ["bucket_hi", "bucket_lo"], max_rows=2)


def test_lsh_broadcast_overflow_falls_back(ray_session):
    import ray

    from curator_ray.stages.lsh import _global_star_broadcast

    ds, keys, reps = _reps_ds(ray, seed=1)
    cfg = FuzzyDedupConfig(max_broadcast_buckets=2)
    edges = _global_star_broadcast(ds, cfg)
    assert _edge_set(edges) == _star_oracle(keys, reps)


def test_substring_broadcast_overflow_falls_back(ray_session):
    import ray

    from curator_ray.stages.substring import _global_fp_broadcast

    rng = np.random.RandomState(2)
    fp = rng.randint(0, 30, 300).astype(np.int64)
    rep = rng.permutation(300).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"fp": pa.array(fp, pa.int64()), "rep": pa.array(rep, pa.int64())})
    ).repartition(6)
    edges = _global_fp_broadcast(ds, max_broadcast=2)
    assert _edge_set(edges) == _star_oracle(fp, rep)


def test_exact_broadcast_overflow_falls_back(ray_session):
    import ray

    from curator_ray.stages.exact import exact_duplicate_ids

    rng = np.random.RandomState(3)
    texts = [f"caption {i % 25}" for i in range(200)]
    ids = rng.permutation(200).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"caption": pa.array(texts), "_id": pa.array(ids, pa.int64())})
    ).repartition(4)
    want = exact_duplicate_ids(ds, global_mode="sortscan").to_pandas()["_id"].tolist()
    got = exact_duplicate_ids(ds, global_mode="broadcast", max_broadcast=2).to_pandas()[
        "_id"
    ].tolist()
    assert got == want and len(got) == 175


def test_star_spill_plasma_parity(ray_session, monkeypatch):
    import ray

    from curator_ray.stages.sortagg import global_star_sorted

    ds, keys, reps = _reps_ds(ray, seed=4, n=600, nkeys=80)
    monkeypatch.setenv("CURATOR_RAY_STAR_SPILL", "0")
    plasma = _edge_set(global_star_sorted(ds, ["bucket_hi", "bucket_lo"], rep_col="rep"))
    monkeypatch.setenv("CURATOR_RAY_STAR_SPILL", "1")
    spilled = _edge_set(global_star_sorted(ds, ["bucket_hi", "bucket_lo"], rep_col="rep"))
    assert plasma == spilled == _star_oracle(keys, reps)
