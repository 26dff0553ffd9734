"""Sorted star-scan global bucket resolution (sortagg.global_star_sorted).

Parity target: the broadcast path (dup_bucket_table + lookup emission) it
replaces as the default — identical (src=global-min rep, dst=other rep) edge
sets for every key, with no driver-side duplicated-key table.
"""

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.stages.sortagg import (
    _merge_star_boundary,
    _scan_star_block,
    global_star_sorted,
)


def _star_oracle(keys: np.ndarray, reps: np.ndarray) -> set[tuple[int, int]]:
    """All (min rep, other rep) pairs per key, from a plain dict."""
    groups: dict[int, list[int]] = {}
    for k, r in zip(keys.tolist(), reps.tolist()):
        groups.setdefault(k, []).append(r)
    out = set()
    for members in groups.values():
        m = min(members)
        out.update((m, r) for r in members if r != m)
    return out


def test_scan_star_block_interior_and_boundary():
    # sorted keys: boundary runs (first/last) pass through, interior emit
    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2, 3, 4, 4], pa.int64()),
            "rep": pa.array([10, 11, 22, 20, 21, 30, 41, 40], pa.int64()),
        }
    )
    out = _scan_star_block(t, key_cols=["k"], rep_col="rep")
    edges = out.filter(pa.compute.is_valid(out.column("src")))
    got = set(zip(edges.column("src").to_pylist(), edges.column("dst").to_pylist()))
    # interior runs: k=2 -> (20,22),(20,21); k=3 singleton -> nothing
    assert got == {(20, 22), (20, 21)}
    passthrough = out.filter(pa.compute.is_valid(out.column("k")))
    assert sorted(passthrough.column("k").to_pylist()) == [1, 1, 4, 4]


def test_merge_star_boundary_cross_block():
    # keys split across blocks, with rep values INTERLEAVED across keys: a
    # merge that groups by anything but the key columns (e.g. a lexsort with
    # rep as the primary key) fragments the runs and emits nothing
    bt = pa.table(
        {
            "k": pa.array([7, 9, 7, 9, 7], pa.int64()),
            "rep": pa.array([72, 60, 70, 95, 71], pa.int64()),
        }
    )
    out = _merge_star_boundary(bt, ["k"], "rep")
    got = set(zip(out.column("src").to_pylist(), out.column("dst").to_pylist()))
    assert got == {(70, 72), (70, 71), (60, 95)}


def test_empty_inputs():
    empty = pa.table({"k": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())})
    out = _scan_star_block(empty, key_cols=["k"], rep_col="rep")
    assert out.num_rows == 0
    assert _merge_star_boundary(empty, ["k"], "rep").num_rows == 0


@pytest.mark.parametrize("n,nkeys,seed", [(2_000, 300, 0), (5_000, 50, 1), (1_000, 1_000, 2)])
def test_global_star_sorted_matches_oracle(ray_session, n, nkeys, seed):
    import ray

    rng = np.random.RandomState(seed)
    keys = rng.randint(0, nkeys, n).astype(np.int64)
    reps = rng.permutation(n).astype(np.int64)  # unique reps
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "rep": pa.array(reps, pa.int64())})
    ).repartition(8)
    edges = global_star_sorted(ds, ["k"], rep_col="rep")
    got = set()
    for b in edges.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        got.update(zip(t.column("src").to_pylist(), t.column("dst").to_pylist()))
    assert got == _star_oracle(keys, reps)


def test_two_key_columns(ray_session):
    import ray

    rng = np.random.RandomState(3)
    hi = rng.randint(0, 20, 500).astype(np.int64)
    lo = rng.randint(0, 5, 500).astype(np.int64)
    reps = rng.permutation(500).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "hi": pa.array(hi, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "rep": pa.array(reps, pa.int64()),
            }
        )
    ).repartition(4)
    edges = global_star_sorted(ds, ["hi", "lo"], rep_col="rep")
    got = set()
    for b in edges.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        got.update(zip(t.column("src").to_pylist(), t.column("dst").to_pylist()))
    packed = hi * 1000 + lo
    assert got == _star_oracle(packed, reps)
