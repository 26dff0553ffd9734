"""Unit conformance: exact dedup (F4), LSH candidate buckets (F3),
union-find vs brute-force oracle, removal anti-join (F8)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from curator_ray.config import FuzzyDedupConfig
from curator_ray.stages.cc import connected_components, removal_ids, union_find_numpy
from curator_ray.stages.exact import exact_duplicate_ids
from curator_ray.stages.lsh import buckets_to_edges, lsh_candidate_edges
from curator_ray.stages.removal import remove_by_ids, remove_by_ids_join


def test_exact_dedup_golden(ray_session):
    # F4: reference tests/stages/deduplication/exact/test_workflow.py:68-118
    ds = ray.data.from_arrow(
        pa.table(
            {
                "_id": pa.array([1, 2, 300, 4, -1], pa.int64()),
                "caption": pa.array(
                    ["Small String", "Large String", "Medium String", "Large String", "Small String"]
                ),
            }
        )
    )
    removed = [r["_id"] for r in exact_duplicate_ids(ds).take_all()]
    # groups {1,-1} and {2,4}: keep min of each -> remove {1, 4}
    assert removed == [1, 4]


def test_exact_dedup_no_dups(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"_id": pa.array([1, 2, 3], pa.int64()), "caption": pa.array(["abc", "aba", "abb"])})
    )
    assert exact_duplicate_ids(ds).count() == 0


def test_exact_dedup_cross_block(ray_session):
    # duplicates split across blocks exercise the combiner + global groupby
    t1 = pa.table({"_id": pa.array([10, 11], pa.int64()), "caption": pa.array(["xx", "yy"])})
    t2 = pa.table({"_id": pa.array([20, 21], pa.int64()), "caption": pa.array(["xx", "zz"])})
    ds = ray.data.from_arrow([t1, t2])
    removed = [r["_id"] for r in exact_duplicate_ids(ds).take_all()]
    assert removed == [20]


def test_lsh_golden_candidates(ray_session):
    # F3: reference tests/stages/deduplication/fuzzy/test_lsh_stage.py:40-120
    sigs = [
        [1, 2, 1, 2, 1, 2],
        [1, 2, 3, 4, 5, 6],
        [3, 2, 1, 4, 5, 6],
        [9, 8, 7, 6, 5, 4],
        [3, 1, 2, 4, 5, 4],
    ]
    flat = pa.array(np.array(sigs, dtype=np.uint32).ravel(), pa.uint32())
    tbl = pa.table(
        {
            "_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "_minhash_signature": pa.FixedSizeListArray.from_arrays(flat, 6),
        }
    )
    cfg = FuzzyDedupConfig(num_bands=3, minhashes_per_band=2)
    for bpi in (2, 3):
        c = FuzzyDedupConfig(num_bands=3, minhashes_per_band=2, bands_per_iteration=bpi)
        edges = lsh_candidate_edges(ray.data.from_arrow(tbl), c)
        labels = connected_components(edges, cfg)
        lab = {r["v"]: r["group"] for r in labels.take_all()}
        clusters = {}
        for v, g in lab.items():
            clusters.setdefault(g, set()).add(v)
        got = sorted(tuple(sorted(m)) for m in clusters.values())
        # expected candidate groups {(1,2),(2,3),(4,5)} -> CC merges 1,2,3
        assert got == [(1, 2, 3), (4, 5)]


def test_buckets_to_edges_parity():
    # reference fuzzy/buckets_to_edges.py:75-81 pairwise-chain semantics
    assert buckets_to_edges([3, 1, 2]) == [(1, 2), (2, 3)]
    assert buckets_to_edges([7]) == []
    assert buckets_to_edges([3, 1, 2], mode="star") == [(1, 2), (1, 3)]


def _brute_components(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, comps = set(), []
    for start in adj:
        if start in seen:
            continue
        stack, comp = [start], set()
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        seen |= comp
        comps.append(frozenset(comp))
    return {v: min(c) for c in comps for v in c}


def test_union_find_vs_oracle():
    rng = np.random.RandomState(0)
    edges = [(int(rng.randint(0, 60)), int(rng.randint(0, 60))) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    src = np.array([a for a, _ in edges], np.int64)
    dst = np.array([b for _, b in edges], np.int64)
    verts, labels = union_find_numpy(src, dst)
    oracle = _brute_components(edges)
    got = dict(zip(verts.tolist(), labels.tolist()))
    assert got == oracle


def test_distributed_cc_vs_oracle(ray_session):
    rng = np.random.RandomState(1)
    edges = [(int(rng.randint(0, 80)), int(rng.randint(0, 80))) for _ in range(100)]
    edges = [(a, b) for a, b in edges if a != b]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    cfg = FuzzyDedupConfig(cc_driver_fallback_edges=0, cc_num_partitions=4, cc_max_iterations=50)
    labels = connected_components(ray.data.from_arrow(tbl), cfg)
    got = {r["v"]: r["group"] for r in labels.take_all()}
    assert got == _brute_components(edges)


def test_removal_broadcast_and_join(ray_session):
    tbl = pa.table({"_id": pa.array(list(range(20)), pa.int64()), "x": pa.array([f"r{i}" for i in range(20)])})
    ds = ray.data.from_arrow(tbl)
    rm = ray.data.from_arrow(pa.table({"_id": pa.array([3, 7, 19], pa.int64())}))
    out = remove_by_ids(ds, rm)
    kept = sorted(r["_id"] for r in out.take_all())
    assert kept == [i for i in range(20) if i not in (3, 7, 19)]

    out2 = remove_by_ids_join(ds, rm, num_partitions=4)
    kept2 = sorted(r["_id"] for r in out2.take_all())
    assert kept2 == kept


def test_distributed_cc_boundary_runs(ray_session):
    # many blocks force vertex runs to split across sorted-block boundaries
    rng = np.random.RandomState(7)
    edges = [(int(rng.randint(0, 500)), int(rng.randint(0, 500))) for _ in range(3000)]
    edges = [(a, b) for a, b in edges if a != b]
    tables = []
    for s in range(0, len(edges), 150):
        chunk = edges[s : s + 150]
        tables.append(
            pa.table(
                {
                    "src": pa.array([a for a, _ in chunk], pa.int64()),
                    "dst": pa.array([b for _, b in chunk], pa.int64()),
                }
            )
        )
    cfg = FuzzyDedupConfig(cc_driver_fallback_edges=0, cc_num_partitions=8, cc_max_iterations=60)
    labels = connected_components(ray.data.from_arrow(tables), cfg)
    got = {r["v"]: r["group"] for r in labels.take_all()}
    assert got == _brute_components(edges)


def test_removal_broadcast_vs_join_equivalence(ray_session):
    """remove_by_ids (broadcast) and remove_by_ids_join (distributed hash
    anti-join) must keep identical survivors — the flagship auto-switches
    between them on removal-list size (pipelines/image_dedup._remove)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from curator_ray.stages.removal import remove_by_ids, remove_by_ids_join

    rng = np.random.RandomState(3)
    ids = rng.permutation(5000).astype(np.int64)
    corpus = pa.table({"_id": pa.array(ids, pa.int64()), "payload": pa.array(ids * 7, pa.int64())})
    removal_ids = np.sort(rng.choice(5000, size=1200, replace=False)).astype(np.int64)
    removal_tbl = pa.table({"_id": pa.array(removal_ids, pa.int64())})

    surv_b = remove_by_ids(ray.data.from_arrow(corpus), ray.data.from_arrow(removal_tbl)).take_all()
    surv_j = remove_by_ids_join(
        ray.data.from_arrow(corpus), ray.data.from_arrow(removal_tbl), num_partitions=8
    ).take_all()
    key = lambda r: r["_id"]
    sb = sorted(((r["_id"], r["payload"]) for r in surv_b))
    sj = sorted(((r["_id"], r["payload"]) for r in surv_j))
    assert sb == sj
    assert len(sb) == 5000 - 1200
    assert not (set(removal_ids) & {i for i, _ in sb})


def test_distributed_cc_nonconvergence_warns(ray_session, caplog):
    """A chain graph needs ~diameter rounds; with cc_max_iterations=1 the
    distributed path must warn about possible under-removal instead of
    silently returning non-minimal labels (ADVICE r1)."""
    import logging

    import pyarrow as pa
    import ray.data

    from curator_ray.config import FuzzyDedupConfig
    from curator_ray.stages.cc import connected_components

    n = 64
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(list(range(n - 1)), pa.int64()),
                  "dst": pa.array(list(range(1, n)), pa.int64())})
    )
    cfg = FuzzyDedupConfig(cc_driver_fallback_edges=0, cc_num_partitions=4, cc_max_iterations=1)
    with caplog.at_level(logging.WARNING, logger="curator_ray.stages.cc"):
        labels = connected_components(edges, cfg)
        labels.count()
    assert any("did not converge" in r.message for r in caplog.records)
