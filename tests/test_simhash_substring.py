"""SimHash banding (F6) and exact-substring stage (F7) conformance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from curator_ray.config import FuzzyDedupConfig, SimHashConfig
from curator_ray.functions.suffix_array import cross_doc_repeated_spans, lcp_array, suffix_array
from curator_ray.functions.winnow import doc_fingerprints, window_hashes, winnow
from curator_ray.stages.cc import connected_components
from curator_ray.stages.simhash import simhash_candidate_edges
from curator_ray.stages.substring import substring_candidate_edges

CC_CFG = FuzzyDedupConfig()


def _clusters(edges):
    labels = connected_components(edges, CC_CFG)
    if labels is None:
        return []
    lab = {r["v"]: r["group"] for r in labels.take_all()}
    out = {}
    for v, g in lab.items():
        out.setdefault(g, set()).add(v)
    return sorted(tuple(sorted(m)) for m in out.values())


def test_simhash_f6(ray_session):
    # A=base, A'=hamming<=4 of A, A''=identical hash, B far away
    base = np.int64(0x0123456789ABCDEF)
    aprime = np.int64(base ^ 0b1011)  # 3 bits flipped
    b = np.int64(-0x123456789)
    tbl = pa.table(
        {
            "_id": pa.array([1, 2, 3, 4], pa.int64()),
            "phash": pa.array([base, aprime, base, b], pa.int64()),
        }
    )
    edges = simhash_candidate_edges(ray.data.from_arrow(tbl), SimHashConfig())
    assert _clusters(edges) == [(1, 2, 3)]


def test_simhash_verification_rejects_far_pairs(ray_session):
    # same low 16-bit chunk but Hamming 24 overall -> candidate, must be rejected
    a = np.int64(0x0000000000001234)
    c = np.int64(0x00FFFFFF00001234)
    tbl = pa.table({"_id": pa.array([1, 2], pa.int64()), "phash": pa.array([a, c], pa.int64())})
    edges = simhash_candidate_edges(ray.data.from_arrow(tbl), SimHashConfig())
    assert _clusters(edges) == []


def test_simhash_cross_block(ray_session):
    base = np.int64(42424242)
    t1 = pa.table({"_id": pa.array([1], pa.int64()), "phash": pa.array([base], pa.int64())})
    t2 = pa.table({"_id": pa.array([2], pa.int64()), "phash": pa.array([np.int64(base ^ 1)], pa.int64())})
    edges = simhash_candidate_edges(ray.data.from_arrow([t1, t2]), SimHashConfig())
    assert _clusters(edges) == [(1, 2)]


def test_window_hash_properties():
    data = np.frombuffer(b"abcdefabcdefxyz", dtype=np.uint8)
    h = window_hashes(data, 6)
    assert len(h) == len(data) - 5
    assert h[0] == h[6]  # "abcdef" at 0 and 6
    assert h[0] != h[1]


def test_winnow_guarantee():
    rng = np.random.RandomState(0)
    h = rng.randint(0, 2**63, size=100).astype(np.uint64)
    idx = winnow(h, 8)
    # at least one selection in every window of 8
    assert (np.diff(np.concatenate([[-1], idx, [100 + 7]])) <= 8).all()


def test_suffix_array_basic():
    data = np.frombuffer(b"banana", dtype=np.uint8)
    sa = suffix_array(data.astype(np.int64))
    suffixes = [b"banana"[i:] for i in sa]
    assert suffixes == sorted(b"banana"[i:] for i in range(6))
    lcp = lcp_array(data.astype(np.int64), sa)
    assert lcp.max() == 3  # "ana" shared by suffixes 1 and 3


def test_cross_doc_spans_oracle():
    X = "the quick brown fox jumps over the lazy dog near the river bank at dawn"
    span = X[10:65]
    Y = "UNIQUEPREFIX123 " + span + " TOTALLYDIFFERENTSUFFIX"
    Z = "zzz completely unrelated content qqq"
    assert cross_doc_repeated_spans([X, Y, Z], 50) == {(0, 1)}
    assert cross_doc_repeated_spans([X, Z], 50) == set()


def test_substring_stage_f7(ray_session):
    X = "the quick brown fox jumps over the lazy dog near the river bank at dawn"
    span = X[10:68]
    Y = "UNIQUEPREFIX123 " + span + " TOTALLYDIFFERENTSUFFIX"
    Z = "zzz completely unrelated content of reasonable length qqq padded more"
    tbl = pa.table(
        {"_id": pa.array([1, 2, 3], pa.int64()), "caption": pa.array([X, Y, Z])}
    )
    edges = substring_candidate_edges(ray.data.from_arrow(tbl), min_match_length=50)
    assert _clusters(edges) == [(1, 2)]


def test_simhash_empty_block():
    # empty blocks (empty parquet file) must not crash the local kernel
    from curator_ray.config import SimHashConfig
    from curator_ray.stages.simhash import _local_simhash

    empty = pa.table({"_id": pa.array([], pa.int64()), "phash": pa.array([], pa.int64())})
    for emit in ("edges", "reps", "both"):
        out = _local_simhash(empty, cfg=SimHashConfig(), emit=emit)
        assert out.num_rows == 0
