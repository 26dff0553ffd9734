"""Distributed cross-partition suffix-array stage vs the brute-force SA oracle.

The oracle is the classic concatenated suffix array + LCP
(functions/suffix_array.py, reference semantics Lee et al. 2022): maximal SA
runs whose adjacent LCPs are all >= K, all doc pairs per run — the exact
"docs sharing >= K contiguous bytes" relation.  The distributed stage must
reproduce it exactly (pairs mode) / component-wise (star mode) at every block
size, including one-row blocks (maximal boundary stress).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from curator_ray.functions.suffix_array import lcp_array, suffix_array
from curator_ray.stages import suffix_global as sg
from curator_ray.stages.cc import union_find_numpy


def sa_oracle_pairs(texts: list[str], ids: list[int], k: int) -> set[tuple[int, int]]:
    bufs, boundaries, pos = [], [], 0
    for d, t in enumerate(texts):
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64) + 256
        bufs.append(b)
        bufs.append(np.array([-(d + 1)], dtype=np.int64))
        boundaries.append((pos, pos + len(b)))
        pos += len(b) + 1
    data = np.concatenate(bufs) if bufs else np.zeros(0, np.int64)
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    starts = np.array([s for s, _ in boundaries])
    ends = np.array([e for _, e in boundaries])

    def doc_of(p: int) -> int:
        i = int(np.searchsorted(ends, p, side="right"))
        return i if i < len(starts) and p >= starts[i] else -1

    pairs: set[tuple[int, int]] = set()
    run: list[int] = []
    for r in range(len(sa) + 1):
        if 0 < r < len(sa) and lcp[r] >= k:
            if not run:
                run = [doc_of(int(sa[r - 1]))]
            run.append(doc_of(int(sa[r])))
        else:
            docs = sorted({d for d in run if d >= 0})
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    a, b = ids[docs[i]], ids[docs[j]]
                    pairs.add((min(a, b), max(a, b)))
            run = []
    return pairs


def _components(pairs, all_ids) -> frozenset:
    if not pairs:
        return frozenset()
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    verts, labels = union_find_numpy(src, dst)
    from collections import defaultdict

    g = defaultdict(set)
    for v, l in zip(verts.tolist(), labels.tolist()):
        g[l].add(v)
    return frozenset(frozenset(v) for v in g.values() if len(v) > 1)


# ---------------------------------------------------------------------------
# pure block-function simulation (no Ray): every block size incl. bs=1
# ---------------------------------------------------------------------------


def _split(t: pa.Table, bs: int):
    return [t.slice(i, bs) for i in range(0, t.num_rows, bs)] if t.num_rows else []


def _sorted(t: pa.Table, keys):
    cols = [t.column(c).to_numpy() for c in keys]
    return t.take(np.lexsort(tuple(reversed(cols))))


def simulate(texts, ids, k_target, bs, mode):
    base = pa.table({"caption": pa.array(texts), "_id": pa.array(ids, pa.int64())})
    dblocks = _split(base, bs)
    summaries = pa.concat_tables(
        [sg._doc_block_summary(b, text_field="caption", id_field="_id") for b in dblocks]
        or [sg._doc_block_summary(base.slice(0, 0), text_field="caption", id_field="_id")]
    )
    if summaries.num_rows == 0:
        return set()
    info0, off_bits, n_docs = sg._plan_index(summaries)
    rows = pa.concat_tables(
        [
            sg._emit_positions(
                b, text_field="caption", id_field="_id", off_bits=off_bits, info_ref=info0
            )
            for b in dblocks
        ]
    )
    mapping = pa.concat_tables(
        [sg._doc_mapping(b, id_field="_id", info_ref=info0) for b in dblocks]
    )
    id_of = np.zeros(n_docs, np.int64)
    id_of[mapping.column("idx").to_numpy()] = mapping.column("id").to_numpy()
    steps = sg._schedule(k_target)
    for i, k in enumerate(steps):
        final = i == len(steps) - 1
        msgs = pa.concat_tables(
            [sg._emit_messages(b, k=k, off_bits=off_bits) for b in _split(rows, bs)]
            or [sg._emit_messages(sg._EMPTY_ROWS, k=k, off_bits=off_bits)]
        )
        blocks = _split(_sorted(msgs, ["posk"]), bs)
        scanned = [sg._scan_pairs(b, off_bits=off_bits) for b in blocks]
        interior = [s.filter(pc.greater_equal(s.column("next"), 0)) for s in scanned]
        btbl = pa.concat_tables(
            [s.filter(pc.less(s.column("next"), 0)) for s in scanned]
            or [sg._PAIR_SCHEMA.empty_table()]
        )
        paired = pa.concat_tables(interior + [sg._resolve_pair_boundary(btbl, off_bits=off_bits)])
        if paired.num_rows == 0:
            return set()
        rblocks = _split(_sorted(paired, ["rankm", "next", "pos"]), bs)
        info = sg._global_run_info(pa.concat_tables([sg._block_summary(b) for b in rblocks]))
        if not final:
            rows = pa.concat_tables([sg._assign_ranks(b, info_ref=info) for b in rblocks])
            if rows.num_rows == 0:
                return set()
        else:
            et = pa.concat_tables(
                [sg._emit_edges(b, info_ref=info, mode=mode, off_bits=off_bits) for b in rblocks]
            )
            local = et.filter(pc.equal(et.column("bnd"), 0))
            bedges = sg._resolve_edge_boundary(et.filter(pc.equal(et.column("bnd"), 1)), mode)
            src = np.concatenate([local.column("src").to_numpy(), bedges.column("src").to_numpy()])
            dst = np.concatenate([local.column("dst").to_numpy(), bedges.column("dst").to_numpy()])
            src, dst = id_of[src], id_of[dst]
            return set(zip(np.minimum(src, dst).tolist(), np.maximum(src, dst).tolist()))
    return set()


PLANTED_SPAN = "the quick brown fox jumps over the lazy dog repeatedly"
PLANTED = (
    [
        "aaa " + PLANTED_SPAN + " bbb",
        "ccc " + PLANTED_SPAN + " ddd",
        "totally unrelated text with no common substring at all here",
        "ee " + PLANTED_SPAN[:20] + " ff",
        PLANTED_SPAN,
    ],
    [11, 22, 33, 44, 55],
)


@pytest.mark.parametrize("k", [8, 20, 40])
@pytest.mark.parametrize("bs", [1, 7, 10_000])
def test_simulated_pairs_planted(k, bs):
    texts, ids = PLANTED
    assert simulate(texts, ids, k, bs, "pairs") == sa_oracle_pairs(texts, ids, k)


@pytest.mark.parametrize("bs", [1, 2, 1000])
def test_identical_short_suffixes_do_not_pair(bs):
    # shared tail is 17 bytes: >= 18 must NOT pair (per-doc miss markers),
    # >= 16 must pair all three
    texts = ["xxxx_common_tail_1234", "yyyy_common_tail_1234", "zz_common_tail_1234"]
    assert simulate(texts, [1, 2, 3], 18, bs, "pairs") == set()
    assert simulate(texts, [1, 2, 3], 16, bs, "pairs") == {(1, 2), (1, 3), (2, 3)}


@pytest.mark.parametrize("bs", [1, 6, 1000])
def test_exact_boundary_length(bs):
    base = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcd"  # 40 bytes
    texts = ["l_" + base + "_r", "x_" + base + "_y", "nothing in common at all here really"]
    assert simulate(texts, [1, 2, 3], 40, bs, "pairs") == {(1, 2)}
    # 39-byte share must not pair at K=40
    texts2 = ["l" + base[:39] + "r", "x" + base[:39] + "y", "zz"]
    assert simulate(texts2, [1, 2, 3], 40, bs, "pairs") == set()


@pytest.mark.parametrize("seed", range(4))
def test_simulated_random_corpora(seed):
    r = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [" ".join(r.choice(vocab, size=r.integers(5, 30))) for _ in range(24)]
    shared = " ".join(r.choice(vocab, size=12))
    for j in (3, 9, 17):
        docs[j] = docs[j][:10] + " " + shared + " " + docs[j][10:]
    ids = (r.permutation(1000)[:24] + 1).tolist()
    exp = sa_oracle_pairs(docs, ids, 30)
    for bs in (5, 64, 10_000):
        assert simulate(docs, ids, 30, bs, "pairs") == exp


def test_simulated_star_components():
    r = np.random.default_rng(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [" ".join(r.choice(vocab, size=r.integers(5, 30))) for _ in range(30)]
    shared = " ".join(r.choice(vocab, size=12))
    shared2 = " ".join(r.choice(vocab, size=10))
    for j in (3, 9, 17, 25):
        docs[j] = docs[j][:5] + " " + shared + " " + docs[j][5:]
    for j in (4, 11):
        docs[j] += " " + shared2
    ids = (r.permutation(5000)[:30] + 1).tolist()
    exp = _components(sa_oracle_pairs(docs, ids, 30), ids)
    for bs in (7, 100_000):
        got = _components(simulate(docs, ids, 30, bs, "star"), ids)
        assert got == exp


def test_intra_doc_repeat_and_short_docs():
    texts = ["SPAN_REPEATED_HERE_OK! mid SPAN_REPEATED_HERE_OK!", "zz SPAN_REPEATED_HERE_OK! zz", "nothing shared at all"]
    assert simulate(texts, [100, 200, 300], 20, 3, "pairs") == {(100, 200)}
    texts2 = ["ab", "", "abcdefghij_klmnop", "zz_abcdefghij_klmnop"]
    assert simulate(texts2, [1, 2, 3, 4], 12, 1, "pairs") == {(3, 4)}


# ---------------------------------------------------------------------------
# Ray integration (session fixture provides the cluster)
# ---------------------------------------------------------------------------


def _ray_ds(texts, ids, nblocks):
    import ray

    t = pa.table({"caption": pa.array(texts), "_id": pa.array(ids, pa.int64())})
    return ray.data.from_arrow(t).repartition(nblocks)


def test_ray_pairs_match_oracle(ray_session):
    r = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [" ".join(r.choice(vocab, size=r.integers(8, 40))) for _ in range(60)]
    shared = " ".join(r.choice(vocab, size=14))
    for j in (3, 9, 17, 33, 48):
        docs[j] = docs[j][:8] + " " + shared + " " + docs[j][8:]
    ids = (r.permutation(10_000)[:60] + 1).tolist()
    exp = sa_oracle_pairs(docs, ids, 30)
    assert exp, "fixture must plant at least one pair"
    t = sg.suffix_array_pair_table(
        _ray_ds(docs, ids, 8), min_match_length=30, text_field="caption", id_field="_id"
    )
    got = set(zip(t.column("src").to_numpy().tolist(), t.column("dst").to_numpy().tolist()))
    assert got == exp


def test_ray_star_components_match_oracle(ray_session):
    texts, ids = PLANTED
    exp = _components(sa_oracle_pairs(texts, ids, 40), ids)
    edges = sg.suffix_array_candidate_edges(
        _ray_ds(texts, ids, 4), min_match_length=40, text_field="caption", id_field="_id"
    )
    parts = [pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")]
    parts = [p for p in parts if p.num_rows]
    pairs = set()
    if parts:
        t = pa.concat_tables(parts)
        pairs = set(zip(t.column("src").to_numpy().tolist(), t.column("dst").to_numpy().tolist()))
    assert _components(pairs, ids) == exp


def test_ray_no_duplicates_returns_empty(ray_session):
    texts = ["first doc alpha beta", "second doc gamma delta", "third doc epsilon zeta"]
    t = sg.suffix_array_pair_table(
        _ray_ds(texts, [1, 2, 3], 2), min_match_length=12, text_field="caption", id_field="_id"
    )
    assert t.num_rows == 0


def test_ray_join_translation_path(ray_session, monkeypatch):
    # force the distributed hash-join idx->id translation (the >8M-doc path)
    monkeypatch.setattr(sg, "_BROADCAST_DOCS_MAX", 0)
    r = np.random.default_rng(9)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [" ".join(r.choice(vocab, size=r.integers(8, 30))) for _ in range(40)]
    shared = " ".join(r.choice(vocab, size=12))
    for j in (2, 11, 29):
        docs[j] = docs[j][:6] + " " + shared + " " + docs[j][6:]
    ids = (r.permutation(9999)[:40] + 1).tolist()
    exp = sa_oracle_pairs(docs, ids, 30)
    assert exp
    t = sg.suffix_array_pair_table(
        _ray_ds(docs, ids, 5), min_match_length=30, text_field="caption", id_field="_id"
    )
    got = set(zip(t.column("src").to_numpy().tolist(), t.column("dst").to_numpy().tolist()))
    assert got == exp
