"""Distributed cross-partition suffix-array exact-substring stage.

Finds every pair of documents that share an exact byte span of length
>= ``min_match_length`` — EXACTLY (no winnowing sampling, no hash
collisions) — via distributed prefix doubling over ``ray.data`` sorts,
i.e. the suffix-array construction (Manber-Myers doubling) run only to
prefix depth K = ``min_match_length`` and over all document suffixes at
once.  Complements ``stages/substring.py`` (winnowed fingerprints, the
default 100 TB path whose only error source is 2^-64 rolling-hash
collisions): this stage is the no-asterisk exact path and the
cross-partition completion of ``functions/suffix_array.py`` (reference
semantics: Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better"; per-partition SA+LCP lives in functions/suffix_array.py).

Row layout (round-4 slimming)
-----------------------------
Documents are first given DENSE indices 0..n_docs-1 (per-block offsets
computed on the driver from O(blocks) summary rows — the same pattern as
``_global_run_info`` below), and every suffix identity is packed into ONE
int64 ``pos = (doc_idx << off_bits) | off`` where ``off_bits`` is sized
from the corpus' longest document.  Tag bits ride inside the sort keys:

* message rows:   ``posk = pos << 1 | kind``            (16 B: posk, rank)
* suffix rows:    ``(pos, rank)``                        (16 B)
* paired rows:    ``(pos, rankm = rank << 1 | miss, next)``  (24 B)

vs the round-3 layout (doc, off, rank[, kind, next, miss, bnd] — 25-35 B)
this is ~1.6x fewer sorted bytes per round and 3 sort keys instead of 5,
which is what moves the single-box object-store spill knee (PERF.md size
sweep) out.  Ascending int64 order of ``pos``/``posk``/``rankm`` equals
the old multi-column lexicographic order, so the algorithm is unchanged.
Boundary rows reuse the ``next`` column as a sentinel (``next = -1 - kind``
< 0; real rows always have ``next >= 0``), so no extra flag column exists.

Algorithm
---------
A row per suffix: ``(pos, rank)`` where ``rank`` initially packs the
``_K0`` (=7) bytes at ``off`` (positions with fewer remaining bytes cannot
start nor serve any K>=8 comparison and are never emitted).  Each round
extends the compared prefix from L to L+k (k <= L, schedule reaches K
exactly):

1. every row sends its rank to the position k before it
   (``posk = (pos - k) << 1 | 1``) and itself as kind=0 (``pos << 1``);
2. one ``sort([posk])`` + a vectorized pair scan joins the two messages
   into ``(pos, rankm, next)``; a row whose target is absent gets
   ``miss=1`` (low bit of rankm) and ``next = doc_idx`` — a per-document
   marker, so two truncated suffixes from different documents can never
   compare equal (the unique-sentinel construction of the classic
   concatenated SA);
3. one ``sort([rankm, next, pos])`` + a two-pass run-numbering scan
   assigns ``new rank = global index of the run's first row`` and PRUNES:
   rows in singleton runs and rows with miss=1 are dropped.

Pruning is exact: if suffixes p, p' (different docs) share >= K bytes,
then at every round their lookup targets p+k, p'+k share >= L bytes, so
each target sits in a run of size >= 2 with a real (miss=0) pair — the
whole chain of rows a true match needs survives every prune.  Everything
else shrinks to the duplicate mass after a couple of rounds, so later
sorts touch only near-duplicate text, not the corpus.

After the last round, rows with equal (rankm even, next) share exactly
>= K bytes; the final run scan emits star edges between the distinct
documents of each run (or all pairs in ``emit="pairs"`` verification
mode), boundary runs resolved on the driver from O(2/block) rows like
every other sort-scan in this repo (see cc.sorted_group_min).  Edges are
emitted in dense-index space and translated back to the caller's doc ids
at the end: a zero-copy plasma lookup table for corpora up to
``_BROADCAST_DOCS_MAX`` docs, a distributed hash join above it.

Scale notes: per round = 2 Dataset sorts; round-1 volume is O(total
bytes) rows of 16 B, after which pruning collapses the table.  All
driver work is O(blocks) per round.  For 100 TB corpora run the winnowed
stage first (or instead); this stage is the exact verifier / exact path
for corpora whose duplicate mass fits the shuffle budget.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.shingles import _string_array_buffers

# Initial packed-prefix width: 7 bytes is the widest that stays positive in
# an int64 (56 bits), so ascending int64 sort order == lexicographic byte
# order with no sign handling. vs the earlier 4-byte pack this removes one
# full doubling round (2 Dataset sorts at near-peak volume for K=40:
# 4->8->16->32->40 is 4 rounds; 7->14->28->40 is 3) and makes the first
# prune compare 7 bytes instead of 4 (smaller equal-prefix runs survive).
# Chain safety: a suffix with a true >= K match only ever needs targets
# p+c whose packed/derived ranks cover bytes inside the match span
# (schedule keeps k <= L and lands on K exactly), and every such target has
# >= _K0 bytes remaining, so none of its rows are dropped at emit.
_K0 = 7

# Largest corpus (docs) whose dense-index -> doc-id lookup is shipped as one
# zero-copy plasma numpy array (8 B/doc: 8M docs = 64 MB, read shared per
# node); beyond it the translation is a distributed hash join.
_BROADCAST_DOCS_MAX = 8_000_000


# ---------------------------------------------------------------------------
# dense doc indexing: per-block offsets from O(blocks) driver rows
# ---------------------------------------------------------------------------

_DOC_SUMMARY_COLS = ["f_id", "n_rows", "max_len"]


def _doc_block_summary(batch: pa.Table, *, text_field: str, id_field: str) -> pa.Table:
    """One row per block: first doc id (unique — ids are unique), row count,
    longest text in bytes.  Driver input for dense index assignment."""
    n = len(batch)
    if n == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in _DOC_SUMMARY_COLS})
    col = batch.column(text_field)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    _, offsets = _string_array_buffers(col)
    max_len = int((offsets[1:] - offsets[:-1]).max()) if n else 0
    return pa.table(
        {
            "f_id": pa.array([int(batch.column(id_field)[0].as_py())], pa.int64()),
            "n_rows": pa.array([n], pa.int64()),
            "max_len": pa.array([max_len], pa.int64()),
        }
    )


def _plan_index(summaries: pa.Table) -> tuple[dict, int, int]:
    """Driver: assign each block a dense base index (blocks ordered by first
    doc id) and size the in-document offset field.  Returns
    ``({first_id: base_idx}, off_bits, n_docs)``."""
    f_id = summaries.column("f_id").to_numpy()
    n_rows = summaries.column("n_rows").to_numpy()
    max_len = int(summaries.column("max_len").to_numpy().max()) if len(f_id) else 0
    order = np.argsort(f_id, kind="stable")
    bases = np.cumsum(n_rows[order]) - n_rows[order]
    n_docs = int(n_rows.sum())
    off_bits = max(1, int(max_len).bit_length())
    doc_bits = max(1, (max(n_docs - 1, 0)).bit_length())
    if doc_bits + off_bits > 62:  # pos << 1 must stay positive in int64
        raise ValueError(
            f"corpus too large for packed suffix rows: {n_docs} docs "
            f"({doc_bits} bits) x {max_len} B max doc ({off_bits} bits) > 62 bits"
        )
    info = {int(f_id[order[i]]): int(bases[i]) for i in range(len(f_id))}
    return info, off_bits, n_docs


def _doc_mapping(batch: pa.Table, *, id_field: str, info_ref) -> pa.Table:
    """(idx, id) rows for translating final edges back to caller doc ids."""
    import ray

    info = ray.get(info_ref) if not isinstance(info_ref, dict) else info_ref
    if len(batch) == 0:
        return pa.table({"idx": pa.array([], pa.int64()), "id": pa.array([], pa.int64())})
    base = info[int(batch.column(id_field)[0].as_py())]
    return pa.table(
        {
            "idx": pa.array(base + np.arange(len(batch), dtype=np.int64), pa.int64()),
            "id": batch.column(id_field).cast(pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# round 0: one row per suffix — pos = (doc_idx << off_bits) | off
# ---------------------------------------------------------------------------


def _emit_positions(
    batch: pa.Table, *, text_field: str, id_field: str, off_bits: int, info_ref
) -> pa.Table:
    import ray

    if len(batch) == 0:
        return _EMPTY_ROWS
    info = ray.get(info_ref) if not isinstance(info_ref, dict) else info_ref
    base = info[int(batch.column(id_field)[0].as_py())]
    col = batch.column(text_field)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    data, offsets = _string_array_buffers(col)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    npos = np.maximum(lens - (_K0 - 1), 0)
    total = int(npos.sum())
    if total == 0:
        return _EMPTY_ROWS
    idx = base + np.arange(len(batch), dtype=np.int64)
    doc = np.repeat(idx, npos)
    # in-doc offsets 0..len-_K0 for every doc, one flat arange
    starts = np.cumsum(npos) - npos
    off = np.arange(total, dtype=np.int64) - np.repeat(starts, npos)
    flat = np.repeat(offsets[:-1].astype(np.int64), npos) + off
    # gather uint8 first, widen after: avoids an 8x transient copy of the
    # whole text buffer (the peak-memory step of the highest-volume round)
    rank = data[flat].astype(np.int64)
    for b in range(1, _K0):
        rank <<= 8
        rank |= data[flat + b]
    return pa.table(
        {
            "pos": pa.array((doc << off_bits) | off, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


_EMPTY_ROWS = pa.table({"pos": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})


# ---------------------------------------------------------------------------
# step 1: message emission  (posk = pos << 1 | kind, rank)
# ---------------------------------------------------------------------------


def _emit_messages(batch: pa.Table, *, k: int, off_bits: int) -> pa.Table:
    pos = batch.column("pos").to_numpy()
    rank = batch.column("rank").to_numpy()
    off = pos & ((np.int64(1) << off_bits) - 1)
    keep = off >= k  # kind-1 message targets pos-k (same doc); negative targets drop
    posk = np.concatenate([pos << 1, ((pos[keep] - k) << 1) | 1])
    out_rank = np.concatenate([rank, rank[keep]])
    return pa.table(
        {"posk": pa.array(posk, pa.int64()), "rank": pa.array(out_rank, pa.int64())}
    )


# ---------------------------------------------------------------------------
# step 2: pair scan over sort([posk])
# ---------------------------------------------------------------------------

_PAIR_SCHEMA = pa.schema([("pos", pa.int64()), ("rankm", pa.int64()), ("next", pa.int64())])


def _pair_table(pos, rankm, nxt) -> pa.Table:
    return pa.table(
        {
            "pos": pa.array(pos, pa.int64()),
            "rankm": pa.array(rankm, pa.int64()),
            "next": pa.array(nxt, pa.int64()),
        }
    )


def _scan_pairs(batch: pa.Table, *, off_bits: int) -> pa.Table:
    """Per sorted block: join adjacent (kind=0, kind=1) rows with equal pos.
    The block's first row (if an unpaired kind-1) and last row (if an
    unpaired kind-0) may have their partner in a neighbor block and are
    re-emitted raw with ``next = -1 - kind`` for the driver to resolve."""
    n = len(batch)
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    posk = batch.column("posk").to_numpy()
    rank = batch.column("rank").to_numpy()
    pos = posk >> 1
    kind = (posk & 1).astype(np.int8)
    same = pos[1:] == pos[:-1]
    lead = np.flatnonzero(same)  # kind-0 row index of each local pair
    paired = np.zeros(n, dtype=bool)
    paired[lead] = True
    paired[lead + 1] = True
    boundary = np.zeros(n, dtype=bool)
    if not paired[0] and kind[0] == 1:
        boundary[0] = True  # partner kind-0 sorts before -> previous block
    if not paired[n - 1] and kind[n - 1] == 0:
        boundary[n - 1] = True  # partner kind-1 sorts after -> next block
    # interior unpaired kind-0 rows: the partner would sort immediately after
    # them, i.e. inside this block -> it does not exist anywhere: miss.
    lone = (~paired) & (~boundary) & (kind == 0)
    li = np.flatnonzero(lone)
    parts = [
        _pair_table(pos[lead], rank[lead] << 1, rank[lead + 1]),
        _pair_table(pos[li], (rank[li] << 1) | 1, pos[li] >> off_bits),
    ]
    bi = np.flatnonzero(boundary)
    if len(bi):
        parts.append(_pair_table(pos[bi], rank[bi] << 1, -1 - kind[bi].astype(np.int64)))
    return pa.concat_tables(parts)


def _resolve_pair_boundary(btbl: pa.Table, *, off_bits: int) -> pa.Table:
    """Driver merge of O(2/block) raw boundary rows: same pair logic over the
    globally re-sorted remainder.  Unpaired kind-1 rows (their kind-0 base was
    pruned) drop; unpaired kind-0 rows miss."""
    n = len(btbl)
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    pos = btbl.column("pos").to_numpy()
    rank = btbl.column("rankm").to_numpy() >> 1
    kind = (-(btbl.column("next").to_numpy() + 1)).astype(np.int8)
    order = np.lexsort((kind, pos))
    pos, kind, rank = pos[order], kind[order], rank[order]
    same = pos[1:] == pos[:-1]
    lead = np.flatnonzero(same)
    paired = np.zeros(n, dtype=bool)
    paired[lead] = True
    paired[lead + 1] = True
    lone = (~paired) & (kind == 0)
    li = np.flatnonzero(lone)
    return pa.concat_tables(
        [
            _pair_table(pos[lead], rank[lead] << 1, rank[lead + 1]),
            _pair_table(pos[li], (rank[li] << 1) | 1, pos[li] >> off_bits),
        ]
    )


# ---------------------------------------------------------------------------
# step 3: run numbering + pruning over sort([rankm, next, pos])
# ---------------------------------------------------------------------------


def _run_layout(batch: pa.Table):
    rankm = batch.column("rankm").to_numpy()
    nxt = batch.column("next").to_numpy()
    change = np.zeros(len(rankm), dtype=bool)
    change[0] = True
    change[1:] = (rankm[1:] != rankm[:-1]) | (nxt[1:] != nxt[:-1])
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, len(rankm)))
    return starts, sizes


def _block_summary(batch: pa.Table) -> pa.Table:
    """One row per block: identity (first-row full key), run layout at the
    block's edges.  Driver input for global run numbering — O(blocks)."""
    n = len(batch)
    if n == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in _SUMMARY_COLS})
    starts, sizes = _run_layout(batch)
    vals = {
        "n_rows": n,
        "n_runs": len(starts),
        "first_run_len": int(sizes[0]),
        "last_run_start": int(starts[-1]),
        "last_run_len": int(sizes[-1]),
    }
    for c in ("rankm", "next", "pos"):
        col = batch.column(c).to_numpy()
        vals[f"f_{c}"] = int(col[0])
        vals[f"l_{c}"] = int(col[n - 1])
    return pa.table({c: pa.array([vals[c]], pa.int64()) for c in _SUMMARY_COLS})


_SUMMARY_COLS = [
    "n_rows", "n_runs", "first_run_len", "last_run_start", "last_run_len",
    "f_rankm", "f_next", "f_pos",
    "l_rankm", "l_next", "l_pos",
]


def _global_run_info(summaries: pa.Table) -> dict:
    """Order blocks by first-row key (unique: includes pos), walk the chain
    of runs spanning block boundaries, and return per-block:
    ``first-row key -> (row_offset, f_start, f_total, l_start, l_total)``."""
    cols = {c: summaries.column(c).to_numpy() for c in _SUMMARY_COLS}
    nb = len(summaries)
    order = np.lexsort((cols["f_pos"], cols["f_next"], cols["f_rankm"]))
    blocks = [{c: int(cols[c][i]) for c in _SUMMARY_COLS} for i in order]
    info: dict = {}
    open_run = None
    offset = 0
    per_block = []
    for b in blocks:
        key2 = (b["f_rankm"], b["f_next"])
        if open_run is not None and open_run["key"] == key2:
            frun = open_run
        else:
            frun = {"key": key2, "start": offset, "size": 0}
        frun["size"] += b["first_run_len"]
        if b["n_runs"] == 1:
            lrun = frun
        else:
            lrun = {
                "key": (b["l_rankm"], b["l_next"]),
                "start": offset + b["last_run_start"],
                "size": b["last_run_len"],
            }
        open_run = lrun
        per_block.append((b, offset, frun, lrun))
        offset += b["n_rows"]
    for b, off0, frun, lrun in per_block:
        bkey = (b["f_rankm"], b["f_next"], b["f_pos"])
        info[bkey] = (off0, frun["start"], frun["size"], lrun["start"], lrun["size"])
    assert len(info) == nb  # first-row keys are unique (pos is unique)
    return info


def _block_info(batch: pa.Table, info: dict):
    bkey = tuple(int(batch.column(c)[0].as_py()) for c in ("rankm", "next", "pos"))
    return info[bkey]


def _assign_ranks(batch: pa.Table, *, info_ref) -> pa.Table:
    """Per block (pass 2): new rank = global index of the run's first row;
    drop miss rows and rows in globally-singleton runs."""
    import ray

    if len(batch) == 0:
        return _EMPTY_ROWS
    info = ray.get(info_ref) if not isinstance(info_ref, dict) else info_ref
    row_offset, f_start, f_total, l_start, l_total = _block_info(batch, info)
    starts, sizes = _run_layout(batch)
    g_starts = row_offset + starts
    totals = sizes.astype(np.int64).copy()
    g_starts[0] = f_start
    totals[0] = f_total
    totals[-1] = l_total
    if len(starts) > 1:
        g_starts[-1] = l_start
    run_of = np.repeat(np.arange(len(starts)), sizes)
    new_rank = g_starts[run_of]
    miss = batch.column("rankm").to_numpy() & 1
    keep = (miss == 0) & (totals[run_of] >= 2)
    return pa.table(
        {
            "pos": pa.array(batch.column("pos").to_numpy()[keep], pa.int64()),
            "rank": pa.array(new_rank[keep], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# final round: emit edges instead of new ranks
# ---------------------------------------------------------------------------

_EDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("gkey", pa.int64()), ("bnd", pa.int8())]
)


def _edge_table(src, dst, gkey=None, bnd=None) -> pa.Table:
    n = len(src)
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "gkey": pa.array(gkey if gkey is not None else np.zeros(n, np.int64), pa.int64()),
            "bnd": pa.array(bnd if bnd is not None else np.zeros(n, np.int8), pa.int8()),
        }
    )


def _all_pairs(x: np.ndarray, run_of: np.ndarray):
    """All ordered pairs (x[i], x[j]) i<j within each run — vectorized."""
    change = np.zeros(len(x), dtype=bool)
    if len(x):
        change[0] = True
        change[1:] = run_of[1:] != run_of[:-1]
    starts = np.flatnonzero(change)
    start_of = starts[np.cumsum(change) - 1] if len(x) else np.zeros(0, np.int64)
    j = np.arange(len(x)) - start_of  # index within run
    total = int(j.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    base = np.repeat(start_of, j)
    csum = np.cumsum(j) - j
    r = np.arange(total) - np.repeat(csum, j)
    return x[base + r], np.repeat(x, j)


def _emit_edges(batch: pa.Table, *, info_ref, mode: str, off_bits: int) -> pa.Table:
    """Final pass 2: per kept run (miss=0, global size >= 2) emit edges among
    its distinct docs.  Runs touching a block edge also emit (gkey=global run
    start, doc) representative rows; in ``pairs`` mode they emit their FULL
    distinct-doc list and no local edges (driver builds the cross pairs)."""
    import ray

    if len(batch) == 0:
        return _EDGE_SCHEMA.empty_table()
    info = ray.get(info_ref) if not isinstance(info_ref, dict) else info_ref
    row_offset, f_start, f_total, l_start, l_total = _block_info(batch, info)
    starts, sizes = _run_layout(batch)
    nruns = len(starts)
    g_starts = row_offset + starts
    totals = sizes.astype(np.int64).copy()
    g_starts[0] = f_start
    totals[0] = f_total
    totals[-1] = l_total
    if nruns > 1:
        g_starts[-1] = l_start
    run_of = np.repeat(np.arange(nruns), sizes)
    doc = batch.column("pos").to_numpy() >> off_bits
    miss = batch.column("rankm").to_numpy() & 1
    # runs are homogeneous in (rankm, next) — the sort key
    run_kept = (miss[starts] == 0) & (totals >= 2)
    spans_edge = np.zeros(nruns, dtype=bool)
    spans_edge[0] = totals[0] != sizes[0]
    spans_edge[-1] |= totals[-1] != sizes[-1]
    # distinct docs per kept run (rows sorted by pos, hence by doc, in a run)
    new_doc = np.zeros(len(doc), dtype=bool)
    new_doc[starts] = True
    new_doc[1:] |= (doc[1:] != doc[:-1]) & (run_of[1:] == run_of[:-1])
    di = np.flatnonzero(new_doc & run_kept[run_of])
    d_doc = doc[di]
    d_run = run_of[di]
    d_spans = spans_edge[d_run]
    first_of_run = np.zeros(len(di), dtype=bool)
    if len(di):
        first_of_run[0] = True
        first_of_run[1:] = d_run[1:] != d_run[:-1]
    parts = []
    if mode == "pairs":
        local = ~d_spans  # edge runs go to the driver with their FULL doc list
        src, dst = _all_pairs(d_doc[local], d_run[local])
        parts.append(_edge_table(src, dst))
        rep_mask = d_spans
    else:
        # star: hub = run's locally-first (minimal) doc
        f = np.flatnonzero(first_of_run)
        counts = np.diff(np.append(f, len(di)))
        hub = np.repeat(d_doc[f], counts) if len(di) else np.zeros(0, np.int64)
        tail = ~first_of_run
        parts.append(_edge_table(hub[tail], d_doc[tail]))
        rep_mask = d_spans & first_of_run  # one (hub) rep per edge run
    ri = np.flatnonzero(rep_mask)
    if len(ri):
        parts.append(
            _edge_table(
                np.zeros(len(ri), np.int64), d_doc[ri], g_starts[d_run[ri]],
                np.ones(len(ri), np.int8),
            )
        )
    return pa.concat_tables(parts) if parts else _EDGE_SCHEMA.empty_table()


def _resolve_edge_boundary(btbl: pa.Table, mode: str) -> pa.Table:
    """Driver: boundary reps grouped by global run start -> edges."""
    if len(btbl) == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    gkey = btbl.column("gkey").to_numpy()
    doc = btbl.column("dst").to_numpy()
    order = np.lexsort((doc, gkey))
    gkey, doc = gkey[order], doc[order]
    uniq = np.zeros(len(gkey), dtype=bool)
    uniq[0] = True
    uniq[1:] = (gkey[1:] != gkey[:-1]) | (doc[1:] != doc[:-1])
    gkey, doc = gkey[uniq], doc[uniq]
    run_change = np.zeros(len(gkey), dtype=bool)
    run_change[0] = True
    run_change[1:] = gkey[1:] != gkey[:-1]
    run_of = np.cumsum(run_change) - 1
    if mode == "pairs":
        src, dst = _all_pairs(doc, run_of)
    else:
        starts = np.flatnonzero(run_change)
        start_of = starts[run_of]
        tail = ~run_change
        src, dst = doc[start_of][tail], doc[tail]
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


# ---------------------------------------------------------------------------
# edge translation: dense idx -> caller doc ids
# ---------------------------------------------------------------------------


def _lookup_edges(batch: pa.Table, *, table_ref) -> pa.Table:
    import ray

    id_of = ray.get(table_ref) if not isinstance(table_ref, np.ndarray) else table_ref
    return pa.table(
        {
            "src": pa.array(id_of[batch.column("src").to_numpy()], pa.int64()),
            "dst": pa.array(id_of[batch.column("dst").to_numpy()], pa.int64()),
        }
    )


def _translate_edges(edges, mapping, n_docs: int):
    """Map (src, dst) dense indices back to caller doc ids.  Small corpora:
    one plasma-shared numpy lookup (zero-copy read per worker).  Large:
    distributed hash join against the (idx, id) mapping Dataset."""
    import ray

    if n_docs <= _BROADCAST_DOCS_MAX:
        from .cc import _collect_small

        mtbl = _collect_small(mapping, ["idx", "id"])
        id_of = np.zeros(n_docs, dtype=np.int64)
        id_of[mtbl.column("idx").to_numpy()] = mtbl.column("id").to_numpy()
        table_ref = ray.put(id_of)
        return edges.map_batches(
            functools.partial(_lookup_edges, table_ref=table_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # hash-shuffle aggregator actors are per-partition: keep the floor tiny so
    # small clusters don't deadlock on actor resources, scale with corpus size
    nparts = max(2, min(512, n_docs // 4_000_000))
    out = edges.join(
        mapping, "inner", num_partitions=nparts, on=("src",), right_on=("idx",)
    )
    out = out.map_batches(
        lambda b: pa.table({"src": b.column("id"), "dst": b.column("dst")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = out.join(mapping, "inner", num_partitions=nparts, on=("dst",), right_on=("idx",))
    return out.map_batches(
        lambda b: pa.table({"src": b.column("src"), "dst": b.column("id")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _round(rows, k: int, *, final: bool, mode: str, off_bits: int):
    """One doubling round: extend compared prefixes by k bytes.  Two Dataset
    sorts; all driver work O(blocks).  Returns (rows | edges) Dataset."""
    import ray

    msgs = rows.map_batches(
        functools.partial(_emit_messages, k=k, off_bits=off_bits),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = (
        msgs.sort(["posk"])
        .map_batches(
            functools.partial(_scan_pairs, off_bits=off_bits),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    interior = scanned.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("next"), 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .cc import _collect_small

    btbl = _collect_small(
        scanned.map_batches(
            lambda b: b.filter(pc.less(b.column("next"), 0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["pos", "rankm", "next"],
    )
    resolved = _resolve_pair_boundary(btbl, off_bits=off_bits)
    paired = interior.union(ray.data.from_arrow(resolved))
    ranked = paired.sort(["rankm", "next", "pos"]).materialize()
    summaries = _collect_small(
        ranked.map_batches(_block_summary, batch_format="pyarrow", zero_copy_batch=True),
        _SUMMARY_COLS,
    )
    if len(summaries) == 0:
        return None
    info_ref = ray.put(_global_run_info(summaries))
    if not final:
        return ranked.map_batches(
            functools.partial(_assign_ranks, info_ref=info_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    edges = ranked.map_batches(
        functools.partial(_emit_edges, info_ref=info_ref, mode=mode, off_bits=off_bits),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    local = edges.map_batches(
        lambda b: b.filter(pc.equal(b.column("bnd"), 0)).select(["src", "dst"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    breps = _collect_small(
        edges.map_batches(
            lambda b: b.filter(pc.equal(b.column("bnd"), 1)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["src", "dst", "gkey"],
    )
    return local.union(ray.data.from_arrow(_resolve_edge_boundary(breps, mode)))


def _schedule(k_target: int) -> list[int]:
    steps, length = [], _K0
    while length < k_target:
        k = min(length, k_target - length)
        steps.append(k)
        length += k
    return steps


_EMPTY_EDGES = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})


# bump when the (pos, rank) row layout or round semantics change: stale
# checkpoints from an older layout must never be resumed into a newer build
_CKPT_LAYOUT = "sa-packed-v1"


def _corpus_fingerprint(summaries: pa.Table, min_match_length: int, emit: str) -> str:
    """Deterministic fingerprint of (corpus blocks, config, row layout).
    Block summaries are sorted by first doc id so block arrival order does
    not matter; a different input *blocking* of the same rows changes the
    fingerprint, which only costs resume coverage, never correctness."""
    from ..state.manifest import fingerprint

    f_id = summaries.column("f_id").to_numpy()
    order = np.argsort(f_id, kind="stable")
    trips = tuple(
        (int(f_id[i]), int(summaries.column("n_rows")[i].as_py()), int(summaries.column("max_len")[i].as_py()))
        for i in order
    )
    return fingerprint(_CKPT_LAYOUT, min_match_length, emit, trips)


def _ckpt_round(manifest, i: int, fp: str, out_dir: str, build):
    """Persist-or-resume one doubling round.  A fully-pruned round
    (``build() -> None`` or a 0-row table — parquet writers emit no files
    for those) is recorded as a zero-row manifest entry and returned as
    ``None``: the non-checkpoint path reaches empty edges one round later
    via an empty ``_round`` input, so collapsing early is equivalent."""
    import os
    import shutil

    import ray

    from ..state.manifest import dir_counters

    stage, part = "sa_round", f"r{i}"
    ent = manifest.entry(stage, part)
    if ent is not None and ent.get("fingerprint") == fp:
        if ent.get("counters", {}).get("sa_round_rows", 0) == 0:
            return None
        return ray.data.read_parquet(out_dir)

    rows = build()
    shutil.rmtree(out_dir, ignore_errors=True)
    ctr = {"sa_round_rows": 0, "sa_round_files": 0}
    if rows is not None:
        os.makedirs(out_dir, exist_ok=True)
        # insurance copy OFF the critical path: the round stays materialized
        # in plasma for the next round (exactly the checkpoint-off memory
        # profile) and the parquet write is a side copy from plasma blocks —
        # downstream never pays the disk re-read + decompress that routing
        # the chain through read_parquet cost (~2x at 1M, PERF.md r4); only
        # a RESUME reads the files. zstd: the (pos, rank) int64 tables
        # compress ~2.4x and the sandbox disk is the bound, not CPU.
        rows = rows.materialize()
        rows.write_parquet(out_dir, min_rows_per_file=32_768, compression="zstd")
        ctr = dir_counters(out_dir, stage)
    # the manifest record is the atomic commit point (after the write)
    manifest.record(stage, part, fp, counters=ctr)
    if ctr["sa_round_rows"] == 0:
        return None
    return rows


def suffix_array_candidate_edges(
    ds,
    min_match_length: int = 40,
    text_field: str = "caption",
    id_field: str = "_id",
    emit: str = "star",
    checkpoint_path: str | None = None,
    checkpoint_every: int = 2,
):
    """Exact duplicate-span edges: (src, dst) doc-id pairs that share an exact
    byte span >= ``min_match_length``.  ``emit="star"`` (default) links each
    duplicated span's docs through a hub for the CC stage; ``emit="pairs"``
    returns every sharing pair (verification/oracle mode — O(group^2)).

    ``checkpoint_path`` opts into mid-stage resume (the north rule's
    per-partition lineage + counters): the doc mapping and a subset of the
    non-final doubling rounds are persisted to zstd parquet under it with a
    ``CheckpointManifest`` entry per round carrying the post-prune row count
    (the pruning curve), keyed by a fingerprint of (corpus block summaries,
    config, row layout).  ``checkpoint_every`` trades insurance for write
    cost: every ``checkpoint_every``-th round (plus the last non-final
    round, the highest-value one) is committed, and a rerun after a crash
    resumes from the LAST committed round — recomputing at most
    ``checkpoint_every - 1`` rounds — found by look-ahead, so committed
    rounds are never re-executed even when rounds between them were
    skipped.  Each round costs 2 full Dataset sorts, so at scale a resumed
    run skips hours of shuffle.  Reference parity: the reference's
    resumability is per-source-partition only
    (``pipeline/pipeline.py:231-258``); this is strictly finer."""
    assert min_match_length >= 8, "suffix-array stage needs min_match_length >= 8"
    import ray

    docs = ds.select_columns([id_field, text_field]).materialize()
    from .cc import _collect_small

    summaries = _collect_small(
        docs.map_batches(
            functools.partial(_doc_block_summary, text_field=text_field, id_field=id_field),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        _DOC_SUMMARY_COLS,
    )
    if len(summaries) == 0:
        return ray.data.from_arrow(_EMPTY_EDGES)
    info, off_bits, n_docs = _plan_index(summaries)
    info_ref = ray.put(info)
    rows = docs.map_batches(
        functools.partial(
            _emit_positions,
            text_field=text_field,
            id_field=id_field,
            off_bits=off_bits,
            info_ref=info_ref,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    manifest = None
    corpus_fp = None
    if checkpoint_path is not None:
        import os

        from ..state.manifest import CheckpointManifest, checkpointed, fingerprint

        manifest = CheckpointManifest(os.path.join(checkpoint_path, "_checkpoints"))
        corpus_fp = _corpus_fingerprint(summaries, min_match_length, emit)
        mapping = checkpointed(
            manifest,
            "sa_mapping",
            "all",
            corpus_fp,
            os.path.join(checkpoint_path, "mapping"),
            lambda: docs.map_batches(
                functools.partial(_doc_mapping, id_field=id_field, info_ref=info_ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
        )
    else:
        mapping = docs.map_batches(
            functools.partial(_doc_mapping, id_field=id_field, info_ref=info_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    # mapping is 16 B/doc and is not consumed until the final edge
    # translation: materializing it NOW (and dropping the docs handle)
    # releases the O(corpus bytes) text blocks as soon as round 1 reads
    # them, instead of pinning the whole corpus in plasma through every
    # sort round via mapping's lazy lineage
    del docs
    steps = _schedule(min_match_length)
    start = 0
    ckpt_rounds: set[int] = set()
    if manifest is not None:
        import os

        from ..state.manifest import fingerprint as _fp

        every = max(1, checkpoint_every)
        # commit every `every`-th round plus the last non-final round (the
        # highest-value commit: a crash in the final edge emission resumes
        # past every sort round)
        ckpt_rounds = {i for i in range(len(steps) - 1) if i % every == every - 1}
        if len(steps) >= 2:
            ckpt_rounds.add(len(steps) - 2)
        # chain the fingerprint through the schedule position so a
        # min_match_length change (different steps) can never resume a
        # round computed under another schedule
        fps = {i: _fp(corpus_fp, i, steps[i], tuple(steps)) for i in range(len(steps) - 1)}
        # look-ahead resume: find the LAST committed round and start after
        # it, so skipped rounds between commits are never re-executed
        for i in sorted(ckpt_rounds, reverse=True):
            ent = manifest.entry("sa_round", f"r{i}")
            if ent is not None and ent.get("fingerprint") == fps[i]:
                if ent.get("counters", {}).get("sa_round_rows", 0) == 0:
                    return ray.data.from_arrow(_EMPTY_EDGES)
                rows = ray.data.read_parquet(os.path.join(checkpoint_path, f"round_{i}"))
                start = i + 1
                break
    for i in range(start, len(steps)):
        k = steps[i]
        final = i == len(steps) - 1
        if manifest is not None and not final and i in ckpt_rounds:
            import os

            rows_in = rows
            rows = _ckpt_round(
                manifest,
                i,
                fps[i],
                os.path.join(checkpoint_path, f"round_{i}"),
                lambda: _round(rows_in, k, final=False, mode=emit, off_bits=off_bits),
            )
        else:
            rows = _round(rows, k, final=final, mode=emit, off_bits=off_bits)
        if rows is None:
            return ray.data.from_arrow(_EMPTY_EDGES)
    return _translate_edges(rows, mapping, n_docs)


def suffix_array_pair_table(ds, min_match_length: int = 40, text_field: str = "text", id_field: str = "_id") -> pa.Table:
    """Distinct sorted (src, dst) pairs, src < dst — query/oracle surface."""
    edges = suffix_array_candidate_edges(
        ds, min_match_length, text_field=text_field, id_field=id_field, emit="pairs"
    )
    parts = [pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    a = t.column("src").to_numpy()
    b = t.column("dst").to_numpy()
    src, dst = np.minimum(a, b), np.maximum(a, b)
    from .cc import dedup_pairs

    src, dst = dedup_pairs(src, dst)
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
