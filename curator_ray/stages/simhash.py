"""SimHash-style near-dup candidates over a 64-bit pHash column.

Graft-specific stage (no direct reference analog — SURVEY.md §2.7): Charikar
(2002) bit-vector similarity + multi-index hashing (Norouzi et al. 2012)
candidate generation:

- split the 64-bit hash into ``num_chunks`` equal chunks; rows sharing a
  chunk value are candidates (guarantees detection of Hamming distance
  < num_chunks);
- at 10^12-row scale single 16-bit chunks are hot keys, so chunk-PAIR bands
  (C(4,2)=6 bands of 32 bits) are also emitted — wider keys, ~2^32 key space —
  and single-chunk bands can be disabled (``use_single_chunk_bands=False``);
- every candidate bucket is VERIFIED: edges are only emitted between rows
  whose actual Hamming distance is <= ``hamming_threshold`` (unlike caption
  LSH, where the reference emits bucket edges unverified).

Skew is bounded with the same combiner pattern as the LSH stage: within each
Arrow batch, rows with identical pHash are star-linked immediately and only
one representative per *distinct pHash value* per (bucket, batch) enters the
global shuffle.

Output: verified candidate edge Dataset (src, dst) feeding the shared
connected-components stage.
"""

from __future__ import annotations

import functools
import itertools
import logging

import numpy as np
import pyarrow as pa

from .cc import dedup_pairs
from ..config import SimHashConfig
from ..functions.phash import popcount64

logger = logging.getLogger(__name__)


def _band_keys(ph: np.ndarray, cfg: SimHashConfig) -> list[tuple[int, np.ndarray]]:
    """[(band_id, key array uint64)] for each configured band."""
    u = ph.view(np.uint64) if ph.dtype == np.int64 else ph.astype(np.uint64)
    nc = cfg.num_chunks
    width = cfg.hash_bits // nc
    mask = np.uint64((1 << width) - 1)
    chunks = [(u >> np.uint64(i * width)) & mask for i in range(nc)]
    bands: list[tuple[int, np.ndarray]] = []
    band_id = 0
    if cfg.use_single_chunk_bands:
        for i in range(nc):
            bands.append((band_id, chunks[i]))
            band_id += 1
    for i, j in itertools.combinations(range(nc), 2):
        bands.append((band_id, (chunks[i] << np.uint64(width)) | chunks[j]))
        band_id += 1
    return bands


def _verified_edges(ids: np.ndarray, ph: np.ndarray, threshold: int, cap: int = 512) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs Hamming verification within one candidate set (ids unique,
    pHashes distinct). Beyond ``cap`` members, falls back to multi-pivot
    verification: every member is checked against ~16 pivots spread through
    the value-sorted set (logged; pairs far from every pivot are missed)."""
    m = len(ids)
    if m < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    u = ph.view(np.uint64) if ph.dtype == np.int64 else ph.astype(np.uint64)
    if m > cap:
        logger.warning(
            "simhash bucket with %d distinct values exceeds verify_cap=%d; "
            "falling back to multi-pivot verification (possible recall loss)",
            m,
            cap,
        )
        order = np.argsort(u)
        pivots = order[:: max(1, m // 16)][:16]
        srcs, dsts = [], []
        for p in pivots:
            d = popcount64(u ^ u[p])
            hit = np.flatnonzero((d <= threshold) & (np.arange(m) != p))
            srcs.append(np.full(len(hit), ids[p]))
            dsts.append(ids[hit])
        a = np.concatenate(srcs)
        b = np.concatenate(dsts)
        if len(a):
            return dedup_pairs(np.minimum(a, b), np.maximum(a, b))
        return a, b
    xor = u[:, None] ^ u[None, :]
    d = popcount64(xor.ravel()).reshape(m, m)
    iu, ju = np.triu_indices(m, k=1)
    ok = d[iu, ju] <= threshold
    a, b = ids[iu[ok]], ids[ju[ok]]
    return np.minimum(a, b), np.maximum(a, b)


def _local_simhash(batch: pa.Table, *, cfg: SimHashConfig, emit: str) -> pa.Table:
    """emit="edges" | "reps" | "both" — "both" runs the banding kernel ONCE
    and returns edges + reps in a null-padded union table (see lsh.py)."""
    ids = batch.column(cfg.id_field).to_numpy()
    ph = batch.column(cfg.hash_field).to_numpy()
    srcs, dsts = [], []
    rep_band, rep_key, rep_ph, rep_id = [], [], [], []
    want_edges = emit in ("edges", "both")
    want_reps = emit in ("reps", "both")

    # identical-pHash rows: star locally, keep one rep per distinct value
    order = np.argsort(ph, kind="stable")
    sph, sid = ph[order], ids[order]
    # empty blocks (empty parquet file / filtered-out block): reduceat on an
    # empty array raises, so short-circuit to empty runs
    if len(sph):
        run_starts = np.flatnonzero(np.concatenate([[True], sph[1:] != sph[:-1]]))
    else:
        run_starts = np.zeros(0, np.int64)
    run_min = np.minimum.reduceat(sid, run_starts) if len(run_starts) else sid[:0]
    sizes = np.diff(np.append(run_starts, len(sid)))
    if want_edges:
        member_src = np.repeat(run_min, sizes)
        mask = sid != member_src
        srcs.append(member_src[mask])
        dsts.append(sid[mask])

    # distinct-value representatives
    uph = sph[run_starts]
    uid = run_min
    for band_id, keys in _band_keys(uph, cfg):
        if want_reps:
            # every (band, distinct-pHash) row IS a representative — no
            # grouping needed, emit the whole band column vectorized
            rep_band.append(np.full(len(keys), band_id, np.int32))
            rep_key.append(keys)
            rep_ph.append(uph)
            rep_id.append(uid)
        if not want_edges:
            continue
        korder = np.argsort(keys, kind="stable")
        kk, kph, kid = keys[korder], uph[korder], uid[korder]
        starts = np.flatnonzero(np.concatenate([[True], kk[1:] != kk[:-1]]))
        ends = np.append(starts[1:], len(kk))
        ksizes = ends - starts
        # only multi-member runs need pairwise verification (rare)
        for r in np.flatnonzero(ksizes >= 2):
            s, e = starts[r], ends[r]
            a, b = _verified_edges(kid[s:e], kph[s:e], cfg.hamming_threshold, cfg.verify_cap)
            srcs.append(a)
            dsts.append(b)

    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    if want_edges and len(src):
        # the same verified pair can surface from several bands
        src, dst = dedup_pairs(src, dst)
    if emit == "edges":
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    # int64 band/key columns: Ray shuffles pickle uint64 above int64 range
    band = (np.concatenate(rep_band) if rep_band else np.zeros(0, np.int32)).astype(np.int64)
    key = (np.concatenate(rep_key) if rep_key else np.zeros(0, np.uint64)).astype(np.uint64).view(np.int64)
    phv = (np.concatenate(rep_ph) if rep_ph else np.zeros(0)).astype(np.int64).view(np.int64)
    rid = np.concatenate(rep_id) if rep_id else np.zeros(0, np.int64)
    reps_tbl = pa.table(
        {
            "band": pa.array(band, pa.int64()),
            "key": pa.array(key, pa.int64()),
            "phash": pa.array(phv, pa.int64()),
            "rid": pa.array(rid, pa.int64()),
        }
    )
    if emit == "reps":
        return reps_tbl
    nm, nr = len(src), len(rid)
    edges_part = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "band": pa.nulls(nm, pa.int64()),
            "key": pa.nulls(nm, pa.int64()),
            "phash": pa.nulls(nm, pa.int64()),
            "rid": pa.nulls(nm, pa.int64()),
        }
    )
    reps_part = pa.table(
        {
            "src": pa.nulls(nr, pa.int64()),
            "dst": pa.nulls(nr, pa.int64()),
            "band": reps_tbl.column("band"),
            "key": reps_tbl.column("key"),
            "phash": reps_tbl.column("phash"),
            "rid": reps_tbl.column("rid"),
        }
    )
    return pa.concat_tables([edges_part, reps_part])


def simhash_candidate_edges(ds, cfg: SimHashConfig, max_broadcast: int = 20_000_000):
    """Dataset with (id_field, hash_field) -> verified near-dup edge Dataset.

    Global stage: one sort of the representative rows co-locates every
    (band, key) bucket; a vectorized run scan verifies buckets in place
    (``max_broadcast`` is kept for signature compatibility; the sort-scan
    path has no broadcast table to bound).
    """
    import pyarrow.compute as pc
    import ray

    # one banding pass, materialized; edges/reps are cheap filters over it
    combined = ds.map_batches(
        functools.partial(_local_simhash, cfg=cfg, emit="both"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    local = combined.map_batches(
        lambda b: b.select(["src", "dst"]).filter(pc.is_valid(b.column("src"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,  # bundle tiny filtered blocks (see lsh.py)
    )
    reps = combined.map_batches(
        lambda b: b.select(["band", "key", "phash", "rid"]).filter(pc.is_valid(b.column("rid"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # per-bucket Hamming verification via the sortagg pattern: ONE sort of all
    # representative rows co-locates every (band, key) bucket, and the scan
    # verifies runs in place (singleton runs — the overwhelming majority —
    # are dropped vectorized; size-2 runs are verified by a single vectorized
    # xor-popcount; only runs >= 3 reach per-bucket Python).  An earlier
    # version first resolved duplicated buckets with dup_bucket_table and
    # sorted only their members — but that helper's own sort already moved the
    # full rep volume, so the pre-filter cost one extra full sort plus a
    # broadcast + membership pass for nothing (measured 2.5x slower at 1M
    # rows / 8.2M reps).
    scanned = (
        reps.sort(["band", "key"])
        .map_batches(
            functools.partial(_scan_verify_blocks, threshold=cfg.hamming_threshold, cap=cfg.verify_cap),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    import pyarrow.compute as pc

    global_edges = scanned.map_batches(
        lambda b: b.select(["src", "dst"]).filter(pc.is_valid(b.column("src"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,
    )
    # boundary rows: filter distributed, collect only the ~2-runs-per-block
    # remainder (streaming the full verified-edge volume through the driver
    # here was a measured serial-scaling cost)
    from .cc import _collect_small

    bt = _collect_small(
        scanned.map_batches(
            lambda b: b.filter(pc.is_valid(b.column("band"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1 << 20,
        ),
        ["band", "key", "phash", "rid"],
    )
    boundary_edges = _verify_boundary([bt] if bt.num_rows else [], cfg.hamming_threshold, cfg.verify_cap)
    return local.union(global_edges).union(ray.data.from_arrow(boundary_edges))


def _scan_verify_blocks(batch: pa.Table, *, threshold: int, cap: int = 512) -> pa.Table:
    """Per sorted block: verify interior (band, key) runs; pass boundary runs
    through (null-padded union table, same trick as cc._scan_propagate)."""
    n = len(batch)
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "band": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "phash": pa.array([], pa.int64()),
            "rid": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    band = batch.column("band").to_numpy()
    key = batch.column("key").to_numpy()
    ph = batch.column("phash").to_numpy()
    rid = batch.column("rid").to_numpy()
    new_run = np.concatenate([[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], n)
    sizes = ends - starts
    nruns = len(starts)
    boundary = np.zeros(nruns, dtype=bool)
    boundary[0] = True
    boundary[-1] = True
    srcs, dsts = [], []
    # size-2 interior runs (the bulk of duplicated buckets): vectorized
    # verify — identical pHash, or Hamming <= threshold — emitting the same
    # (min, max) edge _group_verify_arrays would
    two = np.flatnonzero(~boundary & (sizes == 2))
    if len(two):
        s2 = starts[two]
        p1, p2 = ph[s2].view(np.uint64), ph[s2 + 1].view(np.uint64)
        r1, r2 = rid[s2], rid[s2 + 1]
        ok = popcount64(p1 ^ p2) <= threshold  # covers the identical case (distance 0)
        if ok.any():
            srcs.append(np.minimum(r1[ok], r2[ok]))
            dsts.append(np.maximum(r1[ok], r2[ok]))
    for r in np.flatnonzero(~boundary & (sizes >= 3)):
        s, e = starts[r], ends[r]
        a, b = _group_verify_arrays(ph[s:e], rid[s:e], threshold, cap)
        srcs.append(a)
        dsts.append(b)
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    row_run = np.repeat(np.arange(nruns), ends - starts)
    pass_mask = boundary[row_run]
    np_ = int(pass_mask.sum())
    nm = len(src)
    msgs_t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "band": pa.nulls(nm, pa.int64()),
            "key": pa.nulls(nm, pa.int64()),
            "phash": pa.nulls(nm, pa.int64()),
            "rid": pa.nulls(nm, pa.int64()),
        }
    )
    pass_t = pa.table(
        {
            "src": pa.nulls(np_, pa.int64()),
            "dst": pa.nulls(np_, pa.int64()),
            "band": pa.array(band[pass_mask], pa.int64()),
            "key": pa.array(key[pass_mask], pa.int64()),
            "phash": pa.array(ph[pass_mask], pa.int64()),
            "rid": pa.array(rid[pass_mask], pa.int64()),
        }
    )
    return pa.concat_tables([msgs_t, pass_t])


def _group_verify_arrays(ph: np.ndarray, rid: np.ndarray, threshold: int, cap: int = 512) -> tuple[np.ndarray, np.ndarray]:
    """One bucket's members -> verified edges (dedup identical pHash + star,
    then pairwise Hamming among distinct values)."""
    order = np.argsort(ph, kind="stable")
    sph, sid = ph[order], rid[order]
    starts = np.flatnonzero(np.concatenate([[True], sph[1:] != sph[:-1]]))
    run_min = np.minimum.reduceat(sid, starts)
    sizes = np.diff(np.append(starts, len(sid)))
    member_src = np.repeat(run_min, sizes)
    mask = sid != member_src
    a, b = _verified_edges(run_min, sph[starts], threshold, cap)
    return np.concatenate([member_src[mask], a]), np.concatenate([sid[mask], b])


def _verify_boundary(btbls: list[pa.Table], threshold: int, cap: int = 512) -> pa.Table:
    """Driver-side verification of runs that crossed sorted-block boundaries."""
    if not btbls:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    t = pa.concat_tables(btbls)
    band = t.column("band").to_numpy()
    key = t.column("key").to_numpy()
    ph = t.column("phash").to_numpy()
    rid = t.column("rid").to_numpy()
    order = np.lexsort((key, band))
    band, key, ph, rid = band[order], key[order], ph[order], rid[order]
    starts = np.flatnonzero(np.concatenate([[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])]))
    ends = np.append(starts[1:], len(band))
    srcs, dsts = [], []
    for s, e in zip(starts, ends):
        a, b = _group_verify_arrays(ph[s:e], rid[s:e], threshold, cap)
        srcs.append(a)
        dsts.append(b)
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
