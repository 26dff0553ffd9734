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

import numpy as np
import pyarrow as pa

from ..config import SimHashConfig
from ..functions.phash import popcount64


def _band_keys(ph: np.ndarray, cfg: SimHashConfig) -> list[tuple[int, np.ndarray]]:
    """[(band_id, key array uint64)] for each configured band."""
    u = ph.view(np.uint64) if ph.dtype == np.int64 else ph.astype(np.uint64)
    nc = cfg.num_chunks
    width = 64 // nc
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
    pHashes distinct). Falls back to verify-vs-first beyond ``cap`` members."""
    m = len(ids)
    if m < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    u = ph.view(np.uint64) if ph.dtype == np.int64 else ph.astype(np.uint64)
    if m > cap:
        d = popcount64(u ^ u[0])
        hit = np.flatnonzero((d <= threshold) & (np.arange(m) != 0))
        return np.full(len(hit), ids[0]), ids[hit]
    xor = u[:, None] ^ u[None, :]
    d = popcount64(xor.ravel()).reshape(m, m)
    iu, ju = np.triu_indices(m, k=1)
    ok = d[iu, ju] <= threshold
    a, b = ids[iu[ok]], ids[ju[ok]]
    return np.minimum(a, b), np.maximum(a, b)


def _local_simhash(batch: pa.Table, *, cfg: SimHashConfig, emit: str) -> pa.Table:
    ids = batch.column(cfg.id_field).to_numpy()
    ph = batch.column(cfg.hash_field).to_numpy()
    srcs, dsts = [], []
    rep_band, rep_key, rep_ph, rep_id = [], [], [], []

    # identical-pHash rows: star locally, keep one rep per distinct value
    order = np.argsort(ph, kind="stable")
    sph, sid = ph[order], ids[order]
    run_starts = np.flatnonzero(np.concatenate([[True], sph[1:] != sph[:-1]]))
    run_min = np.minimum.reduceat(sid, run_starts)
    sizes = np.diff(np.append(run_starts, len(sid)))
    if emit == "edges":
        member_src = np.repeat(run_min, sizes)
        mask = sid != member_src
        srcs.append(member_src[mask])
        dsts.append(sid[mask])

    # distinct-value representatives
    uph = sph[run_starts]
    uid = run_min
    for band_id, keys in _band_keys(uph, cfg):
        korder = np.argsort(keys, kind="stable")
        kk, kph, kid = keys[korder], uph[korder], uid[korder]
        starts = np.flatnonzero(np.concatenate([[True], kk[1:] != kk[:-1]]))
        ends = np.append(starts[1:], len(kk))
        for s, e in zip(starts, ends):
            if emit == "edges" and e - s >= 2:
                a, b = _verified_edges(kid[s:e], kph[s:e], cfg.hamming_threshold)
                srcs.append(a)
                dsts.append(b)
            elif emit == "reps":
                rep_band.append(np.full(e - s, band_id, np.int32))
                rep_key.append(kk[s:e])
                rep_ph.append(kph[s:e])
                rep_id.append(kid[s:e])

    if emit == "edges":
        src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return pa.table(
        {
            "band": pa.array(np.concatenate(rep_band) if rep_band else np.zeros(0, np.int32), pa.int32()),
            "key": pa.array(
                (np.concatenate(rep_key) if rep_key else np.zeros(0, np.uint64)).astype(np.uint64), pa.uint64()
            ),
            "phash": pa.array(
                (np.concatenate(rep_ph) if rep_ph else np.zeros(0)).astype(np.int64).view(np.int64), pa.int64()
            ),
            "rid": pa.array(np.concatenate(rep_id) if rep_id else np.zeros(0, np.int64), pa.int64()),
        }
    )


def _global_verify(group: pa.Table, *, threshold: int) -> pa.Table:
    ph = group.column("phash").to_numpy()
    ids = group.column("rid").to_numpy()
    # across batches the same pHash value may repeat: dedup, star the ties
    order = np.argsort(ph, kind="stable")
    sph, sid = ph[order], ids[order]
    starts = np.flatnonzero(np.concatenate([[True], sph[1:] != sph[:-1]]))
    run_min = np.minimum.reduceat(sid, starts)
    sizes = np.diff(np.append(starts, len(sid)))
    member_src = np.repeat(run_min, sizes)
    mask = sid != member_src
    tie_src, tie_dst = member_src[mask], sid[mask]
    a, b = _verified_edges(run_min, sph[starts], threshold)
    return pa.table(
        {
            "src": pa.array(np.concatenate([tie_src, a]), pa.int64()),
            "dst": pa.array(np.concatenate([tie_dst, b]), pa.int64()),
        }
    )


def simhash_candidate_edges(ds, cfg: SimHashConfig):
    """Dataset with (id_field, hash_field) -> verified near-dup edge Dataset."""
    local = ds.map_batches(
        functools.partial(_local_simhash, cfg=cfg, emit="edges"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    reps = ds.map_batches(
        functools.partial(_local_simhash, cfg=cfg, emit="reps"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    global_edges = reps.groupby(["band", "key"]).map_groups(
        functools.partial(_global_verify, threshold=cfg.hamming_threshold), batch_format="pyarrow"
    )
    return local.union(global_edges)
