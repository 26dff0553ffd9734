"""Exact-substring duplicate-span stage (Dataset -> candidate edges).

Distributed strategy (SURVEY.md §2.7, M4): winnowed rolling-hash window
fingerprints (``curator_ray.functions.winnow``) bucket documents that share an
exact substring of length >= ``min_match_length``; buckets become star edges
into the shared connected-components stage, with the same per-batch combiner
(identical fingerprints star-linked locally, one representative per
(fingerprint, batch) in the global shuffle).

Guarantee: any shared span of >= fp_len + winnow_window - 1 bytes shares a
selected fingerprint; collisions of the 64-bit rolling hash are the only
false-positive source (~2^-64 per pair).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..functions.winnow import batch_fingerprints, doc_fingerprints  # noqa: F401
from .cc import dedup_pairs


def _local_substring(
    batch: pa.Table, *, text_field: str, id_field: str, fp_len: int, winnow_window: int, emit: str
) -> pa.Table:
    ids = batch.column(id_field).to_numpy()
    all_fp, doc_idx = batch_fingerprints(batch.column(text_field), fp_len, winnow_window)
    if len(all_fp) == 0:
        if emit == "edges":
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        if emit == "both":
            return _BOTH_EMPTY
        return pa.table({"fp": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())})
    # per-doc unique fingerprints
    d_idx, fp64 = dedup_pairs(doc_idx, all_fp.view(np.int64))
    fp = fp64.view(np.uint64)
    rid = ids[d_idx]
    order = np.argsort(fp, kind="stable")
    sfp, sid = fp[order], rid[order]
    starts = np.flatnonzero(np.concatenate([[True], sfp[1:] != sfp[:-1]]))
    run_min = np.minimum.reduceat(sid, starts)
    sizes = np.diff(np.append(starts, len(sfp)))
    src = dst = np.zeros(0, np.int64)
    if emit in ("edges", "both"):
        member_src = np.repeat(run_min, sizes)
        mask = sid != member_src
        # many shared fingerprints emit the same pair — dedup within the batch
        src, dst = dedup_pairs(member_src[mask], sid[mask])
        if emit == "edges":
            return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    # int64 view: Ray aggregates pickle uint64 columns above the int64 range
    rep_fp = sfp[starts].view(np.int64)
    if emit == "reps":
        return pa.table({"fp": pa.array(rep_fp, pa.int64()), "rep": pa.array(run_min, pa.int64())})
    nm, nr = len(src), len(run_min)
    return pa.concat_tables(
        [
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                    "fp": pa.nulls(nm, pa.int64()),
                    "rep": pa.nulls(nm, pa.int64()),
                }
            ),
            pa.table(
                {
                    "src": pa.nulls(nr, pa.int64()),
                    "dst": pa.nulls(nr, pa.int64()),
                    "fp": pa.array(rep_fp, pa.int64()),
                    "rep": pa.array(run_min, pa.int64()),
                }
            ),
        ]
    )


_BOTH_EMPTY = pa.table(
    {
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "fp": pa.array([], pa.int64()),
        "rep": pa.array([], pa.int64()),
    }
)


def _global_star(group: pa.Table) -> pa.Table:
    reps = np.unique(group.column("rep").to_numpy())
    if len(reps) < 2:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    return pa.table(
        {"src": pa.array(np.full(len(reps) - 1, reps[0]), pa.int64()), "dst": pa.array(reps[1:], pa.int64())}
    )


def _fp_emit(batch: pa.Table, *, packed_ref) -> pa.Table:
    """Emit (min_rep -> rep) for fingerprints present in >= 2 blocks
    (broadcast sorted fingerprint -> min rep table). Plain task (zero-copy
    per-batch ray.get) — see lsh._star_emit."""
    import ray

    keys, vals = ray.get(packed_ref)
    fp = batch.column("fp").to_numpy()
    rep = batch.column("rep").to_numpy()
    if len(keys) == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    pos = np.searchsorted(keys, fp)
    found = np.zeros(len(fp), dtype=bool)
    valid = pos < len(keys)
    found[valid] = keys[pos[valid]] == fp[valid]
    minrep = np.zeros(len(fp), dtype=np.int64)
    minrep[found] = vals[pos[found]]
    mask = found & (rep != minrep)
    return pa.table({"src": pa.array(minrep[mask], pa.int64()), "dst": pa.array(rep[mask], pa.int64())})


def _global_fp_broadcast(reps, max_broadcast: int = 20_000_000):
    import logging

    import ray

    from .sortagg import DupBucketOverflow, dup_bucket_table, global_star_sorted

    try:
        dup = dup_bucket_table(reps, ["fp"], max_rows=max_broadcast)
    except DupBucketOverflow as exc:
        # degrade to the driver-table-free sortscan path instead of aborting
        logging.getLogger(__name__).warning("%s; retrying in sortscan mode", exc)
        return global_star_sorted(reps, ["fp"], rep_col="rep")
    keys = dup.column("fp").to_numpy().astype(np.int64)
    vals = dup.column("min_rep").to_numpy().astype(np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))
    return reps.map_batches(
        functools.partial(_fp_emit, packed_ref=ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,
    )


def substring_candidate_edges(
    ds,
    min_match_length: int = 50,
    text_field: str = "caption",
    id_field: str = "_id",
    winnow_window: int = 8,
    global_mode: str = "sortscan",
):
    """Documents sharing an exact span >= min_match_length -> edges.

    fp_len is chosen so the winnowing guarantee covers min_match_length:
    fp_len + winnow_window - 1 == min_match_length. The global stage uses the
    vectorized aggregate + broadcast pattern by default (see lsh.py), with a
    ``groupby`` map_groups fallback.
    """
    import pyarrow.compute as pc

    fp_len = max(4, min_match_length - winnow_window + 1)
    kw = dict(
        text_field=text_field, id_field=id_field, fp_len=fp_len, winnow_window=winnow_window
    )
    # one fingerprinting pass (the rolling-hash scan dominates), materialized;
    # edges/reps are cheap validity filters over it
    combined = ds.map_batches(
        functools.partial(_local_substring, emit="both", **kw),
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
        lambda b: b.select(["fp", "rep"]).filter(pc.is_valid(b.column("rep"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,
    )
    if global_mode == "sortscan":
        from .sortagg import global_star_sorted

        return local.union(global_star_sorted(reps, ["fp"], rep_col="rep"))
    if global_mode == "broadcast":
        return local.union(_global_fp_broadcast(reps))
    return local.union(reps.groupby("fp").map_groups(_global_star, batch_format="pyarrow"))
