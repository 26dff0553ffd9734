"""Exact deduplication: content-hash groupby + keep-first.

Reference semantics (``nemo_curator/stages/deduplication/exact/
identification.py:113-268``): md5(text) as the group key, hash-shuffle, keep
one row per group, emit the rest as sorted removal ids.

Ray-Data-native version with a combiner: the content hash is a 128-bit
murmur3 (collision-equivalent to md5 for grouping); inside each ``map_batches``
block all-but-the-min rows of a batch-local hash group are *already known*
duplicates and are emitted directly, so the global ``groupby`` only sees one
representative (hash, local_min_id) row per (hash, block) — the same
pre-aggregation that caps skew in the LSH stage. A million identical captions
cost the shuffle ``num_blocks`` rows, not a million.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..functions.murmur import hash_bytes_grouped, murmur3_x64_128
from ..functions.shingles import _string_array_buffers


def content_hash128(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) uint64 murmur3_x64_128 of each string in the column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null(b"" if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) else "")
    data, offsets = _string_array_buffers(arr)
    lengths = offsets[1:] - offsets[:-1]
    m = len(lengths)
    hi = np.zeros(m, dtype=np.uint64)
    lo = np.zeros(m, dtype=np.uint64)
    order = np.argsort(lengths, kind="stable")
    sorted_len = lengths[order]
    boundaries = np.flatnonzero(np.diff(sorted_len)) + 1
    for grp in np.split(order, boundaries):
        if len(grp) == 0:
            continue
        length = int(lengths[grp[0]])
        if length == 0:
            mat = np.zeros((len(grp), 0), dtype=np.uint8)
        else:
            # row-gather from a zero-copy sliding-window view — avoids the
            # (m, L) int64 index-matrix allocation (see murmur.hash_bytes_grouped)
            win = np.lib.stride_tricks.sliding_window_view(data, length)
            mat = win[offsets[:-1][grp]]
        h1, h2 = murmur3_x64_128(mat, seed=0)
        hi[grp], lo[grp] = h1, h2
    return hi, lo


def _local_exact(batch: pa.Table, *, text_field: str, id_field: str, emit: str) -> pa.Table:
    hi, lo = content_hash128(batch.column(text_field))
    ids = batch.column(id_field).to_numpy()
    order = np.lexsort((ids, lo, hi))
    shi, slo, sid = hi[order], lo[order], ids[order]
    new_run = np.empty(len(order), dtype=bool)
    if len(order) == 0:
        new_run = new_run
    else:
        new_run[0] = True
        new_run[1:] = (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])
    run_starts = np.flatnonzero(new_run)
    if emit == "removals":
        # everything that is not the first (min-id) row of its batch-local run
        keep_first = np.zeros(len(order), dtype=bool)
        keep_first[run_starts] = True
        return pa.table({"_id": pa.array(sid[~keep_first], pa.int64())})
    sizes = np.diff(np.append(run_starts, len(order)))
    # int64 views of the 128-bit hash: Ray aggregates pickle uint64 columns
    # whose values exceed the int64 range
    reps_t = pa.table(
        {
            "hash_hi": pa.array(shi[run_starts].view(np.int64), pa.int64()),
            "hash_lo": pa.array(slo[run_starts].view(np.int64), pa.int64()),
            "rep": pa.array(sid[run_starts], pa.int64()),
            "cnt": pa.array(sizes.astype(np.int64), pa.int64()),
        }
    )
    if emit == "reps":
        return reps_t
    # emit == "both": null-padded union of removals + reps so the content
    # hashing runs ONCE per row (same trick as lsh/simhash/substring)
    keep_first = np.zeros(len(order), dtype=bool)
    keep_first[run_starts] = True
    rem = sid[~keep_first]
    nrem, nrep = len(rem), reps_t.num_rows
    rem_t = pa.table(
        {
            "_id": pa.array(rem, pa.int64()),
            "hash_hi": pa.nulls(nrem, pa.int64()),
            "hash_lo": pa.nulls(nrem, pa.int64()),
            "rep": pa.nulls(nrem, pa.int64()),
            "cnt": pa.nulls(nrem, pa.int64()),
        }
    )
    reps_pad = pa.table(
        {
            "_id": pa.nulls(nrep, pa.int64()),
            "hash_hi": reps_t.column("hash_hi"),
            "hash_lo": reps_t.column("hash_lo"),
            "rep": reps_t.column("rep"),
            "cnt": reps_t.column("cnt"),
        }
    )
    return pa.concat_tables([rem_t, reps_pad])


def _global_keep_first(group: pa.Table) -> pa.Table:
    reps = np.sort(group.column("rep").to_numpy())
    return pa.table({"_id": pa.array(reps[1:], pa.int64())})


def _removal_emit(batch: pa.Table, *, packed_ref) -> pa.Table:
    """A representative whose content hash is in the broadcast duplicated-hash
    table and is not the global min id is a removal. Plain task (zero-copy
    per-batch ray.get), not an actor pool — see lsh._star_emit."""
    import ray

    from ..functions.packkeys import lookup_sorted, pack_u128

    keys, vals = ray.get(packed_ref)
    hi = batch.column("hash_hi").to_numpy().view(np.uint64)
    lo = batch.column("hash_lo").to_numpy().view(np.uint64)
    rep = batch.column("rep").to_numpy()
    found, minrep = lookup_sorted(keys, vals, pack_u128(hi, lo))
    mask = found & (rep != minrep)
    return pa.table({"_id": pa.array(rep[mask], pa.int64())})


def exact_duplicate_ids(
    ds,
    text_field: str = "caption",
    id_field: str = "_id",
    global_mode: str = "sortscan",
    max_broadcast: int = 20_000_000,
):
    """Dataset -> sorted Dataset[(_id,)] of rows to remove (keep min id per
    identical-text group). ``ds`` is consumed exactly once (a single hashing
    pass feeds both the local-removal and representative streams).

    ``global_mode="sortscan"`` (default) resolves cross-block duplicate
    groups with one sort of the representatives + a vectorized run scan (no
    driver table, no broadcast bound); ``"broadcast"`` keeps the aggregate +
    broadcast-lookup path; ``"groupby"`` is the map_groups fallback.
    """
    import pyarrow.compute as pc

    # ONE hashing pass emitting a null-padded union of removals + reps,
    # materialized; the two consumers are cheap validity filters over it
    # (hashing every caption twice — once per consumer — measured ~2x the
    # stage cost at 1M rows)
    combined = ds.map_batches(
        functools.partial(_local_exact, text_field=text_field, id_field=id_field, emit="both"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    local_removals = combined.map_batches(
        lambda b: b.select(["_id"]).filter(pc.is_valid(b.column("_id"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,  # bundle tiny filtered blocks (see lsh.py)
    )
    reps = combined.map_batches(
        lambda b: b.select(["hash_hi", "hash_lo", "rep", "cnt"]).filter(pc.is_valid(b.column("rep"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if global_mode == "sortscan":
        from .sortagg import global_star_sorted

        # the non-min representative of every duplicated hash IS the removal
        star = global_star_sorted(reps, ["hash_hi", "hash_lo"], rep_col="rep")
        global_removals = star.map_batches(
            lambda b: pa.table({"_id": b.column("dst")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1 << 20,
        )
    elif global_mode == "broadcast":
        import logging

        import ray

        from ..functions.packkeys import pack_u128
        from .sortagg import DupBucketOverflow, dup_bucket_table, global_star_sorted

        try:
            dup = dup_bucket_table(reps, ["hash_hi", "hash_lo"], max_rows=max_broadcast)
        except DupBucketOverflow as exc:
            # degrade to the driver-table-free sortscan path instead of aborting
            logging.getLogger(__name__).warning("%s; retrying in sortscan mode", exc)
            star = global_star_sorted(reps, ["hash_hi", "hash_lo"], rep_col="rep")
            return (
                local_removals.union(
                    star.map_batches(
                        lambda b: pa.table({"_id": b.column("dst")}),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                        batch_size=1 << 20,
                    )
                ).sort("_id")
            )
        packed = pack_u128(
            dup.column("hash_hi").to_numpy().view(np.uint64),
            dup.column("hash_lo").to_numpy().view(np.uint64),
        )
        minrep = dup.column("min_rep").to_numpy().astype(np.int64)
        order = np.argsort(packed)
        ref = ray.put((packed[order], minrep[order]))
        global_removals = reps.map_batches(
            functools.partial(_removal_emit, packed_ref=ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        global_removals = reps.groupby(["hash_hi", "hash_lo"]).map_groups(
            _global_keep_first, batch_format="pyarrow"
        )
    return local_removals.union(global_removals).sort("_id")
