"""LSH banding -> candidate edges, with per-batch partial aggregation.

The reference melts signatures into (doc_id, bucket_id) long form and runs a
full shuffle on bucket_id before grouping (``fuzzy/lsh/lsh.py:152-256``), then
emits pairwise-chain edges per bucket (``fuzzy/buckets_to_edges.py:72-84``).

At 10^12 rows the long-form shuffle is the bottleneck and hot buckets (constant
captions) are an unbounded skew hazard, so this implementation pushes a
combiner into ``map_batches`` (the standard pre-aggregation pattern):

- within each Arrow batch, rows sharing a bucket are connected immediately by
  *star* edges to the batch-local minimum id (same connectivity the reference's
  pairwise chain provides, but diameter 2, which bounds the rounds the
  distributed connected-components stage needs);
- only ONE representative row per (bucket, batch) — ``(bucket, local_min,
  count)`` — enters the global shuffle, so a bucket containing a million copies
  of the same caption contributes at most ``num_blocks`` rows to the groupby
  instead of a million (bounded-size band buckets per the north rule);
- the global ``groupby(bucket)`` stars the representatives together and drops
  global singletons (``lsh.py:250-254`` semantics).

Bucket keys are 128-bit (murmur3_x64_128 of the band slice, seeded by band
index) matching the collision behavior of the reference's md5 band keys.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .cc import dedup_pairs
from ..config import FuzzyDedupConfig
from ..functions.murmur import murmur3_x64_128

EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def band_hashes(sig: np.ndarray, band_range: range, minhashes_per_band: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, num_bands) 128-bit band keys as (hi, lo) uint64 matrices."""
    n = sig.shape[0]
    his = np.empty((n, len(band_range)), dtype=np.uint64)
    los = np.empty((n, len(band_range)), dtype=np.uint64)
    for j, b in enumerate(band_range):
        sl = np.ascontiguousarray(sig[:, b * minhashes_per_band : (b + 1) * minhashes_per_band])
        rows = sl.view(np.uint8).reshape(n, -1)
        h1, h2 = murmur3_x64_128(rows, seed=b + 1)
        his[:, j] = h1
        los[:, j] = h2
    return his, los


def _sig_matrix(batch: pa.Table, minhash_field: str) -> np.ndarray:
    col = batch.column(minhash_field)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = col.type.list_size
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), width)


def _bucket_runs(hi: np.ndarray, lo: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sort order + run boundaries for the (hi, lo) key pairs."""
    order = np.lexsort((lo, hi))
    shi, slo = hi[order], lo[order]
    new_run = np.empty(len(order), dtype=bool)
    new_run[0] = True
    np.not_equal(shi[1:], shi[:-1], out=new_run[1:])
    new_run[1:] |= slo[1:] != slo[:-1]
    return order, np.flatnonzero(new_run)


def _local_bands_batch(
    batch: pa.Table, *, cfg: FuzzyDedupConfig, band_range: range, emit: str
) -> pa.Table:
    """Shared kernel for the outputs of the banding pass.

    emit="edges": batch-local star edges (src=local min, dst=other members).
    emit="reps":  one (bucket_hi, bucket_lo, rep, cnt) row per (bucket, batch).
    emit="both":  edges AND reps (no cnt) in one null-padded union table —
                  ONE banding pass feeds both consumers (band_hashes over
                  every row x band is the expensive part; running the kernel
                  twice measurably caps single-node scaling).
    """
    sig = _sig_matrix(batch, cfg.minhash_field)
    ids = batch.column(cfg.id_field).to_numpy()
    n, nb = len(ids), len(band_range)
    if n == 0:
        if emit == "edges":
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        if emit == "both":
            return _BOTH_EMPTY
        return pa.table(
            {
                "bucket_hi": pa.array([], pa.int64()),
                "bucket_lo": pa.array([], pa.int64()),
                "rep": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    his, los = band_hashes(sig, band_range, cfg.minhashes_per_band)
    # Band-major flattening, but _bucket_runs lexsorts ALL bands together:
    # bucket separation across bands relies on the per-band seed in
    # band_hashes making cross-band 128-bit key collisions negligible
    # (2^-128 per pair), NOT on layout. If the key ever narrows below 128
    # bits, add the band id to the run key.
    flat_hi = his.T.ravel()
    flat_lo = los.T.ravel()
    flat_id = np.tile(ids, nb)
    order, run_starts = _bucket_runs(flat_hi, flat_lo)
    sid = flat_id[order]
    run_ends = np.append(run_starts[1:], len(sid))
    run_min = np.minimum.reduceat(sid, run_starts)
    sizes = run_ends - run_starts

    if emit in ("edges", "both"):
        multi = sizes > 1
        if multi.any():
            member_src = np.repeat(run_min, sizes)
            mask = sid != member_src
            # the same pair is emitted by every band that buckets it together —
            # dedup within the batch (up to num_bands x fewer edge rows shuffled)
            src, dst = dedup_pairs(member_src[mask], sid[mask])
        else:
            src = dst = np.zeros(0, np.int64)
        if emit == "edges":
            return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})

    # bucket keys as bit-identical int64 views: Ray's groupby aggregate
    # pickles uint64 columns whose values exceed the int64 range
    rep_hi = flat_hi[order][run_starts].view(np.int64)
    rep_lo = flat_lo[order][run_starts].view(np.int64)
    if emit == "reps":
        return pa.table(
            {
                "bucket_hi": pa.array(rep_hi, pa.int64()),
                "bucket_lo": pa.array(rep_lo, pa.int64()),
                "rep": pa.array(run_min, pa.int64()),
                "cnt": pa.array(sizes.astype(np.int64), pa.int64()),
            }
        )
    nm, nr = len(src), len(run_min)
    edges_part = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "bucket_hi": pa.nulls(nm, pa.int64()),
            "bucket_lo": pa.nulls(nm, pa.int64()),
            "rep": pa.nulls(nm, pa.int64()),
        }
    )
    reps_part = pa.table(
        {
            "src": pa.nulls(nr, pa.int64()),
            "dst": pa.nulls(nr, pa.int64()),
            "bucket_hi": pa.array(rep_hi, pa.int64()),
            "bucket_lo": pa.array(rep_lo, pa.int64()),
            "rep": pa.array(run_min, pa.int64()),
        }
    )
    return pa.concat_tables([edges_part, reps_part])


_BOTH_EMPTY = pa.table(
    {
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "bucket_hi": pa.array([], pa.int64()),
        "bucket_lo": pa.array([], pa.int64()),
        "rep": pa.array([], pa.int64()),
    }
)


def _global_star(group: pa.Table) -> pa.Table:
    uniq = np.unique(group.column("rep").to_numpy())
    if len(uniq) <= 1:
        # single representative: either a global singleton (no duplicates,
        # lsh.py:250-254) or a bucket whose members all sat in one batch and
        # are already star-connected locally — no global edge needed either way
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    m = uniq[0]
    return pa.table({"src": pa.array(np.full(len(uniq) - 1, m), pa.int64()), "dst": pa.array(uniq[1:], pa.int64())})


def _star_emit(batch: pa.Table, *, packed_ref) -> pa.Table:
    """Emit (bucket_min_rep -> rep) star edges for reps whose bucket is in the
    broadcast duplicated-bucket table.

    A plain task, NOT an actor pool: the broadcast is a read-only numpy tuple,
    so per-batch ``ray.get`` is a zero-copy plasma view, and tasks run in the
    pre-warmed default worker pool — actor pools here paid a fresh-process
    page-fault cold start per actor and capped the stage at its pool size."""
    import ray

    from ..functions.packkeys import lookup_sorted, pack_u128

    keys, vals = ray.get(packed_ref) if not isinstance(packed_ref, tuple) else packed_ref
    hi = batch.column("bucket_hi").to_numpy().view(np.uint64)
    lo = batch.column("bucket_lo").to_numpy().view(np.uint64)
    rep = batch.column("rep").to_numpy()
    found, minrep = lookup_sorted(keys, vals, pack_u128(hi, lo))
    mask = found & (rep != minrep)
    return pa.table(
        {"src": pa.array(minrep[mask], pa.int64()), "dst": pa.array(rep[mask], pa.int64())}
    )


def _global_star_broadcast(reps, cfg: FuzzyDedupConfig):
    """Scalable global stage: native vectorized aggregate (no per-group Python)
    + broadcast (bucket -> min rep) lookup.

    The reference's LSH shuffles ALL (doc, bucket) rows and groups them
    (``lsh.py:189-256``); at 10^12 rows almost every bucket is a singleton, so
    per-bucket UDF calls dominate (measured: ~20M tiny groups for a 1M-row
    corpus). Instead: ``groupby.aggregate(Count, Min)`` — fully vectorized —
    then only buckets represented in >= 2 blocks (a tiny fraction) are
    broadcast as a sorted 128-bit-key table, and a second stateless pass over
    the representatives emits star edges via binary-search lookup.
    """
    import logging

    import ray

    from ..functions.packkeys import pack_u128
    from .sortagg import DupBucketOverflow, dup_bucket_table, global_star_sorted

    try:
        dup = dup_bucket_table(reps, ["bucket_hi", "bucket_lo"], max_rows=cfg.max_broadcast_buckets)
    except DupBucketOverflow as exc:
        # more duplicated buckets than the driver can broadcast — finish the
        # job in sortscan mode (no driver table) instead of aborting
        logging.getLogger(__name__).warning("%s; retrying in sortscan mode", exc)
        return global_star_sorted(reps, ["bucket_hi", "bucket_lo"], rep_col="rep")
    hi = dup.column("bucket_hi").to_numpy().view(np.uint64)
    lo = dup.column("bucket_lo").to_numpy().view(np.uint64)
    minrep = dup.column("min_rep").to_numpy().astype(np.int64)
    packed = pack_u128(hi, lo)
    order = np.argsort(packed)
    ref = ray.put((packed[order], minrep[order]))
    return reps.map_batches(
        functools.partial(_star_emit, packed_ref=ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,
    )


def lsh_candidate_edges(ds_sig, cfg: FuzzyDedupConfig, band_range: range | None = None):
    """Signature Dataset -> candidate edge Dataset (src, dst) int64.

    Point ``ds_sig`` at the materialized minhash cache, not at the raw
    pipeline, so minhash isn't recomputed (the reference persists its minhash
    parquet between pipelines for the same reason,
    ``fuzzy/workflow.py:200-255``).
    """
    import pyarrow.compute as pc

    band_range = band_range if band_range is not None else range(cfg.num_bands)
    # ONE banding pass (band_hashes over rows x bands is the dominant kernel)
    # emitting local edges + representatives in a null-padded union table,
    # materialized once; both consumers below are cheap filters over it
    combined = ds_sig.map_batches(
        functools.partial(_local_bands_batch, cfg=cfg, band_range=band_range, emit="both"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    local = combined.map_batches(
        lambda b: b.select(["src", "dst"]).filter(pc.is_valid(b.column("src"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,  # bundle tiny filtered blocks: micro-task overhead, not work, dominated here
    )
    reps = combined.map_batches(
        lambda b: b.select(["bucket_hi", "bucket_lo", "rep"]).filter(pc.is_valid(b.column("rep"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 20,
    )
    if cfg.global_bucket_mode == "sortscan":
        from .sortagg import global_star_sorted

        global_edges = global_star_sorted(reps, ["bucket_hi", "bucket_lo"], rep_col="rep")
    elif cfg.global_bucket_mode == "broadcast":
        global_edges = _global_star_broadcast(reps, cfg)
    else:
        global_edges = reps.groupby(["bucket_hi", "bucket_lo"]).map_groups(
            _global_star, batch_format="pyarrow"
        )
    return local.union(global_edges)


def buckets_to_edges(ids: list[int], mode: str = "chain") -> list[tuple[int, int]]:
    """Reference-parity helper: one bucket's id list -> edges.

    mode="chain" reproduces the reference's consecutive-pair emission
    (``fuzzy/buckets_to_edges.py:75-81``); mode="star" is what the pipeline
    uses (same connectivity, diameter 2).
    """
    ids = sorted(ids)
    if len(ids) < 2:
        return []
    if mode == "chain":
        return list(zip(ids[:-1], ids[1:]))
    return [(ids[0], x) for x in ids[1:]]
