"""Duplicate-removal anti-join.

Reference: ``stages/text/deduplication/removal.py:37-106`` (range-pruned
parquet reads + ``isin`` anti-filter) and
``stages/image/deduplication/removal.py:28-104`` (an id ``set`` loaded once
per worker). Both are broadcast anti-joins of a small removal list against a
large corpus.

Ray-Data-native version: the sorted removal-id array is put in the object
store ONCE (``ray.put``) and every ``map_batches`` task reads it zero-copy
from its node's plasma store (one copy per node, better than the reference's
per-actor copy) and filters with a vectorized ``np.isin``-style sorted search.
For removal lists too big to broadcast, ``remove_by_ids_join`` falls back to a
distributed hash anti-join.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _anti_filter(batch: pa.Table, *, removal_ref, id_field: str) -> pa.Table:
    """Drop rows whose id is in the broadcast (pre-sorted) removal array.
    Plain task, not an actor pool: per-batch ``ray.get`` of a read-only numpy
    array is a zero-copy plasma view (see lsh._star_emit for the rationale)."""
    import ray

    ids = ray.get(removal_ref) if not isinstance(removal_ref, np.ndarray) else removal_ref
    if len(ids) == 0:
        return batch
    col = batch.column(id_field).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    pos = np.searchsorted(ids, col)
    hit = np.zeros(len(col), dtype=bool)
    valid = pos < len(ids)
    hit[valid] = ids[pos[valid]] == col[valid]
    return batch.filter(pa.array(~hit))


def remove_by_ids(ds, removal_ids_ds, id_field: str = "_id", concurrency: int | None = None):
    """Broadcast anti-join: drop corpus rows whose ``id_field`` is listed.

    ``removal_ids_ds``: Dataset with an ``_id`` column (or a numpy array).
    """
    import ray

    if isinstance(removal_ids_ds, np.ndarray):
        arr = removal_ids_ds.astype(np.int64)
    else:
        parts = [
            pa.table(b).column("_id").to_numpy(zero_copy_only=False)
            for b in removal_ids_ds.iter_batches(batch_format="pyarrow")
        ]
        arr = np.concatenate(parts).astype(np.int64) if parts else np.zeros(0, np.int64)
    ref = ray.put(np.sort(arr))
    return ds.map_batches(
        functools.partial(_anti_filter, removal_ref=ref, id_field=id_field),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def remove_by_ids_join(ds, removal_ids_ds, id_field: str = "_id", num_partitions: int = 64):
    """Distributed anti-join for removal lists too large to broadcast."""
    flagged = removal_ids_ds.map_batches(
        lambda b: pa.table({"_id": b.column("_id"), "__rm": pa.array(np.ones(len(b), np.int8))}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = ds.join(
        flagged,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_field,),
        right_on=("_id",),
    )
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("__rm"))).drop_columns(["__rm"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
