"""Deterministic int64 row ids.

The reference assigns monotonically increasing int64 ids through a global
detached ``IdGenerator`` actor (``stages/deduplication/id_generator.py:30-137``).
A global counter actor is a scalability and resumability liability on a
256-node cluster, so this engine derives ids as a *pure function* of a unique
key column instead: ``_id = int64(murmur3_x64_128(key).h1)``.

Collision math: at 10^12 rows a 64-bit hash expects ~2.7e4 colliding rows
(3e-8 of the corpus) which can only cause a non-duplicate to be removed —
well inside the 1% duplicate-count tolerance and the 0.99 recall budget.
Tables that already carry an int64 unique key (``doc_id``, ``vec_id``) use it
directly. Because the id is a pure function of the key, any stage (e.g. the
removal anti-join) can recompute it without a join or a lookup actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.murmur import murmur3_x64_128
from ..functions.shingles import _string_array_buffers

ID_FIELD = "_id"


def hash_ids_from_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """int64 ids from a string key column (vectorized murmur128 h1)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, offsets = _string_array_buffers(arr)
    lengths = offsets[1:] - offsets[:-1]
    from ..functions.murmur import hash_bytes_grouped

    h = hash_bytes_grouped(data, offsets[:-1], lengths, seed=0, bits=64)
    return h.view(np.int64)


def add_id_column(batch: pa.Table, key_field: str = "image_id", id_field: str = ID_FIELD) -> pa.Table:
    """map_batches fn: append the deterministic ``_id`` column."""
    key = batch.column(key_field)
    if pa.types.is_integer(key.type):
        ids = key.cast(pa.int64())
        return batch.append_column(id_field, ids)
    ids = hash_ids_from_strings(key)
    return batch.append_column(id_field, pa.array(ids, pa.int64()))


def with_ids(ds, key_field: str = "image_id", id_field: str = ID_FIELD):
    """Dataset -> Dataset with the ``_id`` column appended."""
    import functools

    fn = functools.partial(add_id_column, key_field=key_field, id_field=id_field)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
