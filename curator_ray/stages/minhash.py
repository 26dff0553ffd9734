"""MinHash signature stage (Dataset -> Dataset).

Ray-Data-native equivalent of the reference's ``MinHashStage``
(``nemo_curator/stages/deduplication/fuzzy/minhash.py:179-339``): a stateless
``map_batches`` over zero-copy Arrow batches. The seed/permutation family is
identical (see ``curator_ray.functions.minhash_kernel``); the output is the
same projection the reference writes to its minhash cache parquet —
``[id_field, minhash_field]`` only (``minhash.py:322-326``) — so the wide LSH
shuffle never carries captions or image bytes.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..config import FuzzyDedupConfig
from ..functions.minhash_kernel import generate_seeds, minhash_signatures


def _minhash_batch(
    batch: pa.Table,
    *,
    seeds: np.ndarray,
    cfg: FuzzyDedupConfig,
    keep_fields: tuple[str, ...],
) -> pa.Table:
    sig = minhash_signatures(
        batch.column(cfg.text_field), seeds, cfg.char_ngrams, use_64bit=cfg.use_64bit_hash
    )
    value_type = pa.uint64() if cfg.use_64bit_hash else pa.uint32()
    sig_arr = pa.FixedSizeListArray.from_arrays(pa.array(sig.ravel(), value_type), cfg.num_hashes)
    cols = {f: batch.column(f) for f in keep_fields if f in batch.column_names}
    cols[cfg.minhash_field] = sig_arr
    return pa.table(cols)


def minhash_stage(ds, cfg: FuzzyDedupConfig, keep_fields: tuple[str, ...] | None = None):
    """Append minhash signatures, projecting down to (ids + signature).

    ``keep_fields`` defaults to just ``cfg.id_field``; pass extra columns to
    carry (e.g. ``image_id``) — but never pixels.
    """
    keep = keep_fields if keep_fields is not None else (cfg.id_field,)
    seeds = generate_seeds(cfg.num_hashes, cfg.seed, 64 if cfg.use_64bit_hash else 32)
    fn = functools.partial(_minhash_batch, seeds=seeds, cfg=cfg, keep_fields=tuple(keep))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
