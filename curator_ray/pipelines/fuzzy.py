"""Fuzzy dedup workflow: minhash -> LSH -> edges -> connected components.

Ray-Data-native counterpart of the reference's
``FuzzyDeduplicationWorkflow.run()`` (``fuzzy/workflow.py:292-394``). Each
pipeline boundary that the reference materializes to its parquet ``cache_path``
is either a streaming ``write_parquet`` + re-read (when ``cache_dir`` is
given — resumable, and required because the LSH stage consumes the signature
table twice) or an object-store ``materialize()`` for in-memory runs.
"""

from __future__ import annotations

import os

from ..config import FuzzyDedupConfig
from ..stages.cc import connected_components, removal_ids
from ..stages.lsh import lsh_candidate_edges
from ..stages.minhash import minhash_stage


def fuzzy_candidate_edges(ds_with_ids, cfg: FuzzyDedupConfig, cache_dir: str | None = None):
    """Input (with ``cfg.id_field``) -> candidate duplicate edge Dataset."""
    import ray

    sig = minhash_stage(ds_with_ids, cfg)
    if cache_dir:
        sig_path = os.path.join(cache_dir, "minhash")
        os.makedirs(sig_path, exist_ok=True)
        sig.write_parquet(sig_path)
        sig = ray.data.read_parquet(sig_path)
    else:
        sig = sig.materialize()

    edges = None
    bands = range(cfg.num_bands)
    step = max(1, cfg.bands_per_iteration)
    for start in range(0, cfg.num_bands, step):
        wave = lsh_candidate_edges(sig, cfg, band_range=range(start, min(start + step, cfg.num_bands)))
        edges = wave if edges is None else edges.union(wave)
    return edges


def fuzzy_duplicate_ids(ds_with_ids, cfg: FuzzyDedupConfig, cache_dir: str | None = None):
    """Input -> (removal_ids Dataset sorted by _id, labels Dataset or None)."""
    edges = fuzzy_candidate_edges(ds_with_ids, cfg, cache_dir=cache_dir)
    labels = connected_components(edges, cfg)
    return removal_ids(labels), labels
