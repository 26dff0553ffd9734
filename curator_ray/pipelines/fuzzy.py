"""Fuzzy dedup workflow: minhash -> LSH -> edges -> connected components.

Ray-Data-native counterpart of the reference's
``FuzzyDeduplicationWorkflow.run()`` (``fuzzy/workflow.py:292-394``). Each
pipeline boundary that the reference materializes to its parquet ``cache_path``
is either a streaming ``write_parquet`` + re-read (when ``cache_dir`` is
given — resumable) or an object-store ``materialize()`` when several band
waves re-consume the signatures; a single all-bands wave keeps the
signatures lazy (one consumer, fused into the banding tasks).
"""

from __future__ import annotations

import os

from ..config import FuzzyDedupConfig
from ..stages.cc import connected_components, removal_ids
from ..stages.lsh import lsh_candidate_edges
from ..stages.minhash import minhash_stage
from ..state.manifest import CheckpointManifest, checkpointed, fingerprint


def fuzzy_candidate_edges(
    ds_with_ids,
    cfg: FuzzyDedupConfig,
    cache_dir: str | None = None,
    input_fingerprint: object | None = None,
):
    """Input (with ``cfg.id_field``) -> candidate duplicate edge Dataset.

    ``input_fingerprint`` (any stable identity of the input — a path, a row
    count + config, ...) opts the signature cache into manifest-skipped
    resume: a rerun with the same fingerprint reads the cached signatures
    instead of recomputing them (the reference FuzzyDeduplicationWorkflow's
    cache_path semantics). Without it the cache is write-through only —
    a bare ``cache_dir`` cannot prove the cached parquet matches THIS input,
    so it is never silently reused."""
    import ray

    sig = minhash_stage(ds_with_ids, cfg)
    step = max(1, cfg.bands_per_iteration)
    single_wave = step >= cfg.num_bands
    if cache_dir:
        sig_path = os.path.join(cache_dir, "minhash")
        if input_fingerprint is not None:
            manifest = CheckpointManifest(os.path.join(cache_dir, "_checkpoints"))
            sig = checkpointed(
                manifest,
                "minhash",
                "all",
                fingerprint(input_fingerprint, cfg),
                sig_path,
                lambda: sig,
            )
        else:
            os.makedirs(sig_path, exist_ok=True)
            # 16k rows/file: ~1 KB/row of signature ints -> ~16 MB files
            # instead of one file per upstream block (see state/manifest.py
            # checkpointed)
            sig.write_parquet(sig_path, min_rows_per_file=16_384)
            sig = ray.data.read_parquet(sig_path)
    elif not single_wave:
        # multiple band waves re-consume the signatures; keep them lazy when
        # one wave covers all bands (the banding kernel reads them exactly
        # once, so the signature matrix never hits the object store)
        sig = sig.materialize()

    edges = None
    for start in range(0, cfg.num_bands, step):
        wave = lsh_candidate_edges(sig, cfg, band_range=range(start, min(start + step, cfg.num_bands)))
        edges = wave if edges is None else edges.union(wave)
    return edges


def fuzzy_duplicate_ids(
    ds_with_ids,
    cfg: FuzzyDedupConfig,
    cache_dir: str | None = None,
    input_fingerprint: object | None = None,
):
    """Input -> (removal_ids Dataset sorted by _id, labels Dataset or None)."""
    edges = fuzzy_candidate_edges(
        ds_with_ids, cfg, cache_dir=cache_dir, input_fingerprint=input_fingerprint
    )
    labels = connected_components(edges, cfg)
    return removal_ids(labels), labels
