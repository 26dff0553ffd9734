"""curator_ray — a Ray-Data-native data-curation / deduplication engine.

A from-scratch reimplementation of the query & data-processing capabilities of
NVIDIA-NeMo/Curator (reference: /root/reference) expressed as idiomatic Ray Data
pipelines: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, ``groupby``/``aggregate`` for the wide steps.

Subpackages
-----------
- ``functions``: vectorized kernels (murmur3, shingling, phash, PNG codec, text stats)
- ``sources``: readers/writers (parquet, jsonl, lance-gated) + synthetic data gen
- ``stages``: Dataset -> Dataset operators (minhash, lsh, cc, exact, semantic, ...)
- ``pipelines``: end-to-end workflows composing stages
- ``state``: checkpoint manifests for mid-stage resume
"""

__version__ = "0.1.0"
