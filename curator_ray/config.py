"""Configuration dataclasses for the dedup stages.

Defaults mirror the reference's fuzzy workflow defaults
(``nemo_curator/stages/deduplication/fuzzy/workflow.py:76-82``): seed=42,
char_ngrams=24, num_bands=20, minhashes_per_band=13 → 260 permutations,
Jaccard threshold ≈ (1/b)^(1/r) ≈ 0.8.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FuzzyDedupConfig:
    seed: int = 42
    char_ngrams: int = 24
    num_bands: int = 20
    minhashes_per_band: int = 13
    use_64bit_hash: bool = False
    id_field: str = "_id"
    text_field: str = "caption"
    minhash_field: str = "_minhash_signature"
    # scale knobs
    bands_per_iteration: int = 20  # process all bands in one pass by default
    max_bucket_block_rows: int = 1 << 20
    # global bucket-resolution strategy: "sortscan" (default) = one sort of
    # the representatives + vectorized run scan emitting star edges in place
    # (no driver table, no broadcast memory bound — sortagg.global_star_sorted);
    # "broadcast" = vectorized aggregate + broadcast lookup of duplicated
    # buckets (right when cross-block dup buckets fit in memory); "groupby" =
    # map_groups fallback
    global_bucket_mode: str = "sortscan"
    max_broadcast_buckets: int = 20_000_000
    # Below this edge count, connected components runs the vectorized numpy
    # union-find on the driver: 16 bytes/edge -> ~800 MB at the 50M cap on a
    # 128 GiB node, and HashMin+pointer-jumping is ~0.2 s per 1M edges
    # (PERF.md). Above it, the sort-based distributed HashMin path takes over
    # (several full sorts of O(V+E) rows per round — correct, but orders of
    # magnitude slower; only worth it when edges genuinely don't fit).
    cc_driver_fallback_edges: int = 50_000_000
    cc_max_iterations: int = 25
    cc_num_partitions: int = 64

    @property
    def num_hashes(self) -> int:
        return self.num_bands * self.minhashes_per_band


@dataclass(frozen=True)
class ExactDedupConfig:
    id_field: str = "_id"
    text_field: str = "caption"


@dataclass(frozen=True)
class SimHashConfig:
    """Bit-chunk banding over a 64-bit hash column (Charikar-style SimHash
    candidate generation; graft-specific, see SURVEY.md §2.7)."""

    hash_field: str = "phash"
    id_field: str = "_id"
    hash_bits: int = 64  # width of the hash column (chunks span hash_bits/num_chunks bits)
    num_chunks: int = 4  # 4 x 16-bit chunks -> catches Hamming distance <= 3 fully
    hamming_threshold: int = 4  # verified pairwise inside each candidate bucket
    # single-chunk bands guarantee recall at Hamming < num_chunks but are hot
    # keys at 10^12 rows; chunk-pair bands (always on) have 2^32 key space.
    use_single_chunk_bands: bool = True
    # all-pairs Hamming verification is O(m^2) per bucket; buckets with more
    # than verify_cap distinct hash values fall back to multi-pivot
    # verification (members vs ~16 sorted pivots — logged, recall < 1 for
    # pairs whose distance to every pivot exceeds the threshold)
    verify_cap: int = 512


@dataclass(frozen=True)
class SemanticDedupConfig:
    n_clusters: int = 100
    eps: float = 0.01  # remove rows with max cosine sim >= 1 - eps
    which_to_keep: str = "hard"  # hard | easy | random (reference ranking.py:21-104)
    embedding_field: str = "embedding"
    id_field: str = "_id"
    kmeans_max_iters: int = 20
    kmeans_sample_size: int = 100_000
    seed: int = 42
    pairwise_batch_size: int = 1024
    # "sample" fits k-means on a random driver-side sample; "distributed"
    # runs full Lloyd iterations over the whole Dataset (combiner map_batches
    # per round — the CPU counterpart of the reference's RAFT k-means)
    fit_mode: str = "sample"
    # clusters larger than the cap are re-clustered once with a per-cluster
    # sub-k-means before the pairwise stage, bounding per-task memory in
    # ``groupby(cluster).map_groups`` (the reference ships whole clusters to
    # 80 GB GPUs instead); near-identical rows share a nearest sub-centroid,
    # so near-dup recall loss is confined to sub-cluster boundaries.
    # The cap is a BYTE budget divided by the runtime embedding width
    # (``max_cluster_bytes // (dim * 8)``): a fixed row cap silently scales
    # per-task bytes with dim — 200k rows is ~100 MB at dim=64 but ~2.4 GB
    # at a production dim=1536. ``max_cluster_size`` (rows) overrides the
    # derived cap when set explicitly; 0 disables splitting entirely.
    max_cluster_bytes: int = 256 * 1024 * 1024
    max_cluster_size: int | None = None
