"""Semantic deduplication: k-means over embeddings + per-cluster pairwise.

Reference: ``nemo_curator/stages/deduplication/semantic/`` — distributed RAFT
k-means (``kmeans.py:48-575``), per-cluster batched pairwise max-cosine with a
ranking strategy (``pairwise.py:37-322``, ``ranking.py:21-104``), then filter
``cosine_sim_score >= 1 - eps`` (``identify_duplicates.py:28-129``).

Ray-Data-native version:
- fit: Lloyd's k-means in numpy on a bounded sample materialized to the
  driver (``kmeans_sample_size`` rows — the reference similarly fits on
  ``fit_data_fraction`` of files);
- assign: stateless ``map_batches`` against the broadcast centroid matrix
  (``ray.put`` once, read zero-copy per task);
- pairwise: ``groupby(cluster).map_groups`` — each cluster ranked per
  ``which_to_keep`` (hard = farthest from centroid first, matching the
  reference's default), then row i scores max cosine against rows[0..i-1]
  in ``pairwise_batch_size`` chunks (same O(N*B) memory bound as
  ``pairwise.py:37-71``);
- identify: filter score >= 1-eps, emit sorted removal ids.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..config import SemanticDedupConfig


def _emb_matrix(batch: pa.Table, field: str) -> np.ndarray:
    col = batch.column(field)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), dim).astype(np.float64)
    offsets = col.offsets.to_numpy()
    dim = int(offsets[1] - offsets[0]) if len(col) else 0
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), dim).astype(np.float64)


def sample_embeddings(ds, field: str, n: int, seed: int) -> np.ndarray:
    """Random driver-side sample of ~n embedding rows.

    ``ds.limit(n)`` takes the FIRST blocks — on sorted/clustered input the
    sample (and therefore the k-means centroids) would be skewed, so sample
    uniformly via ``random_sample`` (the reference's ``fit_data_fraction``
    file sampling, ``semantic/kmeans.py:92,112-115``)."""
    total = ds.count()
    if total == 0:
        return np.zeros((0, 1))
    frac = min(1.0, (1.25 * n) / total)  # slight over-draw, then cap at n
    sampled = ds if frac >= 1.0 else ds.random_sample(frac, seed=seed)
    parts = [
        _emb_matrix(pa.table(b), field)
        for b in sampled.limit(n).iter_batches(batch_format="pyarrow")
    ]
    parts = [p for p in parts if len(p)]
    return np.concatenate(parts) if parts else np.zeros((0, 1))


def kmeans_fit(sample: np.ndarray, cfg: SemanticDedupConfig) -> np.ndarray:
    """Lloyd's k-means (k-means++ seeding) -> (k, dim) centroids."""
    rng = np.random.RandomState(cfg.seed)
    n = len(sample)
    k = min(cfg.n_clusters, n)
    # k-means++ init
    centroids = np.empty((k, sample.shape[1]), dtype=np.float64)
    centroids[0] = sample[rng.randint(n)]
    d2 = ((sample - centroids[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centroids[i] = sample[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((sample - centroids[i]) ** 2).sum(axis=1))
    c2 = None
    for _ in range(cfg.kmeans_max_iters):
        # assign in chunks to bound memory (matmul form, no (n, k, dim) tensor)
        assign = np.empty(n, dtype=np.int64)
        c2 = (centroids * centroids).sum(axis=1)
        for s in range(0, n, 8192):
            chunk = sample[s : s + 8192]
            d = (chunk * chunk).sum(axis=1, keepdims=True) + c2[None, :] - 2.0 * (chunk @ centroids.T)
            assign[s : s + 8192] = d.argmin(axis=1)
        new_c = centroids.copy()
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                new_c[j] = members.mean(axis=0)
        if np.allclose(new_c, centroids):
            break
        centroids = new_c
    return centroids


def kmeans_fit_distributed(ds, cfg: SemanticDedupConfig, init_centroids: np.ndarray | None = None) -> np.ndarray:
    """Distributed Lloyd's iterations over the FULL Dataset.

    Counterpart of the reference's RAFT-actor distributed k-means
    (``semantic/kmeans.py:48-575``) without NCCL: each iteration is one
    ``map_batches`` pass emitting per-cluster partial sums + counts (a
    combiner — one (k, dim) matrix per block, no per-row shuffle), reduced on
    the driver. Init defaults to k-means++ on a driver-side sample."""
    import ray

    if init_centroids is None:
        sample = sample_embeddings(ds, cfg.embedding_field, cfg.kmeans_sample_size, cfg.seed)
        small = SemanticDedupConfig(
            n_clusters=cfg.n_clusters, seed=cfg.seed, kmeans_max_iters=1, kmeans_sample_size=cfg.kmeans_sample_size
        )
        centroids = kmeans_fit(sample, small)
    else:
        centroids = np.asarray(init_centroids, dtype=np.float64)
    k = len(centroids)

    for _ in range(cfg.kmeans_max_iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cents = ray.get(ref)
            emb = _emb_matrix(batch, cfg.embedding_field)
            if len(emb) == 0:
                return pa.table({"payload": pa.array([], pa.binary())})
            d = (
                (emb * emb).sum(axis=1, keepdims=True)
                + (cents * cents).sum(axis=1)[None, :]
                - 2.0 * (emb @ cents.T)
            )
            assign = d.argmin(axis=1)
            sums = np.zeros((k, emb.shape[1]))
            np.add.at(sums, assign, emb)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            blob = np.concatenate([sums.ravel(), counts]).tobytes()
            return pa.table({"payload": pa.array([blob], pa.binary())})

        dim = centroids.shape[1]
        total = np.zeros(k * dim + k)
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        ):
            for blob in pa.table(b).column("payload").to_pylist():
                total += np.frombuffer(blob)
        sums = total[: k * dim].reshape(k, dim)
        counts = total[k * dim :]
        new_c = centroids.copy()
        nz = counts > 0
        new_c[nz] = sums[nz] / counts[nz, None]
        if np.allclose(new_c, centroids):
            break
        centroids = new_c
    return centroids


def _assign_batch(batch: pa.Table, *, centroids_ref, cfg: SemanticDedupConfig) -> pa.Table:
    import ray

    centroids = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
    emb = _emb_matrix(batch, cfg.embedding_field)
    # |a-b|^2 = |a|^2 + |b|^2 - 2ab via matmul: the (n, k) matrix is the only
    # intermediate (a broadcast (n, k, dim) difference tensor would be ~dim x
    # larger and blow worker heaps at batch size x 1000 clusters)
    d = (
        (emb * emb).sum(axis=1, keepdims=True)
        + (centroids * centroids).sum(axis=1)[None, :]
        - 2.0 * (emb @ centroids.T)
    )
    np.maximum(d, 0.0, out=d)
    assign = d.argmin(axis=1)
    l2 = np.sqrt(d[np.arange(len(emb)), assign])
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    cos = 1.0 - (en * cn[assign]).sum(axis=1)
    return batch.append_column("centroid_id", pa.array(assign, pa.int64())).append_column(
        "l2_dist_to_cent", pa.array(l2, pa.float64())
    ).append_column("cosine_dist_to_cent", pa.array(cos, pa.float64()))


def kmeans_assign(ds, centroids: np.ndarray, cfg: SemanticDedupConfig):
    import ray

    ref = ray.put(centroids)
    return ds.map_batches(
        functools.partial(_assign_batch, centroids_ref=ref, cfg=cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _pairwise_group(group: pa.Table, *, cfg: SemanticDedupConfig) -> pa.Table:
    ids = group.column(cfg.id_field).to_numpy()
    emb = _emb_matrix(group, cfg.embedding_field)
    n = len(ids)
    if n == 0:
        return pa.table({"id": pa.array([], pa.int64()), "cosine_sim_score": pa.array([], pa.float64())})
    dist = group.column("cosine_dist_to_cent").to_numpy()
    if cfg.which_to_keep == "hard":
        order = np.lexsort((ids, -dist))  # farthest from centroid ranked first
    elif cfg.which_to_keep == "easy":
        order = np.lexsort((ids, dist))
    else:
        order = np.random.RandomState(cfg.seed).permutation(n)
    emb = emb[order]
    ids = ids[order]
    en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    scores = np.zeros(n, dtype=np.float64)
    B = cfg.pairwise_batch_size
    # column-chunk the earlier-rows matmul so the transient sims buffer is
    # bounded at B*C*8 bytes regardless of cluster size (an unchunked
    # ``en[s:e] @ en[:e].T`` is B*N*8 — 1.6 GB at N=200k, dwarfing the
    # N*dim*8 embedding matrix the byte budget accounts for)
    C = 8192
    for s in range(1, n, B):
        e = min(n, s + B)
        m = e - s
        # max cosine of rows[s:e] against all strictly-earlier rows
        best = np.full(m, -np.inf)
        for cs in range(0, s, C):
            ce = min(s, cs + C)
            np.maximum(best, (en[s:e] @ en[cs:ce].T).max(axis=1), out=best)
        tri = en[s:e] @ en[s:e].T
        tri[np.arange(m)[None, :] >= np.arange(m)[:, None]] = -np.inf
        scores[s:e] = np.maximum(best, tri.max(axis=1, initial=-np.inf))
    return pa.table({"id": pa.array(ids, pa.int64()), "cosine_sim_score": pa.array(scores, pa.float64())})


def _cluster_sizes(assigned) -> dict[int, int]:
    """cluster id -> row count via the distributed count aggregate, streamed
    batch-wise (one row per cluster, n_clusters total — never O(rows))."""
    sizes: dict[int, int] = {}
    for b in assigned.groupby("centroid_id").count().iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        cids = t.column("centroid_id").to_numpy().astype(np.int64)
        cnts = t.column("count()").to_numpy().astype(np.int64)
        sizes.update(zip(cids.tolist(), cnts.tolist()))
    return sizes


def split_oversized_clusters(assigned, cfg: SemanticDedupConfig, row_cap: int | None = None):
    """Re-cluster clusters above ``row_cap`` rows once with a per-cluster
    sub-k-means so no single ``map_groups`` task holds an unbounded group
    (the reference's ``break_parquet_partition_into_groups`` solves the same
    problem for its 2^31-row cudf limit; here the bound is worker heap).
    Clusters that sub-k-means cannot split — N identical embeddings all land
    on one sub-centroid — fall back to a deterministic id-hash round-robin
    shard: identical vectors score 1.0 against any member, so sharding only
    changes which single representative per shard survives. Constant extra
    passes total, independent of how many clusters are oversized."""
    import ray

    cap = row_cap or cfg.max_cluster_size or 200_000
    assigned = assigned.materialize()
    sizes = _cluster_sizes(assigned)
    oversized = {cid: n for cid, n in sizes.items() if n > cap}
    if not oversized:
        return assigned
    next_id = max(sizes) + 1

    # one filtered random-sample pass over all oversized clusters at once
    over_set = set(oversized)
    total_over = sum(oversized.values())
    want = sum(min(50 * -(-n // cap), n) for n in oversized.values())
    frac = min(1.0, (1.25 * want) / total_over)

    def pick(batch: pa.Table) -> pa.Table:
        cid = batch.column("centroid_id").to_numpy()
        mask = np.isin(cid, np.fromiter(over_set, dtype=np.int64))
        return batch.filter(pa.array(mask)).select(["centroid_id", cfg.embedding_field])

    sampled = assigned.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
    if frac < 1.0:
        sampled = sampled.random_sample(frac, seed=cfg.seed)
    by_cid: dict[int, list[np.ndarray]] = {}
    for b in sampled.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        cid = t.column("centroid_id").to_numpy()
        emb = _emb_matrix(t, cfg.embedding_field)
        for c in np.unique(cid):
            by_cid.setdefault(int(c), []).append(emb[cid == c])

    # per-oversized-cluster sub-k-means on the driver; sub-cluster ids are
    # allocated after the existing id range so untouched clusters keep theirs
    sub: dict[int, tuple[np.ndarray, int]] = {}
    for cid, n in oversized.items():
        pts = np.concatenate(by_cid.get(cid, [np.zeros((0, 1))]))
        k_sub = -(-n // cap)
        if len(pts) < 2 or k_sub < 2:
            continue
        sub_cfg = SemanticDedupConfig(n_clusters=k_sub, seed=cfg.seed, kmeans_max_iters=10)
        sub[cid] = (kmeans_fit(pts, sub_cfg), next_id)
        next_id += k_sub
    if not sub:
        return _hash_shard_oversized(assigned, oversized, cap, next_id, cfg)
    ref = ray.put(sub)

    def reassign(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        cid = batch.column("centroid_id").to_numpy().copy()
        cos = batch.column("cosine_dist_to_cent").to_numpy().copy()
        l2 = batch.column("l2_dist_to_cent").to_numpy().copy()
        emb = None
        for c, (cents, base) in table.items():
            rows = np.flatnonzero(cid == c)
            if not len(rows):
                continue
            if emb is None:
                emb = _emb_matrix(batch, cfg.embedding_field)
            e = emb[rows]
            d = (
                (e * e).sum(axis=1, keepdims=True)
                + (cents * cents).sum(axis=1)[None, :]
                - 2.0 * (e @ cents.T)
            )
            np.maximum(d, 0.0, out=d)
            a = d.argmin(axis=1)
            cid[rows] = base + a
            l2[rows] = np.sqrt(d[np.arange(len(rows)), a])
            cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
            en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
            cos[rows] = 1.0 - (en * cn[a]).sum(axis=1)
        names = batch.column_names
        out = batch.set_column(names.index("centroid_id"), "centroid_id", pa.array(cid, pa.int64()))
        out = out.set_column(names.index("l2_dist_to_cent"), "l2_dist_to_cent", pa.array(l2, pa.float64()))
        return out.set_column(
            names.index("cosine_dist_to_cent"), "cosine_dist_to_cent", pa.array(cos, pa.float64())
        )

    assigned = assigned.map_batches(reassign, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # sub-k-means cannot split a cluster whose members are (near-)identical:
    # every point lands on one sub-centroid and the cluster survives whole.
    # Re-measure and hash-shard whatever is still over the cap.
    sizes2 = _cluster_sizes(assigned)
    still = {cid: n for cid, n in sizes2.items() if n > cap}
    if not still:
        return assigned
    return _hash_shard_oversized(assigned, still, cap, max(sizes2) + 1, cfg)


def _hash_shard_oversized(assigned, oversized: dict[int, int], cap: int, next_id: int, cfg: SemanticDedupConfig):
    """Deterministic id-hash round-robin shard of clusters sub-k-means could
    not split (identical embeddings). Sharding a group of identical vectors
    only changes HOW MANY representatives survive (one per shard instead of
    one total — bounded by ceil(n/cap)); no true near-dup above eps is lost
    within a shard, and distances to the (unchanged) centroid stay valid."""
    import ray

    shards: dict[int, tuple[int, int]] = {}
    for cid, n in sorted(oversized.items()):
        k_shard = -(-n // cap)
        if k_shard < 2:
            continue
        shards[cid] = (next_id, k_shard)
        next_id += k_shard
    if not shards:
        return assigned
    ref = ray.put(shards)

    def shard(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        cid = batch.column("centroid_id").to_numpy().copy()
        idv = batch.column(cfg.id_field)
        try:
            ids = idv.to_numpy().astype(np.uint64)
        except (TypeError, ValueError):  # non-integer id column: positional
            ids = np.arange(len(batch), dtype=np.uint64)
        for c, (base, k) in table.items():
            rows = np.flatnonzero(cid == c)
            if len(rows):
                cid[rows] = base + (ids[rows] % np.uint64(k)).astype(np.int64)
        names = batch.column_names
        return batch.set_column(names.index("centroid_id"), "centroid_id", pa.array(cid, pa.int64()))

    return assigned.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)


def semantic_duplicate_ids(ds, cfg: SemanticDedupConfig):
    """Dataset with (id_field, embedding_field) -> sorted removal-id Dataset.

    Also returns the scored Dataset for inspection: (removal, scored).
    """
    import pyarrow.compute as pc

    if cfg.fit_mode == "distributed":
        centroids = kmeans_fit_distributed(ds, cfg)
    else:
        sample = sample_embeddings(ds, cfg.embedding_field, cfg.kmeans_sample_size, cfg.seed)
        centroids = kmeans_fit(sample, cfg)

    assigned = kmeans_assign(ds, centroids, cfg)
    # per-task row cap for the pairwise groupby: explicit row override, else
    # the byte budget divided by the runtime embedding width (so dim=1536
    # production embeddings get a proportionally smaller cap than dim=64)
    if cfg.max_cluster_size is not None:
        row_cap = cfg.max_cluster_size
    else:
        dim = max(1, int(centroids.shape[1]) if centroids.ndim == 2 else 1)
        row_cap = max(1024, cfg.max_cluster_bytes // (dim * 8))
    if row_cap:
        assigned = split_oversized_clusters(assigned, cfg, row_cap=row_cap)
    scored = assigned.groupby("centroid_id").map_groups(
        functools.partial(_pairwise_group, cfg=cfg), batch_format="pyarrow"
    )
    removal = scored.map_batches(
        lambda b: pa.table(
            {"_id": b.column("id").filter(pc.greater_equal(b.column("cosine_sim_score"), 1.0 - cfg.eps))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("_id")
    return removal, scored
