"""Approximate / exact nearest-neighbor search over an embedding column.

Graft-required component (no direct reference analog; the reference's closest
op is the semantic pairwise stage). Two paths:

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  once (``ray.put``); each ``map_batches`` task computes a (batch x queries)
  matmul and emits its local top-k per query; a ``groupby(query_id)`` merge
  reduces block-local candidates to the global top-k. Shuffle volume is
  O(num_blocks * q * k), never O(corpus).

- ``lsh_topk``: random-hyperplane LSH (Charikar 2002) bucketing as the scale
  path: corpus rows and queries hash to sign-pattern buckets over
  ``num_tables`` independent projections; candidates only within matching
  buckets, then exact re-rank. Recall < 1, tunable via tables/bits.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .semantic import _emb_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _local_topk(
    batch: pa.Table, *, q_ref, k: int, id_field: str, embedding_field: str
) -> pa.Table:
    import ray

    q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref  # (nq, dim), normalized
    emb = _normalize(_emb_matrix(batch, embedding_field))
    ids = batch.column(id_field).to_numpy()
    if len(ids) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    sims = q @ emb.T  # (nq, n)
    kk = min(k, sims.shape[1])
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    qid = np.repeat(np.arange(len(q), dtype=np.int64), kk)
    vid = ids[part.ravel()]
    sc = np.take_along_axis(sims, part, axis=1).ravel()
    return pa.table(
        {
            "query_id": pa.array(qid, pa.int64()),
            "vec_id": pa.array(vid, pa.int64()),
            "score": pa.array(sc, pa.float64()),
        }
    )


def _merge_topk(group: pa.Table, *, k: int) -> pa.Table:
    qid = group.column("query_id").to_numpy()
    vid = group.column("vec_id").to_numpy()
    sc = group.column("score").to_numpy()
    order = np.lexsort((vid, -sc))[:k]  # ties broken by smaller vec_id
    rank = np.arange(1, len(order) + 1, dtype=np.int64)
    return pa.table(
        {
            "query_id": pa.array(qid[order], pa.int64()),
            "vec_id": pa.array(vid[order], pa.int64()),
            "score": pa.array(sc[order], pa.float64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


def brute_force_topk(ds, queries: np.ndarray, k: int, id_field: str = "vec_id", embedding_field: str = "embedding"):
    """Exact cosine top-k of each query against the corpus Dataset."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    local = ds.map_batches(
        functools.partial(_local_topk, q_ref=q_ref, k=k, id_field=id_field, embedding_field=embedding_field),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return local.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pyarrow"
    )


def _lsh_sig(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, tables) uint64 sign-pattern signatures."""
    nt, nb, dim = planes.shape
    out = np.zeros((len(m), nt), dtype=np.uint64)
    for t in range(nt):
        signs = (m @ planes[t].T) > 0  # (n, nb)
        out[:, t] = (signs.astype(np.uint64) << np.arange(nb, dtype=np.uint64)[None, :]).sum(axis=1)
    return out


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int,
    id_field: str = "vec_id",
    embedding_field: str = "embedding",
    n_clusters: int = 64,
    nprobe: int = 8,
    sample_size: int = 50_000,
    seed: int = 42,
):
    """IVF approximate top-k: k-means coarse quantizer fit on a sample, each
    query probes its ``nprobe`` nearest cells, exact cosine re-rank inside.

    The scale path for ANN (SURVEY.md graft additions): cell assignment is a
    stateless broadcast ``map_batches``; only rows in probed cells are scored.
    """
    import functools

    import ray

    from ..config import SemanticDedupConfig
    from .semantic import kmeans_fit, sample_embeddings

    # normalize BEFORE the fit so cell assignment and probing share the same
    # cosine geometry (L2 on the unit sphere is monotone in cosine); fitting
    # on raw vectors while probing normalized centroids misroutes vectors
    # with non-uniform norms. Random sample, not first-blocks (bias on
    # sorted/clustered input).
    sample = _normalize(sample_embeddings(ds, embedding_field, sample_size, seed))
    cfg = SemanticDedupConfig(n_clusters=n_clusters, seed=seed, kmeans_sample_size=sample_size)
    cn = _normalize(kmeans_fit(sample, cfg))

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, : min(nprobe, len(cn))]  # (nq, nprobe)
    q_ref = ray.put(qn)
    c_ref = ray.put(cn)
    p_ref = ray.put(probe)

    def local(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        cents = ray.get(c_ref)
        pr = ray.get(p_ref)
        emb = _emb_matrix(batch, embedding_field)
        ids = batch.column(id_field).to_numpy()
        if len(ids) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        en = _normalize(emb)
        cell = (en @ cents.T).argmax(axis=1)  # cosine cell assignment
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q)):
            cand = np.isin(cell, pr[qi])
            if not cand.any():
                continue
            sims = en[cand] @ q[qi]
            kk = min(k, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(ids[cand][part])
            out_s.append(sims[part])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    local_ds = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return local_ds.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pyarrow"
    )


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int,
    id_field: str = "vec_id",
    embedding_field: str = "embedding",
    num_tables: int = 8,
    num_bits: int = 12,
    seed: int = 42,
):
    """LSH-bucketed approximate top-k: candidates share a sign-pattern bucket
    with the query in at least one table, then exact cosine re-rank."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qn.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_tables, num_bits, dim))
    q_sigs = _lsh_sig(qn, planes)  # (nq, T)
    q_ref = ray.put(qn)
    planes_ref = ray.put(planes)
    qsig_ref = ray.put(q_sigs)

    def local(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        pl = ray.get(planes_ref)
        qs = ray.get(qsig_ref)
        emb = _normalize(_emb_matrix(batch, embedding_field))
        ids = batch.column(id_field).to_numpy()
        if len(ids) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        sigs = _lsh_sig(emb, pl)  # (n, T)
        # candidate mask: any table matches any query's bucket
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q)):
            cand = (sigs == qs[qi][None, :]).any(axis=1)
            if not cand.any():
                continue
            sub = emb[cand]
            sims = sub @ q[qi]
            kk = min(k, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(ids[cand][part])
            out_s.append(sims[part])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    local_ds = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return local_ds.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pyarrow"
    )


def _corpus_matrix(ds, id_field: str, embedding_field: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids, normalized matrix) of the whole corpus, built block-by-block."""
    ids_parts, mat_parts = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if t.num_rows == 0:
            continue
        ids_parts.append(t.column(id_field).to_numpy())
        mat_parts.append(_emb_matrix(t, embedding_field))
    if not ids_parts:
        return np.zeros(0, np.int64), np.zeros((0, 1))
    return np.concatenate(ids_parts), _normalize(np.concatenate(mat_parts))


def cosine_dup_pairs(ds, threshold: float, id_field: str = "vec_id", embedding_field: str = "embedding"):
    """Exact embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine similarity >= threshold.

    Brute-force baseline of the dedup family (graft requirement): the
    normalized corpus matrix is broadcast ONCE (``ray.put``), each
    ``map_batches`` task computes its block x corpus matmul and emits only
    the pairs above threshold — O(n^2 / blocks) compute per task, O(hits)
    shuffle. The scale path at 10^9+ rows is the IVF/LSH bucketed variants
    above (candidates within a bucket only) or ``semantic_duplicate_ids``;
    this exact form is the oracle-checkable ground truth for them.
    """
    import ray

    ids_all, m_all = _corpus_matrix(ds, id_field, embedding_field)
    ref = ray.put((ids_all, m_all))

    def local(batch: pa.Table) -> pa.Table:
        corpus_ids, corpus = ray.get(ref)
        ids = batch.column(id_field).to_numpy()
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        if len(ids) == 0 or len(corpus_ids) == 0:
            return empty
        emb = _normalize(_emb_matrix(batch, embedding_field))
        sims = emb @ corpus.T  # (batch, n)
        bi, cj = np.nonzero(sims >= threshold)
        a = ids[bi]
        b = corpus_ids[cj]
        keep = a < b  # each unordered pair exactly once, no self-pairs
        a, b = a[keep], b[keep]
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    return ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True).sort(["id_a", "id_b"])
