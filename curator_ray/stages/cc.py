"""Connected components over a candidate-edge Dataset.

The reference gathers ALL edges into a multi-GPU cuGraph weakly-connected-
components call (``fuzzy/connected_components.py:106-202``). Without GPUs we
use two CPU paths:

- **driver fallback** (edge count <= cfg.cc_driver_fallback_edges): pull the
  deduped edge list to the driver and run a path-compressing union-find in
  numpy. Duplicate-candidate edges are a tiny fraction of a corpus, so even a
  10^9-row corpus typically lands here; and

- **distributed HashMin label propagation** (Rastogi et al. 2013 / Kiveris
  et al. "Connected Components in MapReduce"): labels start as vertex ids;
  each round every vertex takes the min label among itself and its neighbors
  (``edges ⋈ labels`` then ``groupby(v).min(label)``), converging in
  O(diameter) rounds. The LSH stage emits *star* edges (diameter 2 per
  bucket), so rounds stay small; convergence is detected by the monotone
  sum-of-labels fixpoint (labels only ever decrease).

Output: Dataset[(v:int64, group:int64)] where group = min id of the component.
Rows with v == group are the survivors; v != group are duplicates — so the
reference's IdentifyDuplicates shuffle (``fuzzy/identify_duplicates.py:94-103``)
reduces to a stateless filter here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import FuzzyDedupConfig

LABELS_SCHEMA = pa.schema([("v", pa.int64()), ("group", pa.int64())])


def union_find_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Union-find on int64 endpoints -> (vertices, root_label) with
    root_label = min vertex id of each component."""
    verts, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(verts)
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    es, ed = idx[: len(src)], idx[len(src) :]
    for a, b in zip(es.tolist(), ed.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller dense index == smaller vertex id (verts sorted)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # final flatten
    for i in range(n):
        parent[i] = find(i)
    return verts, verts[parent]


def _dedup_edges_batch(batch: pa.Table) -> pa.Table:
    src = batch.column("src").to_numpy()
    dst = batch.column("dst").to_numpy()
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    return pa.table({"src": pa.array(pairs[:, 0], pa.int64()), "dst": pa.array(pairs[:, 1], pa.int64())})


def connected_components(edges, cfg: FuzzyDedupConfig):
    """Edge Dataset -> label Dataset[(v, group)]. Chooses driver vs distributed."""
    # normalize + block-local dedup first (cheap, shrinks everything downstream;
    # cross-block duplicate edges are tolerated by both algorithms)
    edges = edges.map_batches(_dedup_edges_batch, batch_format="pyarrow", zero_copy_batch=True)
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return None
    if n_edges <= cfg.cc_driver_fallback_edges:
        tbl = pa.concat_tables([pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")])
        src = tbl.column("src").to_numpy()
        dst = tbl.column("dst").to_numpy()
        pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
        verts, labels = union_find_numpy(pairs[:, 0], pairs[:, 1])
        import ray

        return ray.data.from_arrow(
            pa.table({"v": pa.array(verts, pa.int64()), "group": pa.array(labels, pa.int64())})
        )
    return _hashmin_distributed(edges, cfg)


def _swap(batch: pa.Table) -> pa.Table:
    return pa.table({"src": batch.column("dst"), "dst": batch.column("src")})


def _rename_min(batch: pa.Table) -> pa.Table:
    return batch.rename_columns(["v", "group"])


def _tag_labels(batch: pa.Table) -> pa.Table:
    # label rows: key = vertex, payload = its current label, kind 0
    return pa.table(
        {
            "k": batch.column("v"),
            "payload": batch.column("group"),
            "kind": pa.array(np.zeros(len(batch), np.int8)),
        }
    )


def _tag_edges(batch: pa.Table) -> pa.Table:
    # edge rows: key = src vertex, payload = dst vertex, kind 1
    return pa.table(
        {
            "k": batch.column("src"),
            "payload": batch.column("dst"),
            "kind": pa.array(np.ones(len(batch), np.int8)),
        }
    )


def _propagate_group(group: pa.Table) -> pa.Table:
    """One vertex's join group: its label row + outgoing edges -> messages.

    Emits (v, group) for the vertex itself and for every neighbor, carrying
    the vertex's current label (HashMin message generation).
    """
    kind = group.column("kind").to_numpy()
    payload = group.column("payload").to_numpy()
    label_rows = payload[kind == 0]
    if len(label_rows) == 0:
        return pa.table({"v": pa.array([], pa.int64()), "group": pa.array([], pa.int64())})
    label = label_rows.min()
    dsts = payload[kind == 1]
    v = np.concatenate([group.column("k").to_numpy()[:1], dsts])
    return pa.table(
        {"v": pa.array(v, pa.int64()), "group": pa.array(np.full(len(v), label), pa.int64())}
    )


def _hashmin_distributed(edges, cfg: FuzzyDedupConfig):
    """Iterative min-label propagation entirely in Ray Data operators.

    The per-round join (edges ⋈ labels) is expressed as a tagged-union
    ``groupby(vertex).map_groups`` — one hash shuffle per round — followed by
    ``groupby(v).min(group)`` to apply the min rule.
    """
    und = edges.union(edges.map_batches(_swap, batch_format="pyarrow", zero_copy_batch=True)).materialize()
    tagged_edges = und.map_batches(_tag_edges, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # initial labels: every distinct vertex labels itself
    labels = (
        und.map_batches(
            lambda b: pa.table({"v": b.column("src")}), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("v")
        .count()
        .map_batches(
            lambda b: pa.table({"v": b.column("v"), "group": b.column("v")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    prev_sum = labels.sum("group")

    for _ in range(cfg.cc_max_iterations):
        tagged = labels.map_batches(_tag_labels, batch_format="pyarrow", zero_copy_batch=True).union(
            tagged_edges
        )
        msgs = tagged.groupby("k").map_groups(_propagate_group, batch_format="pyarrow")
        labels = (
            msgs.groupby("v")
            .min("group")
            .map_batches(_rename_min, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
        new_sum = labels.sum("group")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def removal_ids(labels) -> "ray.data.Dataset":  # noqa: F821
    """Labels -> duplicate ids to remove (keep the min-id survivor per group),
    sorted ascending so downstream readers can prune row groups — matching the
    reference's sorted removal output (``fuzzy/identify_duplicates.py:102``)."""
    if labels is None:
        import ray

        return ray.data.from_arrow(pa.table({"_id": pa.array([], pa.int64())}))
    return labels.map_batches(
        lambda b: pa.table({"_id": b.column("v").filter(pc.not_equal(b.column("v"), b.column("group")))}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("_id")
