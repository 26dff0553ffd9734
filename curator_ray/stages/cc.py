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
  (sort-based rounds: a (vertex, kind) sort + vectorized scan joins labels to
  edges, then ``sorted_group_min`` applies the min rule), converging in
  O(diameter) rounds. The LSH stage emits *star* edges (diameter 2 per
  bucket), so rounds stay small; convergence is detected by a wrap-around
  uint64 label checksum (labels only ever decrease).

Output: Dataset[(v:int64, group:int64)] where group = min id of the component.
Rows with v == group are the survivors; v != group are duplicates — so the
reference's IdentifyDuplicates shuffle (``fuzzy/identify_duplicates.py:94-103``)
reduces to a stateless filter here.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import FuzzyDedupConfig

logger = logging.getLogger(__name__)

LABELS_SCHEMA = pa.schema([("v", pa.int64()), ("group", pa.int64())])


def union_find_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Connected components on int64 endpoints -> (vertices, root_label) with
    root_label = min vertex id of each component.

    Fully vectorized HashMin + pointer jumping (no Python loop over edges —
    a driver-side Python union-find on ~10^6 edges costs tens of serial
    seconds and caps scaling efficiency). Labels are dense indices, start as
    self, and only ever decrease; each outer round propagates the per-edge
    min to both endpoints and then shortcuts chains (new = new[new]),
    converging in O(log n) rounds.

    The endpoint-min step uses a ONE-TIME incidence sort + per-round
    ``np.minimum.reduceat`` instead of ``np.minimum.at``: the unbuffered
    ufunc.at scatter measured 86 s on a 5M-edge random graph where the
    reduceat formulation takes well under a second per round."""
    verts, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(verts)
    E = len(src)
    es, ed = idx[:E], idx[E:]
    labels = np.arange(n, dtype=np.int64)
    if E == 0:
        return verts, verts[labels]
    # static incidence grouping: position i of the endpoint-sorted array
    # corresponds to edge (order[i] mod E); per-vertex runs never change
    ends = np.concatenate([es, ed])
    order = np.argsort(ends, kind="stable")
    eidx = order % E  # edge index for each sorted endpoint slot
    ends_s = ends[order]
    run_starts = np.flatnonzero(np.concatenate([[True], ends_s[1:] != ends_s[:-1]]))
    touched = ends_s[run_starts]  # vertices with >= 1 incident edge
    while True:
        m = np.minimum(labels[es], labels[ed])  # per-edge min label
        vmin = np.minimum.reduceat(m[eidx], run_starts)  # min over incident edges
        new = labels.copy()
        new[touched] = np.minimum(new[touched], vmin)
        while True:  # pointer jumping / shortcutting
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, labels):
            break
        labels = new
    return verts, verts[labels]


def dedup_pairs(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (lo, hi) pairs via lexsort + run mask.

    ``np.unique(..., axis=0)`` compares rows as void scalars (measured 9-18 s
    on 2.4M pairs — it was the dominant driver-serial term in the scaling
    campaign); two int64 lexsort keys + a neighbor mask do the same job in
    ~100 ms."""
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    if len(lo):
        keep = np.concatenate([[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
        lo, hi = lo[keep], hi[keep]
    return lo, hi


def _dedup_edges_batch(batch: pa.Table) -> pa.Table:
    src = batch.column("src").to_numpy()
    dst = batch.column("dst").to_numpy()
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    lo, hi = dedup_pairs(lo[keep], hi[keep])
    return pa.table({"src": pa.array(lo, pa.int64()), "dst": pa.array(hi, pa.int64())})


def connected_components(edges, cfg: FuzzyDedupConfig):
    """Edge Dataset -> label Dataset[(v, group)]. Chooses driver vs distributed."""
    import os
    import sys
    import time

    phase_log = os.environ.get("GRAFT_PHASE_LOG")
    t0 = time.time()
    # normalize + block-local dedup first (cheap, shrinks everything downstream;
    # cross-block duplicate edges are tolerated by both algorithms). The edge
    # streams arrive as many tiny blocks (filters over sorted tables) — an
    # explicit batch_size coalesces them so this pass isn't micro-task-bound
    edges = edges.map_batches(
        _dedup_edges_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=1 << 20
    )
    edges = edges.materialize()
    n_edges = edges.count()
    if phase_log:
        print(f"[phase] cc.edges_materialize ({n_edges} edges): {time.time() - t0:.2f}s", file=sys.stderr, flush=True)
        t0 = time.time()
    if n_edges == 0:
        return None
    if n_edges <= cfg.cc_driver_fallback_edges:
        tbl = pa.concat_tables([pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")])
        # no global pair dedup here: union_find_numpy is correct on duplicate
        # edges (they only repeat a min), and the batch-local dedup upstream
        # already removed the bulk — a driver-side axis-0 unique cost 9-18 s
        # of pure serial time per run (PERF.md scaling campaign)
        verts, labels = union_find_numpy(tbl.column("src").to_numpy(), tbl.column("dst").to_numpy())
        import ray

        out = ray.data.from_arrow(
            pa.table({"v": pa.array(verts, pa.int64()), "group": pa.array(labels, pa.int64())})
        )
        if phase_log:
            print(f"[phase] cc.driver_union_find: {time.time() - t0:.2f}s", file=sys.stderr, flush=True)
        return out
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


def _scan_min_runs(batch: pa.Table, *, key: str, val: str) -> pa.Table:
    """Per sorted block: (key, min(val)) per run; first/last runs flagged
    partial (they may continue in a neighbor block)."""
    n = len(batch)
    if n == 0:
        return pa.table(
            {key: pa.array([], pa.int64()), val: pa.array([], pa.int64()), "partial": pa.array([], pa.int8())}
        )
    k = batch.column(key).to_numpy()
    x = batch.column(val).to_numpy()
    new_run = np.concatenate([[True], k[1:] != k[:-1]])
    starts = np.flatnonzero(new_run)
    mins = np.minimum.reduceat(x, starts)
    part = np.zeros(len(starts), dtype=np.int8)
    part[0] = 1
    part[-1] = 1
    return pa.table({key: pa.array(k[starts], pa.int64()), val: pa.array(mins, pa.int64()), "partial": pa.array(part, pa.int8())})


def sorted_group_min(ds, key: str, val: str):
    """Distributed (key, min(val)) for ALL keys — sort + vectorized run scan;
    boundary runs merged on the driver and re-injected as one small block.
    Replaces ``groupby(key).min(val)`` (per-group overhead, see sortagg.py)."""
    import functools

    import pyarrow.compute as pc
    import ray

    scanned = (
        ds.sort([key])
        .map_batches(
            functools.partial(_scan_min_runs, key=key, val=val),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    interior = scanned.map_batches(
        lambda b: b.filter(pc.equal(b.column("partial"), 0)).drop_columns(["partial"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # filter DISTRIBUTED, collect only the ~2-rows-per-block remainder — an
    # iter_batches scan here would ship the full distinct-key volume through
    # the driver every call (the dominant serial cost at 8-vs-32-cpu scaling)
    boundary = _collect_small(
        scanned.map_batches(
            lambda b: b.filter(pc.equal(b.column("partial"), 1)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        [key, val],
    )
    bk = boundary.column(key).to_numpy()
    bv = boundary.column(val).to_numpy()
    order = np.argsort(bk, kind="stable")
    bk, bv = bk[order], bv[order]
    starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]])) if len(bk) else np.zeros(0, np.int64)
    merged = pa.table(
        {
            key: pa.array(bk[starts], pa.int64()),
            val: pa.array(np.minimum.reduceat(bv, starts) if len(bk) else np.zeros(0, np.int64), pa.int64()),
        }
    )
    return interior.union(ray.data.from_arrow(merged))


def _collect_small(ds, cols: list[str]) -> pa.Table:
    """Driver-collect an already-small Dataset (boundary rows, partials)."""
    parts = [pa.table(b).select(cols) for b in ds.iter_batches(batch_format="pyarrow")]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    return pa.concat_tables(parts)


def _scan_propagate(batch: pa.Table) -> pa.Table:
    """Per block sorted by (k, kind): for each interior vertex run, read its
    label (the kind-0 row, first in the run) and emit (v, label) messages for
    itself and every outgoing edge; boundary runs are re-emitted raw."""
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "v": pa.array([], pa.int64()),
                "group": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "payload": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
            }
        )
    k = batch.column("k").to_numpy()
    payload = batch.column("payload").to_numpy()
    kind = batch.column("kind").to_numpy()
    new_run = np.concatenate([[True], k[1:] != k[:-1]])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], n)
    sizes = ends - starts
    nruns = len(starts)
    is_boundary_run = np.zeros(nruns, dtype=bool)
    is_boundary_run[0] = True
    is_boundary_run[-1] = True
    # interior runs always begin with their kind-0 label row (kind sorted)
    interior = ~is_boundary_run
    run_has_label = kind[starts] == 0
    ok = interior & run_has_label
    row_run = np.repeat(np.arange(nruns), sizes)
    row_ok = ok[row_run]
    labels_per_row = np.repeat(payload[starts], sizes)  # label of the run
    edge_rows = row_ok & (kind == 1)
    out_v = np.concatenate([k[starts[ok]], payload[edge_rows]])
    out_g = np.concatenate([payload[starts[ok]], labels_per_row[edge_rows]])
    # boundary (and label-less, which only happens at boundaries) rows pass through
    passthru = ~row_ok
    nm, np_ = len(out_v), int(passthru.sum())
    msgs_t = pa.table(
        {
            "v": pa.array(out_v, pa.int64()),
            "group": pa.array(out_g, pa.int64()),
            "k": pa.nulls(nm, pa.int64()),
            "payload": pa.nulls(nm, pa.int64()),
            "kind": pa.nulls(nm, pa.int8()),
        }
    )
    pass_t = pa.table(
        {
            "v": pa.nulls(np_, pa.int64()),
            "group": pa.nulls(np_, pa.int64()),
            "k": pa.array(k[passthru], pa.int64()),
            "payload": pa.array(payload[passthru], pa.int64()),
            "kind": pa.array(kind[passthru], pa.int8()),
        }
    )
    return pa.concat_tables([msgs_t, pass_t])


def _hashmin_distributed(edges, cfg: FuzzyDedupConfig):
    """Iterative min-label propagation with sort-based rounds.

    Each round: tagged union of label rows (kind 0) and edge rows (kind 1)
    sorted by (vertex, kind); a vectorized scan reads each vertex's label and
    emits (neighbor, label) messages; runs split across block boundaries are
    resolved on the driver (bounded by 2 rows per block x run width). Then
    ``sorted_group_min`` applies the min rule. No per-group Python anywhere.
    """
    import ray

    und = edges.union(edges.map_batches(_swap, batch_format="pyarrow", zero_copy_batch=True)).materialize()
    tagged_edges = und.map_batches(_tag_edges, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # initial labels: every distinct vertex labels itself (v -> v)
    labels = sorted_group_min(
        und.map_batches(
            lambda b: pa.table({"v": b.column("src"), "group": b.column("src")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "v",
        "group",
    ).materialize()
    prev_sum = _labels_checksum(labels)

    converged = False
    for _ in range(cfg.cc_max_iterations):
        tagged = labels.map_batches(_tag_labels, batch_format="pyarrow", zero_copy_batch=True).union(
            tagged_edges
        )
        scanned = (
            tagged.sort(["k", "kind"])
            .map_batches(_scan_propagate, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
        msgs = scanned.map_batches(
            lambda b: b.select(["v", "group"]).filter(pc.is_valid(b.column("v"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # boundary passthrough rows: filter distributed (never stream the
        # full message volume through the driver), resolve the small rest here
        bt = _collect_small(
            scanned.map_batches(
                lambda b: b.filter(pc.is_valid(b.column("k"))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["k", "payload", "kind"],
        )
        boundary_msgs = _resolve_boundary_runs([bt] if bt.num_rows else [])
        labels = sorted_group_min(
            msgs.union(ray.data.from_arrow(boundary_msgs)), "v", "group"
        ).materialize()
        new_sum = _labels_checksum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # a component whose diameter exceeds the round cap would otherwise get
        # silently non-minimal labels (multiple survivors per cluster) — make
        # the under-removal visible instead of shipping it quietly
        logger.warning(
            "connected components did not converge within cc_max_iterations=%d "
            "rounds; some duplicate clusters may carry non-minimal labels "
            "(under-removal). Raise cc_max_iterations for graphs with long chains.",
            cfg.cc_max_iterations,
        )
    return labels


def _labels_checksum(labels) -> int:
    """Wrap-around uint64 sum of the label column (convergence detector).

    Labels only ever decrease, so the checksum changes iff any label changed
    (a wrapped collision would need the total decrease to be an exact multiple
    of 2^64). ``Dataset.sum`` is unusable here: a Python-int sum of hash-range
    int64 ids overflows Arrow int64 and crashes the reduce. Partial checksums
    are computed per block in workers (one 8-byte row each) so the driver
    never streams the label table."""

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("group").to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            s = int(col.sum(dtype=np.uint64))
        return pa.table({"csum": pa.array([s - (1 << 64) if s >= (1 << 63) else s], pa.int64())})

    total = np.uint64(0)
    for b in labels.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow"
    ):
        col = pa.table(b).column("csum").to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            total += col.sum(dtype=np.uint64)
    return int(total)


def _resolve_boundary_runs(btbls: list[pa.Table]) -> pa.Table:
    """Driver-side propagation for vertex runs that crossed block boundaries."""
    if not btbls:
        return pa.table({"v": pa.array([], pa.int64()), "group": pa.array([], pa.int64())})
    t = pa.concat_tables(btbls)
    k = t.column("k").to_numpy()
    payload = t.column("payload").to_numpy()
    kind = t.column("kind").to_numpy()
    order = np.lexsort((kind, k))
    k, payload, kind = k[order], payload[order], kind[order]
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    sizes = np.diff(np.append(starts, len(k)))
    label = payload[starts]  # kind-0 row first within each run
    row_label = np.repeat(label, sizes)
    edge_rows = kind == 1
    out_v = np.concatenate([k[starts], payload[edge_rows]])
    out_g = np.concatenate([label, row_label[edge_rows]])
    return pa.table({"v": pa.array(out_v, pa.int64()), "group": pa.array(out_g, pa.int64())})


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
