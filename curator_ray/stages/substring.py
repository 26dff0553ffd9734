"""Exact-substring duplicate-span stage (Dataset -> candidate edges).

Distributed strategy (SURVEY.md §2.7, M4): winnowed rolling-hash window
fingerprints (``curator_ray.functions.winnow``) bucket documents that share an
exact substring of length >= ``min_match_length``; buckets become star edges
into the shared connected-components stage, with the same per-batch combiner
(identical fingerprints star-linked locally, one representative per
(fingerprint, batch) in the global shuffle).

Guarantee: any shared span of >= fp_len + winnow_window - 1 bytes shares a
selected fingerprint; collisions of the 64-bit rolling hash are the only
false-positive source (~2^-64 per pair).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..functions.winnow import doc_fingerprints


def _local_substring(
    batch: pa.Table, *, text_field: str, id_field: str, fp_len: int, winnow_window: int, emit: str
) -> pa.Table:
    ids = batch.column(id_field).to_numpy()
    texts = batch.column(text_field).to_pylist()
    fp_list, id_rep = [], []
    for i, t in enumerate(texts):
        fps = doc_fingerprints(t or "", fp_len, winnow_window)
        if len(fps):
            fp_list.append(np.unique(fps))
            id_rep.append(np.full(len(fp_list[-1]), ids[i], np.int64))
    if not fp_list:
        if emit == "edges":
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return pa.table({"fp": pa.array([], pa.uint64()), "rep": pa.array([], pa.int64())})
    fp = np.concatenate(fp_list)
    rid = np.concatenate(id_rep)
    order = np.argsort(fp, kind="stable")
    sfp, sid = fp[order], rid[order]
    starts = np.flatnonzero(np.concatenate([[True], sfp[1:] != sfp[:-1]]))
    run_min = np.minimum.reduceat(sid, starts)
    sizes = np.diff(np.append(starts, len(sfp)))
    if emit == "edges":
        member_src = np.repeat(run_min, sizes)
        mask = sid != member_src
        return pa.table(
            {"src": pa.array(member_src[mask], pa.int64()), "dst": pa.array(sid[mask], pa.int64())}
        )
    return pa.table({"fp": pa.array(sfp[starts], pa.uint64()), "rep": pa.array(run_min, pa.int64())})


def _global_star(group: pa.Table) -> pa.Table:
    reps = np.unique(group.column("rep").to_numpy())
    if len(reps) < 2:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    return pa.table(
        {"src": pa.array(np.full(len(reps) - 1, reps[0]), pa.int64()), "dst": pa.array(reps[1:], pa.int64())}
    )


def substring_candidate_edges(
    ds,
    min_match_length: int = 50,
    text_field: str = "caption",
    id_field: str = "_id",
    winnow_window: int = 8,
):
    """Documents sharing an exact span >= min_match_length -> edges.

    fp_len is chosen so the winnowing guarantee covers min_match_length:
    fp_len + winnow_window - 1 == min_match_length.
    """
    fp_len = max(4, min_match_length - winnow_window + 1)
    kw = dict(
        text_field=text_field, id_field=id_field, fp_len=fp_len, winnow_window=winnow_window
    )
    local = ds.map_batches(
        functools.partial(_local_substring, emit="edges", **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    reps = ds.map_batches(
        functools.partial(_local_substring, emit="reps", **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return local.union(reps.groupby("fp").map_groups(_global_star, batch_format="pyarrow"))
