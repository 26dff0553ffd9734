"""Suffix array + LCP utilities for exact-substring duplicate detection.

Per-partition path of the suffix-array stage (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): concatenate a partition's
documents with unique sentinels, build the suffix array (prefix-doubling,
O(n log^2 n), fully vectorized with np.lexsort), compute LCP (Kasai et al.),
and report cross-document repeated spans of length >= min_len.

The distributed pipeline uses winnowed rolling-hash fingerprints instead
(``curator_ray.functions.winnow``); this exact construction serves as the
in-partition detector and the test oracle (FIXTURES.md F7).
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array via prefix doubling + np.lexsort."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = np.asarray(data, dtype=np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # second key: rank of suffix i+k (or -1 past the end)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        # recompute ranks: same (rank, second) pair -> same new rank
        r_o, s_o = rank[order], second[order]
        changed = np.concatenate([[False], (r_o[1:] != r_o[:-1]) | (s_o[1:] != s_o[:-1])])
        new_rank = np.cumsum(changed)
        tmp[order] = new_rank
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
        if k >= n:
            break
    return sa


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i-1]); lcp[0] = 0."""
    n = len(sa)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and data[i + h] == data[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def cross_doc_repeated_spans(texts: list[str], min_len: int) -> set[tuple[int, int]]:
    """Pairs (i, j), i<j, of documents sharing an exact substring of length
    >= min_len. Sentinel-separated concatenation keeps spans within docs."""
    bufs, doc_of, pos = [], [], 0
    boundaries = []
    for d, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 256
        bufs.append(b)
        # unique sentinel per doc (negative, below all text values) so no
        # common substring can span a document boundary
        bufs.append(np.array([-(d + 1)], dtype=np.int64))
        boundaries.append((pos, pos + len(b)))
        pos += len(b) + 1
    data = np.concatenate(bufs) if bufs else np.zeros(0, np.int64)
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    starts = np.array([s for s, _ in boundaries])
    ends = np.array([e for _, e in boundaries])

    def doc_id(p: int) -> int:
        i = int(np.searchsorted(ends, p, side="right"))
        return i if i < len(starts) and p >= starts[i] else -1

    # Any two suffixes inside a maximal run of consecutive SA entries with
    # lcp >= min_len share a prefix of length >= min_len (pairwise LCP is the
    # interval minimum), so emit ALL distinct-doc pairs per run — adjacent
    # pairs alone miss transitive ones (e.g. three identical docs would yield
    # only (0,1),(1,2) and drop (0,2)).
    pairs: set[tuple[int, int]] = set()
    run_docs: set[int] = set()
    for r in range(1, len(sa)):
        if lcp[r] >= min_len:
            if not run_docs:
                d = doc_id(int(sa[r - 1]))
                if d >= 0:
                    run_docs.add(d)
            d = doc_id(int(sa[r]))
            if d >= 0:
                run_docs.add(d)
        else:
            for a in run_docs:
                for b in run_docs:
                    if a < b:
                        pairs.add((a, b))
            run_docs.clear()
    for a in run_docs:
        for b in run_docs:
            if a < b:
                pairs.add((a, b))
    return pairs
