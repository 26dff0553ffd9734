"""Rolling-hash window fingerprints + winnowing for exact-substring dedup.

Two documents share an exact substring of length >= L iff they share at least
one L-byte window, so bucketing window hashes finds exact-substring duplicate
pairs with the same shuffle shape as LSH — fully distributed, unlike a global
suffix array. To bound fingerprint volume, winnowing (Schleimer, Wilkerson,
Aiken, SIGMOD 2003 — the MOSS algorithm) keeps only windows that are minima
over ``w`` consecutive window hashes, which still guarantees any shared
substring of length >= L + w - 1 shares a selected fingerprint.

Hashes are 64-bit polynomial rolling hashes (Rabin-Karp), computed vectorized
with a prefix-product trick: H[i..i+L) = P[i+L] - P[i] * B^L (mod 2^64).
"""

from __future__ import annotations

import numpy as np

_BASE = np.uint64(0x100000001B3)  # FNV prime, odd -> invertible mod 2^64


def window_hashes(data: np.ndarray, L: int) -> np.ndarray:
    """All L-byte window hashes of a uint8 array -> (len-L+1,) uint64."""
    n = len(data)
    if n < L:
        return np.zeros(0, dtype=np.uint64)
    x = data.astype(np.uint64) + np.uint64(1)
    powers = np.empty(n, dtype=np.uint64)
    powers[0] = np.uint64(1)
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _BASE, dtype=np.uint64), out=powers[1:])
    # S[k] = sum_{j<k} x[j] * B^{-j}; window hash = (S[i+L]-S[i]) * B^{i+L-1},
    # all mod 2^64 where B is invertible because it is odd.
    binv = _modinv_pow2(_BASE)
    binv_pows = np.empty(n, dtype=np.uint64)
    binv_pows[0] = np.uint64(1)
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, binv, dtype=np.uint64), out=binv_pows[1:])
    weighted = x * binv_pows  # x[j] * B^{-j}
    S = np.concatenate([[np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)])
    # H[i] = (S[i+L] - S[i]) * B^{i+L-1}
    idx = np.arange(n - L + 1)
    return (S[idx + L] - S[idx]) * powers[np.minimum(idx + L - 1, n - 1)]


def _modinv_pow2(a: np.uint64) -> np.uint64:
    """Inverse of odd a modulo 2^64 (Newton iteration)."""
    x = a  # 3 bits correct
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (np.uint64(2) - a * x)
    return x


def winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Indices of winnowing-selected fingerprints (local minima over windows
    of ``w`` consecutive hashes; rightmost minimum per window, deduped)."""
    m = len(hashes)
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    if m <= w:
        return np.array([int(np.argmin(hashes))], dtype=np.int64)
    # sliding window minimum via stride trick on (m-w+1, w) view
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(hashes, w)
    mins = win.min(axis=1)
    # rightmost position of the min in each window
    rev = win[:, ::-1]
    pos = w - 1 - np.argmin(rev, axis=1) + np.arange(len(win))
    return np.unique(pos).astype(np.int64)


def doc_fingerprints(text: str, fp_len: int, winnow_window: int = 8) -> np.ndarray:
    """Winnowed fingerprint set of one document (uint64)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = window_hashes(data, fp_len)
    if len(h) == 0:
        return np.zeros(0, dtype=np.uint64)
    return h[winnow(h, winnow_window)]


def batch_fingerprints(texts, fp_len: int, winnow_window: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed fingerprints for a whole batch of strings in one vectorized
    pass -> (fps: uint64, doc_idx: int64), selection-identical to calling
    ``doc_fingerprints`` per document.

    One rolling-hash prefix scan over the concatenated buffer (the window hash
    formula depends only on window content, so a single global scan is valid),
    then per-document winnowing via a global sliding-window minimum restricted
    to windows that lie inside one document.
    """
    import pyarrow as pa
    from numpy.lib.stride_tricks import sliding_window_view

    from .shingles import _string_array_buffers

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(["" if t is None else t for t in texts], pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = texts.fill_null("")
    data, offsets = _string_array_buffers(texts)
    n_docs = len(offsets) - 1
    total = int(offsets[-1] - offsets[0])
    if n_docs == 0 or total == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    base = offsets[0]
    buf = data[base : offsets[-1]]
    L, w = fp_len, winnow_window

    # global window hashes over the concatenated buffer
    H = window_hashes(buf, L)
    if len(H) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)

    starts = (offsets[:-1] - base).astype(np.int64)
    ends = (offsets[1:] - base).astype(np.int64)
    # doc d's window-hash positions: [starts[d], ends[d] - L]  (inclusive)
    seg_lo = starts
    seg_hi = np.minimum(ends - L + 1, len(H))  # exclusive
    seg_len = np.maximum(seg_hi - seg_lo, 0)

    selected = []
    long_mask = seg_len > w
    # --- segments longer than the winnow window: global sliding minima -----
    if long_mask.any() and len(H) >= w:
        win = sliding_window_view(H, w)
        rev_arg = np.argmin(win[:, ::-1], axis=1)
        pos_rightmost = (w - 1 - rev_arg) + np.arange(len(win))
        # keep only windows fully inside a single doc segment
        widx = np.arange(len(win))
        doc_of = np.searchsorted(seg_lo, widx, side="right") - 1
        doc_of = np.clip(doc_of, 0, n_docs - 1)
        inside = long_mask[doc_of] & (widx >= seg_lo[doc_of]) & (widx + w <= seg_hi[doc_of])
        selected.append(pos_rightmost[inside])
    # --- short segments (1..w hashes): leftmost argmin, like winnow() ------
    short_mask = (seg_len > 0) & ~long_mask
    if short_mask.any():
        for d in np.flatnonzero(short_mask):
            seg = H[seg_lo[d] : seg_hi[d]]
            selected.append(np.array([seg_lo[d] + int(np.argmin(seg))], dtype=np.int64))
    if not selected:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    pos = np.unique(np.concatenate(selected))
    doc_idx = np.searchsorted(seg_lo, pos, side="right") - 1
    return H[pos], doc_idx.astype(np.int64)
