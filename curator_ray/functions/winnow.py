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
