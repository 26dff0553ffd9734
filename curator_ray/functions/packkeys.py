"""128-bit key packing for vectorized membership lookups.

Packs (hi, lo) uint64 pairs into big-endian 16-byte void scalars whose memcmp
order equals numeric order, so a sorted packed array supports
``np.searchsorted`` — giving O(log n) vectorized membership/lookup against a
broadcast key table without Python-level hashing.
"""

from __future__ import annotations

import numpy as np


def pack_u128(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(n,) void16 array; lexicographic byte order == (hi, lo) numeric order."""
    n = len(hi)
    out = np.empty((n, 16), dtype=np.uint8)
    out[:, :8] = hi.astype(">u8").view(np.uint8).reshape(n, 8)
    out[:, 8:] = lo.astype(">u8").view(np.uint8).reshape(n, 8)
    return out.reshape(n * 16).view("V16")


def lookup_sorted(sorted_keys: np.ndarray, sorted_values: np.ndarray, probe: np.ndarray):
    """For each probe key: (found_mask, value_or_0). All arrays are packed
    void16 (or any sortable dtype); ``sorted_keys`` must be pre-sorted."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool), np.zeros(len(probe), dtype=sorted_values.dtype if len(sorted_values) else np.int64)
    pos = np.searchsorted(sorted_keys, probe)
    found = np.zeros(len(probe), dtype=bool)
    valid = pos < len(sorted_keys)
    found[valid] = sorted_keys[pos[valid]] == probe[valid]
    vals = np.zeros(len(probe), dtype=sorted_values.dtype)
    vals[found] = sorted_values[pos[found]]
    return found, vals
