"""Vectorized MurmurHash3 (x86_32 and x64_128) over numpy byte matrices.

The reference computes MinHash permutations over murmur3 hashes of char n-grams
(cuDF ``Series.str.minhash`` — see reference
``nemo_curator/stages/deduplication/fuzzy/minhash.py:131-176``). This module is a
pure-numpy CPU reimplementation of the same hash family: given a matrix of
equal-length byte rows, it produces one 32-bit (or 64-bit) murmur3 hash per row,
fully vectorized across rows (the loop is over the ~L/4 blocks of a row, not
over rows).

All arithmetic uses numpy unsigned dtypes, which wrap modulo 2**width exactly
like the C reference implementation.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_U64 = np.uint64

_C1_32 = _U32(0xCC9E2D51)
_C2_32 = _U32(0x1B873593)

_C1_64 = _U64(0x87C37B91114253D5)
_C2_64 = _U64(0x4CF5AD432745937F)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix32(h: np.ndarray) -> np.ndarray:
    h ^= h >> _U32(16)
    h *= _U32(0x85EBCA6B)
    h ^= h >> _U32(13)
    h *= _U32(0xC2B2AE35)
    h ^= h >> _U32(16)
    return h


def _fmix64(k: np.ndarray) -> np.ndarray:
    k ^= k >> _U64(33)
    k *= _U64(0xFF51AFD7ED558CCD)
    k ^= k >> _U64(33)
    k *= _U64(0xC4CEB9FE1A85EC53)
    k ^= k >> _U64(33)
    return k


def murmur3_x86_32(rows: np.ndarray, seed: int = 0) -> np.ndarray:
    """murmur3_x86_32 of each row of a (n, L) uint8 matrix -> (n,) uint32.

    ``rows`` must be C-contiguous uint8 with all rows the same length L.
    """
    if rows.ndim != 2:
        raise ValueError("rows must be 2-D (n, L) uint8")
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n, length = rows.shape
    h1 = np.full(n, _U32(seed), dtype=_U32)

    nblocks = length // 4
    if nblocks:
        # little-endian uint32 view of the block region (x86 is little-endian)
        blocks = rows[:, : nblocks * 4].copy().view("<u4").reshape(n, nblocks)
        for i in range(nblocks):
            k1 = blocks[:, i].astype(_U32)
            k1 *= _C1_32
            k1 = _rotl32(k1, 15)
            k1 *= _C2_32
            h1 ^= k1
            h1 = _rotl32(h1, 13)
            h1 = h1 * _U32(5) + _U32(0xE6546B64)

    tail = length & 3
    if tail:
        base = nblocks * 4
        k1 = np.zeros(n, dtype=_U32)
        if tail >= 3:
            k1 ^= rows[:, base + 2].astype(_U32) << _U32(16)
        if tail >= 2:
            k1 ^= rows[:, base + 1].astype(_U32) << _U32(8)
        k1 ^= rows[:, base].astype(_U32)
        k1 *= _C1_32
        k1 = _rotl32(k1, 15)
        k1 *= _C2_32
        h1 ^= k1

    h1 ^= _U32(length)
    return _fmix32(h1)


def murmur3_x64_128(rows: np.ndarray, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """murmur3_x64_128 of each row of a (n, L) uint8 matrix -> (h1, h2) uint64 pair."""
    if rows.ndim != 2:
        raise ValueError("rows must be 2-D (n, L) uint8")
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n, length = rows.shape
    h1 = np.full(n, _U64(seed), dtype=_U64)
    h2 = np.full(n, _U64(seed), dtype=_U64)

    nblocks = length // 16
    if nblocks:
        blocks = rows[:, : nblocks * 16].copy().view("<u8").reshape(n, nblocks * 2)
        for i in range(nblocks):
            k1 = blocks[:, 2 * i].astype(_U64)
            k2 = blocks[:, 2 * i + 1].astype(_U64)

            k1 *= _C1_64
            k1 = _rotl64(k1, 31)
            k1 *= _C2_64
            h1 ^= k1
            h1 = _rotl64(h1, 27)
            h1 += h2
            h1 = h1 * _U64(5) + _U64(0x52DCE729)

            k2 *= _C2_64
            k2 = _rotl64(k2, 33)
            k2 *= _C1_64
            h2 ^= k2
            h2 = _rotl64(h2, 31)
            h2 += h1
            h2 = h2 * _U64(5) + _U64(0x38495AB5)

    tail = length & 15
    if tail:
        base = nblocks * 16
        k1 = np.zeros(n, dtype=_U64)
        k2 = np.zeros(n, dtype=_U64)
        for i in range(tail - 1, -1, -1):
            byte = rows[:, base + i].astype(_U64)
            if i >= 8:
                k2 ^= byte << _U64(8 * (i - 8))
            else:
                k1 ^= byte << _U64(8 * i)
        if tail > 8:
            k2 *= _C2_64
            k2 = _rotl64(k2, 33)
            k2 *= _C1_64
            h2 ^= k2
        k1 *= _C1_64
        k1 = _rotl64(k1, 31)
        k1 *= _C2_64
        h1 ^= k1

    h1 ^= _U64(length)
    h2 ^= _U64(length)
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    h2 += h1
    return h1, h2


def hash_bytes_grouped(
    buf: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    seed: int = 0,
    bits: int = 32,
) -> np.ndarray:
    """Murmur3-hash m variable-length byte slices out of one flat uint8 buffer.

    ``buf`` is the concatenation of all payloads; slice i is
    ``buf[starts[i] : starts[i] + lengths[i]]``. Slices are grouped by length so
    each distinct length is hashed as one vectorized (m_L, L) matrix call.
    Returns uint32 (bits=32) or uint64 (bits=64, the h1 half of x64_128).
    """
    m = len(starts)
    out = np.zeros(m, dtype=_U64 if bits == 64 else _U32)
    if m == 0:
        return out
    order = np.argsort(lengths, kind="stable")
    sorted_len = lengths[order]
    # contiguous runs of equal length
    boundaries = np.flatnonzero(np.diff(sorted_len)) + 1
    for grp in np.split(order, boundaries):
        length = int(lengths[grp[0]])
        if length == 0:
            empty = np.zeros((len(grp), 0), dtype=np.uint8)
            if bits == 64:
                out[grp] = murmur3_x64_128(empty, seed)[0]
            else:
                out[grp] = murmur3_x86_32(empty, seed)
            continue
        # one row-gather out of a zero-copy sliding-window view: avoids
        # materializing the (m, L) int64 index matrix (8L bytes/slice of pure
        # allocation traffic — measured 2.6 s/315k slices on the fault-bound
        # sandbox vs ~60 ms for the windowed gather)
        win = np.lib.stride_tricks.sliding_window_view(buf, length)
        mat = win[starts[grp]]
        if bits == 64:
            out[grp] = murmur3_x64_128(mat, seed)[0]
        else:
            out[grp] = murmur3_x86_32(mat, seed)
    return out
