"""Unit tests for the vectorized murmur3 kernels against a scalar oracle."""

import numpy as np
import pytest

from curator_ray.functions.murmur import hash_bytes_grouped, murmur3_x64_128, murmur3_x86_32


def _scalar_murmur3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~3
    for i in range(0, rounded, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
        h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    k1 = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


KNOWN_VECTORS_32 = [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"a", 0, 0x3C2569B2),
    (b"abc", 0, 0xB3DD93FA),
    (b"Hello, world!", 0, 0xC0363E43),
    (b"The quick brown fox jumps over the lazy dog", 0x9747B28C, 0x2FA826CD),
]


@pytest.mark.parametrize("data,seed,expected", KNOWN_VECTORS_32)
def test_murmur32_known_vectors(data, seed, expected):
    assert _scalar_murmur3_32(data, seed) == expected
    mat = np.frombuffer(data, dtype=np.uint8).reshape(1, -1) if data else np.zeros((1, 0), np.uint8)
    assert int(murmur3_x86_32(mat, seed)[0]) == expected


def test_murmur32_vectorized_matches_scalar_random():
    rng = np.random.RandomState(7)
    for length in [0, 1, 2, 3, 4, 5, 7, 8, 13, 24, 31]:
        mat = rng.randint(0, 256, size=(50, length)).astype(np.uint8)
        got = murmur3_x86_32(mat, seed=12345)
        for i in range(len(mat)):
            assert int(got[i]) == _scalar_murmur3_32(mat[i].tobytes(), 12345)


def test_murmur128_known():
    # smhasher verification values for MurmurHash3_x64_128
    mat = np.frombuffer(b"The quick brown fox jumps over the lazy dog", dtype=np.uint8).reshape(1, -1)
    h1, h2 = murmur3_x64_128(mat, 0)
    assert int(h1[0]) == 0xE34BBC7BBC071B6C
    assert int(h2[0]) == 0x7A433CA9C49A9347


def test_murmur128_distinct_lengths():
    rng = np.random.RandomState(3)
    seen = set()
    for length in [7, 8, 9, 15, 16, 17, 32, 33]:
        mat = rng.randint(0, 256, size=(20, length)).astype(np.uint8)
        h1, _h2 = murmur3_x64_128(mat, 42)
        seen.update(int(x) for x in h1)
    # 160 hashes, essentially all distinct
    assert len(seen) >= 158


def test_hash_bytes_grouped_matches_rowwise():
    rng = np.random.RandomState(11)
    payloads = [rng.randint(0, 256, size=rng.randint(0, 30)).astype(np.uint8) for _ in range(100)]
    buf = np.concatenate([p for p in payloads if len(p)] or [np.zeros(0, np.uint8)])
    starts, lengths, pos = [], [], 0
    for p in payloads:
        starts.append(pos)
        lengths.append(len(p))
        pos += len(p)
    starts = np.array(starts, dtype=np.int64)
    lengths = np.array(lengths, dtype=np.int64)
    got = hash_bytes_grouped(buf, starts, lengths, seed=9, bits=32)
    for i, p in enumerate(payloads):
        assert int(got[i]) == _scalar_murmur3_32(p.tobytes(), 9)
