"""MinHash kernel properties, ported from the reference test strategy
(``tests/stages/deduplication/fuzzy/test_minhash.py:51-150``): determinism,
signature length, and minhash-overlap ≈ true char-ngram Jaccard within 0.15.
"""

import numpy as np
import pyarrow as pa

from curator_ray.functions.minhash_kernel import generate_seeds, minhash_signatures
from curator_ray.functions.shingles import shingle_batch

CAPTIONS = [
    "A test string",
    "A different test string",
    "A different object",
    "The quick brown fox jumps over the lazy dog",
    "The quick black cat jumps over the lazy dog",
]


def _true_jaccard(a: str, b: str, k: int) -> float:
    def sh(s):
        if len(s) < k:
            return {s}
        return {s[i : i + k] for i in range(len(s) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_seed_generation_matches_reference_construction():
    s1 = generate_seeds(20, seed=42, bit_width=32)
    s2 = generate_seeds(20, seed=42, bit_width=32)
    np.testing.assert_array_equal(s1, s2)
    assert s1.dtype == np.uint32 and s1.shape == (20, 2)
    s64 = generate_seeds(18, seed=32768, bit_width=64)
    assert s64.dtype == np.uint64 and s64.shape == (18, 2)


def test_shingle_counts():
    _, _, lengths, counts = shingle_batch(pa.array(CAPTIONS), 5)
    for cap, c in zip(CAPTIONS, counts):
        assert c == max(1, len(cap) - 5 + 1)
    assert (lengths[np.repeat([len(c) >= 5 for c in CAPTIONS], counts)] == 5).all()


def test_shingles_unicode():
    caps = ["héllo wörld", "日本語のテキスト", "ab"]
    buf, starts, lens, counts = shingle_batch(pa.array(caps), 3)
    # char counts, not byte counts
    assert counts[0] == len(caps[0]) - 2
    assert counts[1] == len(caps[1]) - 2
    assert counts[2] == 1  # short doc -> whole string
    # reconstruct first shingle of doc 1 and verify it is valid utf-8 of 3 chars
    first_idx = counts[0]
    s = bytes(buf[starts[first_idx] : starts[first_idx] + lens[first_idx]].tobytes()).decode("utf-8")
    assert s == caps[1][:3]


def _overlap(sig_a, sig_b):
    return float(np.mean(sig_a == sig_b))


def test_minhash_identical_config_identical_sigs():
    for bits in (False, True):
        seeds = generate_seeds(20, 42, 64 if bits else 32)
        s1 = minhash_signatures(pa.array(CAPTIONS), seeds, 5, use_64bit=bits)
        s2 = minhash_signatures(pa.array(CAPTIONS), seeds, 5, use_64bit=bits)
        np.testing.assert_array_equal(s1, s2)
        assert s1.shape == (5, 20)


def test_minhash_overlap_approximates_jaccard():
    for seed, k, n, bits in [(42, 5, 260, False), (32768, 10, 260, True)]:
        seeds = generate_seeds(n, seed, 64 if bits else 32)
        sig = minhash_signatures(pa.array(CAPTIONS), seeds, k, use_64bit=bits)
        for i in range(len(CAPTIONS)):
            for j in range(i + 1, len(CAPTIONS)):
                est = _overlap(sig[i], sig[j])
                true = _true_jaccard(CAPTIONS[i], CAPTIONS[j], k)
                assert abs(est - true) <= 0.15, (i, j, est, true)


def test_minhash_empty_and_short():
    seeds = generate_seeds(8, 42, 32)
    sig = minhash_signatures(pa.array(["", "ab", "ab"]), seeds, 5)
    assert sig.shape == (3, 8)
    np.testing.assert_array_equal(sig[1], sig[2])
