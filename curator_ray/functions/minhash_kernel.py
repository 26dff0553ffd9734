"""MinHash signature kernel: seeded permutations over murmur3 shingle hashes.

Reimplements the hash family of the reference's GPU MinHash
(``nemo_curator/stages/deduplication/fuzzy/minhash.py``):

- seeds: ``np.random.RandomState(seed)`` pairs ``(a, b)`` drawn per permutation
  against a Mersenne prime (2**31-1 for 32-bit, 2**61-1 for 64-bit) — the same
  construction as ``minhash.py:103-129``;
- shingle hash: murmur3 (x86_32 or the h1 half of x64_128) of each char n-gram,
  seeded with ``seeds[0][0]`` exactly like cuDF's ``str.minhash(seed=a[0])``
  (``minhash.py:131-155``);
- permutation: ``min over shingles of (a*h + b) mod P``.

Everything is vectorized: one murmur pass over all shingles in the batch, then
``np.minimum.reduceat`` per permutation chunk over doc boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .murmur import hash_bytes_grouped
from .shingles import shingle_batch

MERSENNE_31 = np.uint64((1 << 31) - 1)
MERSENNE_61 = np.uint64((1 << 61) - 1)


def generate_seeds(n_permutations: int, seed: int, bit_width: int = 32) -> np.ndarray:
    """(n_permutations, 2) array of (a, b) seed pairs; parity with reference
    ``minhash.py:103-129`` (same RandomState draw order and dtypes)."""
    gen = np.random.RandomState(seed)
    if bit_width == 32:
        prime, dtype = np.uint32((1 << 31) - 1), np.uint32
    elif bit_width == 64:
        prime, dtype = np.uint64((1 << 61) - 1), np.uint64
    else:
        raise ValueError("bit_width must be 32 or 64")
    return np.array(
        [(gen.randint(1, prime, dtype=dtype), gen.randint(0, prime, dtype=dtype)) for _ in range(n_permutations)],
        dtype=dtype,
    )


def minhash_signatures(
    captions: pa.Array | list[str],
    seeds: np.ndarray,
    char_ngram: int,
    use_64bit: bool = False,
) -> np.ndarray:
    """Compute (n_docs, n_perms) minhash signature matrix for a string batch."""
    n_perms = len(seeds)
    buf, starts, lengths, doc_counts = shingle_batch(captions, char_ngram)
    n_docs = len(doc_counts)
    out_dtype = np.uint64 if use_64bit else np.uint32
    if n_docs == 0:
        return np.zeros((0, n_perms), dtype=out_dtype)

    murmur_seed = int(seeds[0][0])
    h = hash_bytes_grouped(buf, starts, lengths, seed=murmur_seed, bits=64 if use_64bit else 32)
    h = h.astype(np.uint64)

    prime = MERSENNE_61 if use_64bit else MERSENNE_31
    a = seeds[:, 0].astype(np.uint64)
    b = seeds[:, 1].astype(np.uint64)

    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(doc_counts[:-1], out=doc_starts[1:])

    sig = np.empty((n_docs, n_perms), dtype=np.uint64)
    m = len(h)
    # one reusable (m,) scratch buffer instead of a (chunk, m) intermediate:
    # keeps the working set tiny so per-worker cold-start page-fault cost is
    # negligible and the allocator reuses the same pages every permutation.
    # (A Mersenne shift-fold reduction was measured SLOWER than np.mod here:
    # numpy's mod-by-scalar already uses a multiplicative fast path, and the
    # fold needs 6 memory passes vs 1.)
    tmp = np.empty(m, dtype=np.uint64)
    for p in range(n_perms):
        # (a*h + b) wraps mod 2**64, then mod prime — same order of
        # operations as the reference's 64-bit GPU path
        np.multiply(h, a[p], out=tmp)
        np.add(tmp, b[p], out=tmp)
        np.mod(tmp, prime, out=tmp)
        sig[:, p] = np.minimum.reduceat(tmp, doc_starts)
    return sig.astype(out_dtype)
