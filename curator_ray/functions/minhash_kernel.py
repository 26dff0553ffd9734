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
    doc_ends = np.empty(n_docs, dtype=np.int64)
    doc_ends[:-1] = doc_starts[1:]
    doc_ends[-1] = m

    # Cache-blocked permutation loop: shingles are processed in ~48k-element
    # chunks (split on doc boundaries; doc_counts >= 1 so boundaries are
    # strictly increasing and chunked reduceat matches the full-array result
    # exactly).  Three 48k x 8B scratch buffers (~1.2 MB with the h slice)
    # stay resident in this box's 2 MB/core private L2 across all n_perms
    # passes, so each worker touches DRAM once for h instead of
    # 4*n_perms times — under 32-way concurrency the unblocked loop was
    # bound on the SHARED fault/DRAM path (PERF.md), which is also what the
    # 8->32 cpu scaling proxy contends on.
    #
    # The prime reduction is a Mersenne shift-fold instead of np.mod: exact,
    # because the 32-bit path never wraps (a, b < 2^31, h < 2^32 =>
    # a*h+b < 2^63) and the 64-bit path is DEFINED as mod-after-2^64-wrap
    # (reference GPU parity), which the single fold of the wrapped value
    # computes.  Fold output is < prime except for values in
    # [prime, prime+3] (32-bit double fold) / [prime, prime+7] (64-bit
    # single fold); those occur with probability ~2^-29 per element, so
    # the final conditional subtract is replaced by a max() guard with a
    # rare exact fixup pass.  (An earlier note here said the fold measured
    # slower than np.mod — that was true only for the DRAM-streaming
    # full-array loop; in-L2 the fold wins, 1.48 s -> 0.78 s per 15.6k-doc
    # batch single-core.)
    S31 = np.uint64(31)
    S61 = np.uint64(61)
    chunk_target = 48_000
    u = np.empty(min(m, chunk_target + 8_192), dtype=np.uint64)
    v = np.empty_like(u)
    d0 = 0
    while d0 < n_docs:
        s0 = doc_starts[d0]
        d1 = min(int(np.searchsorted(doc_ends, s0 + chunk_target, side="left")) + 1, n_docs)
        s1 = doc_ends[d1 - 1]
        mc = s1 - s0
        if mc > len(u):  # one giant doc exceeding the chunk target
            u = np.empty(mc, dtype=np.uint64)
            v = np.empty_like(u)
        hc = h[s0:s1]
        uc, vc = u[:mc], v[:mc]
        local_starts = doc_starts[d0:d1] - s0
        for p in range(n_perms):
            np.multiply(hc, a[p], out=uc)
            np.add(uc, b[p], out=uc)
            if use_64bit:
                # x < 2^64: one fold -> value <= prime + 7
                np.bitwise_and(uc, prime, out=vc)
                np.right_shift(uc, S61, out=uc)
                np.add(vc, uc, out=vc)
            else:
                # x < 2^63: fold twice -> value <= prime + 3
                np.bitwise_and(uc, prime, out=vc)
                np.right_shift(uc, S31, out=uc)
                np.add(vc, uc, out=vc)
                np.right_shift(vc, S31, out=uc)
                np.bitwise_and(vc, prime, out=vc)
                np.add(vc, uc, out=vc)
            if np.max(vc) >= prime:  # ~2^-29/element: finish the reduction
                np.subtract(vc, prime, out=uc)
                np.minimum(vc, uc, out=vc)
            sig[d0:d1, p] = np.minimum.reduceat(vc, local_starts)
        d0 = d1
    return sig.astype(out_dtype)
