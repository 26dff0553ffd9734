"""Shared hashed bag-of-words kernels.

One implementation of whitespace-tokenize -> murmur64 -> vocab-mod and of
mean pooling / softmax, used by the classifier scaffold
(``stages/classifier.py``), the embedding creator (``stages/embedder.py``)
and the fastText stub model — so tokenization and empty-document semantics
cannot silently diverge between them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def whitespace_token_ids(
    texts: pa.Array, vocab_size: int, seed: int, max_chars: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """``(flat_ids int64, per-doc counts int64)`` — whitespace tokenization
    (\\n acts like any separator), murmur64 hash mod ``vocab_size``.
    Blank / empty / null docs contribute 0 tokens. Flat ids are in document
    order, so ``np.add.reduceat`` over ``cumsum(counts)`` segments pools
    per document."""
    from .murmur import hash_bytes_grouped
    from .shingles import _string_array_buffers

    trimmed = pc.utf8_trim_whitespace(texts)
    if max_chars is not None:
        trimmed = pc.utf8_slice_codeunits(trimmed, 0, max_chars)
    splits = pc.split_pattern_regex(trimmed, r"\s+")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    n_docs = len(splits)
    raw_counts = pc.list_value_length(splits).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = splits.flatten()
    doc_idx = np.repeat(np.arange(n_docs), raw_counts)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    doc_idx = doc_idx[nonempty]
    if len(flat) == 0:
        return np.zeros(0, np.int64), np.zeros(n_docs, np.int64)
    data, offsets = _string_array_buffers(flat)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h = hash_bytes_grouped(data, offsets[:-1], lengths, seed=seed, bits=64)
    ids = (h % np.uint64(vocab_size)).astype(np.int64)
    counts = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    return ids, counts


def mean_pool(emb: np.ndarray, flat_ids: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Mean of ``emb[flat_ids]`` per document segment -> (n_docs, dim)
    float32; empty docs pool to the zero vector."""
    n = len(counts)
    out = np.zeros((n, emb.shape[1]), dtype=np.float32)
    if len(flat_ids):
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        valid = counts > 0
        # reduceat over the (strictly increasing) starts of nonempty docs:
        # empty docs contribute no rows, so segments cover each doc exactly
        sums = np.add.reduceat(emb[flat_ids], offsets[:-1][valid], axis=0)
        out[valid] = sums / counts[valid][:, None]
    return out


def softmax(logits: np.ndarray) -> np.ndarray:
    logits = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    return e / e.sum(axis=1, keepdims=True)
