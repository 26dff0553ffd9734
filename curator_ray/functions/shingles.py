"""Vectorized char n-gram shingling of a batch of UTF-8 strings.

Mirrors the semantics of cuDF's ``str.minhash(width=k)`` shingling used by the
reference (``nemo_curator/stages/deduplication/fuzzy/minhash.py:131-176``):
overlapping character (not byte) n-grams of width ``k``; a string shorter than
``k`` characters contributes a single shingle equal to the whole string.

Output is a flat representation suitable for grouped vectorized hashing:
one concatenated byte buffer + per-shingle (start, length) + per-doc counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _string_array_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, offsets) from a pyarrow string/binary array."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    elif pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.binary())
    if not (pa.types.is_string(arr.type) or pa.types.is_binary(arr.type)):
        arr = arr.cast(pa.string())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + arr.offset + 1)[arr.offset :]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    return data, offsets.astype(np.int64)


def shingle_batch(arr: pa.Array | list[str], k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shingle a batch of strings into char n-grams of width ``k``.

    Returns ``(buf, starts, lengths, doc_counts)`` where ``buf`` is the shared
    uint8 buffer, ``starts``/``lengths`` address each shingle inside it, and
    ``doc_counts[i]`` is the number of shingles document i produced (>= 1).
    """
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(["" if s is None else s for s in arr], type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    data, offsets = _string_array_buffers(arr)
    n = len(offsets) - 1
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return data, z, z, z

    # UTF-8 char starts: bytes that are not continuation bytes (0b10xxxxxx)
    region = data[offsets[0] : offsets[-1]]
    char_start_pos = np.flatnonzero((region & 0xC0) != 0x80).astype(np.int64) + offsets[0]
    # per-doc char-start index range
    lo = np.searchsorted(char_start_pos, offsets[:-1], side="left")
    hi = np.searchsorted(char_start_pos, offsets[1:], side="left")
    char_counts = hi - lo

    full = char_counts >= k
    doc_counts = np.where(full, char_counts - k + 1, 1).astype(np.int64)
    total = int(doc_counts.sum())

    starts = np.empty(total, dtype=np.int64)
    lengths = np.empty(total, dtype=np.int64)

    # ragged index: for each doc, its shingle slots in the output
    out_base = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doc_counts, out=out_base[1:])

    # docs with >= k chars: shingle j starts at char_start_pos[lo[i] + j],
    # ends at char_start_pos[lo[i] + j + k] (or doc byte end for the last ones)
    if full.any():
        fidx = np.flatnonzero(full)
        cnts = doc_counts[fidx]
        rep_doc = np.repeat(fidx, cnts)
        # slot = shingle index within its doc (0..cnt-1), built ragged-range style
        first = np.zeros(len(rep_doc), dtype=np.int64)
        first[np.cumsum(cnts)[:-1]] = cnts[:-1]
        slot = np.arange(len(rep_doc)) - np.cumsum(first)
        char_idx = lo[rep_doc] + slot
        s = char_start_pos[char_idx]
        end_char_idx = char_idx + k
        # end byte: char_start_pos[end_char_idx] when that char exists inside the
        # same doc, else the doc's end offset
        doc_hi = hi[rep_doc]
        e = np.where(
            end_char_idx < doc_hi,
            char_start_pos[np.minimum(end_char_idx, len(char_start_pos) - 1)],
            offsets[1:][rep_doc],
        )
        dest = np.repeat(out_base[fidx], cnts) + slot
        starts[dest] = s
        lengths[dest] = e - s

    # short docs: one shingle = whole string
    if (~full).any():
        sidx = np.flatnonzero(~full)
        dest = out_base[sidx]
        starts[dest] = offsets[:-1][sidx]
        lengths[dest] = offsets[1:][sidx] - offsets[:-1][sidx]

    return data, starts, lengths, doc_counts
