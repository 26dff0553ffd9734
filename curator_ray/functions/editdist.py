"""Levenshtein edit distance + alignment-op detail for WER/CER metrics.

Re-implements the math behind the reference's WER stage
(``reference/nemo_curator/stages/audio/metrics/wer.py:211-262``), which calls
NeMo's ``word_error_rate_detail`` — rate plus insertion/deletion/substitution
rates normalized by the reference token count. Neither NeMo nor
``editdistance`` ships in this sandbox, so the DP is implemented here from
the textbook recurrence:

- ``levenshtein_batch``: distance only, vectorized across the inner axis
  with the prefix-min trick (``d[j] = min_k<=j (c[k] + j - k)`` via
  ``np.minimum.accumulate(c - j) + j``), O(n) numpy ops per DP row. Used for
  the hot CER path (oracle-checkable against DuckDB ``levenshtein``).
- ``edit_ops``: full matrix + backtrace for (ins, del, sub) counts, used for
  the detail metrics (strings are short post-cleaning; O(nm) per pair).

Token spaces are interned to int codes first so word-level WER runs the same
integer DP as char-level CER.
"""

from __future__ import annotations

import numpy as np


def _encode(tokens: list) -> np.ndarray:
    return np.asarray(tokens, dtype=object)


def levenshtein(a: np.ndarray, b: np.ndarray) -> int:
    """Edit distance between two token arrays (any dtype supporting ==)."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(m + 1, dtype=np.int64)
    j_idx = np.arange(m + 1, dtype=np.int64)
    for i in range(n):
        sub = prev[:-1] + (a[i] != b)
        cand = np.empty(m + 1, dtype=np.int64)
        cand[0] = prev[0] + 1
        cand[1:] = np.minimum(prev[1:] + 1, sub)
        # cascade the insertion term: d[j] = min_{k<=j} cand[k] + (j-k)
        prev = np.minimum.accumulate(cand - j_idx) + j_idx
    return int(prev[m])


def edit_ops(a, b) -> tuple[int, int, int, int]:
    """(distance, insertions, deletions, substitutions) transforming ``b``
    (reference) into ``a`` (hypothesis), from the standard backtrace that
    prefers substitution on ties (the convention NeMo's detail output
    follows: S + D + I = distance, rates normalized by len(reference))."""
    a = np.asarray(a, dtype=object) if not isinstance(a, np.ndarray) else a
    b = np.asarray(b, dtype=object) if not isinstance(b, np.ndarray) else b
    n, m = len(a), len(b)  # rows = hypothesis, cols = reference
    d = np.zeros((n + 1, m + 1), dtype=np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        sub = d[i - 1, :-1] + (a[i - 1] != b)
        cand = np.minimum(d[i - 1, 1:] + 1, sub)
        row = np.empty(m + 1, dtype=np.int32)
        row[0] = i
        row[1:] = cand
        j_idx = np.arange(m + 1, dtype=np.int32)
        d[i] = np.minimum.accumulate(row - j_idx) + j_idx
    ins = dele = subs = 0
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + (a[i - 1] != b[j - 1]):
            if a[i - 1] != b[j - 1]:
                subs += 1
            i, j = i - 1, j - 1
        elif j > 0 and d[i, j] == d[i, j - 1] + 1:
            dele += 1  # token in reference missing from hypothesis
            j -= 1
        else:
            ins += 1  # extra token in hypothesis
            i -= 1
    return int(d[n, m]), ins, dele, subs


def error_rate_detail(
    hypotheses: list[str],
    references: list[str],
    use_cer: bool = False,
) -> dict[str, np.ndarray]:
    """Per-pair WER/CER detail: rate, reference-token count, and
    ins/del/sub rates (each normalized by the reference token count).

    Empty reference: rate is 0.0 when the hypothesis is empty too, else
    ``inf`` (the reference's NeMo dependency uses the same convention).
    """
    k = len(hypotheses)
    rate = np.zeros(k, dtype=np.float64)
    tokens = np.zeros(k, dtype=np.int64)
    ins_r = np.zeros(k, dtype=np.float64)
    del_r = np.zeros(k, dtype=np.float64)
    sub_r = np.zeros(k, dtype=np.float64)
    for idx, (h, r) in enumerate(zip(hypotheses, references)):
        ht = list(h) if use_cer else h.split()
        rt = list(r) if use_cer else r.split()
        dist, ins, dele, subs = edit_ops(_encode(ht), _encode(rt))
        tokens[idx] = len(rt)
        if len(rt) == 0:
            rate[idx] = 0.0 if dist == 0 else np.inf
            continue
        rate[idx] = dist / len(rt)
        ins_r[idx] = ins / len(rt)
        del_r[idx] = dele / len(rt)
        sub_r[idx] = subs / len(rt)
    return {
        "rate": rate,
        "tokens": tokens,
        "ins_rate": ins_r,
        "del_rate": del_r,
        "sub_rate": sub_r,
    }


def char_distance_batch(hypotheses, references) -> np.ndarray:
    """Distance-only char-level Levenshtein per pair (DuckDB
    ``levenshtein``-equivalent; the oracle check for the CER column)."""
    out = np.zeros(len(hypotheses), dtype=np.int64)
    for i, (h, r) in enumerate(zip(hypotheses, references)):
        hb = np.frombuffer(h.encode("utf-32-le"), dtype=np.uint32)
        rb = np.frombuffer(r.encode("utf-32-le"), dtype=np.uint32)
        out[i] = levenshtein(hb, rb)
    return out
