"""Exact word-n-gram Jaccard near-duplicate pairs.

The reference's fuzzy stack approximates Jaccard via MinHash banding
(``nemo_curator/stages/deduplication/fuzzy/workflow.py``); this stage is the
EXACT counterpart used (a) as a DuckDB-checkable oracle query and (b) as the
verification step after LSH candidate generation. Pipeline (all Ray Data,
no driver pass over full data):

1. ``map_batches`` posting builder: tokenize (lowercase ``[a-z0-9]+`` runs,
   matching ``regexp_extract_all(lower(text), '[a-z0-9]+')``), hash words
   (vectorized murmur64), mix consecutive word hashes into n-gram hashes,
   keep DISTINCT grams per doc -> rows ``(gram, doc, size)``;
2. ``sort("gram")`` + vectorized run scan: every gram's posting run expands
   into candidate pair rows ``(id_a, id_b, na, nb)`` (one per shared gram);
   runs split across block boundaries pass through and are expanded on the
   driver (~2 rows/block);
3. ``sort(["id_a", "id_b"])`` + run scan: run length = intersection size c;
   keep pairs with ``c / (na + nb - c) >= threshold``.

Scale note: step 2 is quadratic in a gram's document frequency (sum over
grams of df^2 pairs). That is inherent to EXACT all-pair Jaccard — at corpus
scale run this after an LSH candidate filter, or rely on the MinHash path
(``pipelines/fuzzy.py``) and treat this as the verifier. ``max_df`` guards
the hot-gram blowup loudly instead of hanging a task.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.murmur import hash_bytes_grouped
from ..functions.shingles import _string_array_buffers

_PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
)


def _mix64(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer — combines word hashes into order-sensitive gram ids
    x = x.copy()
    x ^= x >> 30
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> 27
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> 31
    return x


def doc_gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct word-n-gram hashes per document.

    Returns ``(doc_idx, gram)``: uint64 gram hashes with the batch-local doc
    index each belongs to, deduped per doc. Tokenization is lowercase
    ``[a-z0-9]+`` runs — bit-equivalent to the DuckDB oracle's
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
    """
    from .cc import dedup_pairs

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = pc.fill_null(texts, "")  # null doc == empty doc (no grams)
    lower = pc.utf8_lower(texts)
    words = pc.split_pattern_regex(lower, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(words)
    counts = pc.list_value_length(words).to_numpy().astype(np.int64)
    nonempty = pc.not_equal(flat, "")
    # per-doc word counts after dropping the empty fragments split() produces
    doc_of_word = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    doc_of_word = doc_of_word[keep]
    wc = np.bincount(doc_of_word, minlength=len(counts)).astype(np.int64)

    buf, offsets = _string_array_buffers(flat)
    wh = hash_bytes_grouped(buf, offsets[:-1], np.diff(offsets), seed=7, bits=64)

    # n-gram start positions: within each doc, indices [s, s + wc_d - n]
    starts = np.concatenate([[0], np.cumsum(wc)[:-1]])
    gc = np.maximum(wc - n + 1, 0)
    g_doc = np.repeat(np.arange(len(wc), dtype=np.int64), gc)
    g_pos = np.arange(len(g_doc), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(gc)[:-1]]), gc
    ) + np.repeat(starts, gc)
    gram = np.zeros(len(g_pos), dtype=np.uint64)
    for j in range(n):
        gram = _mix64(gram ^ wh[g_pos + j])
    d_idx, g64 = dedup_pairs(g_doc, gram.view(np.int64))
    return d_idx, g64


def _posting_batch(batch: pa.Table, *, text_field: str, id_field: str, n: int) -> pa.Table:
    ids = batch.column(id_field).to_numpy()
    d_idx, g64 = doc_gram_hashes(batch.column(text_field), n)
    sizes = np.bincount(d_idx, minlength=len(ids)).astype(np.int64)
    return pa.table(
        {
            "gram": pa.array(g64, pa.int64()),
            "doc": pa.array(ids[d_idx], pa.int64()),
            "size": pa.array(sizes[d_idx], pa.int64()),
        }
    )


def _pairs_from_runs(doc, size, starts, ends, max_df: int):
    """All i<j pairs (by doc id) within each complete gram run."""
    outs_a, outs_b, outs_na, outs_nb = [], [], [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > max_df:
            raise RuntimeError(
                f"gram posting list of length {m} exceeds max_df={max_df}; "
                "exact n-gram Jaccard is quadratic in document frequency — "
                "run it after an LSH candidate filter at this scale"
            )
        d = doc[s:e]
        z = size[s:e]
        order = np.argsort(d, kind="stable")
        d, z = d[order], z[order]
        iu, ju = np.triu_indices(m, k=1)
        outs_a.append(d[iu])
        outs_b.append(d[ju])
        outs_na.append(z[iu])
        outs_nb.append(z[ju])
    if not outs_a:
        return (np.zeros(0, np.int64),) * 4
    return (
        np.concatenate(outs_a),
        np.concatenate(outs_b),
        np.concatenate(outs_na),
        np.concatenate(outs_nb),
    )


def _scan_posting_block(batch: pa.Table, *, max_df: int) -> pa.Table:
    """Sorted-by-gram block -> interior runs expand to pair rows; the first and
    last run pass through raw (they may continue in neighbor blocks)."""
    nrows = len(batch)
    empty_pass = {
        "gram": pa.array([], pa.int64()),
        "doc": pa.array([], pa.int64()),
        "size": pa.array([], pa.int64()),
    }
    if nrows == 0:
        out = {k: pa.array([], pa.int64()) for k in ("id_a", "id_b", "na", "nb")}
        out.update(empty_pass)
        return pa.table(out)
    gram = batch.column("gram").to_numpy()
    doc = batch.column("doc").to_numpy()
    size = batch.column("size").to_numpy()
    new_run = np.concatenate([[True], gram[1:] != gram[:-1]])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], nrows)
    nruns = len(starts)
    interior = np.ones(nruns, dtype=bool)
    interior[0] = False
    interior[-1] = False
    a, b, na, nb = _pairs_from_runs(doc, size, starts[interior], ends[interior], max_df)
    # boundary passthrough rows
    bmask = np.zeros(nrows, dtype=bool)
    bmask[starts[0] : ends[0]] = True
    bmask[starts[-1] : ends[-1]] = True
    np_rows = int(bmask.sum())
    nm = len(a)
    return pa.table(
        {
            "id_a": pa.array(np.concatenate([a, np.full(np_rows, -1)]), pa.int64()),
            "id_b": pa.array(np.concatenate([b, np.zeros(np_rows, np.int64)]), pa.int64()),
            "na": pa.array(np.concatenate([na, np.zeros(np_rows, np.int64)]), pa.int64()),
            "nb": pa.array(np.concatenate([nb, np.zeros(np_rows, np.int64)]), pa.int64()),
            "gram": pa.array(np.concatenate([np.zeros(nm, np.int64), gram[bmask]]), pa.int64()),
            "doc": pa.array(np.concatenate([np.zeros(nm, np.int64), doc[bmask]]), pa.int64()),
            "size": pa.array(np.concatenate([np.zeros(nm, np.int64), size[bmask]]), pa.int64()),
        }
    )


def _scan_pair_block(batch: pa.Table, *, threshold: float) -> pa.Table:
    """Sorted-by-(id_a,id_b) block of per-gram pair rows -> interior pair runs
    resolve to (id_a, id_b) if Jaccard >= threshold; boundary runs pass
    through with their partial count."""
    nrows = len(batch)
    if nrows == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "na": pa.array([], pa.int64()),
                "nb": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "final": pa.array([], pa.int8()),
            }
        )
    a = batch.column("id_a").to_numpy()
    b = batch.column("id_b").to_numpy()
    na = batch.column("na").to_numpy()
    nb = batch.column("nb").to_numpy()
    new_run = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    starts = np.flatnonzero(new_run)
    sizes = np.diff(np.append(starts, nrows))
    nruns = len(starts)
    boundary = np.zeros(nruns, dtype=bool)
    boundary[0] = True
    boundary[-1] = True
    c = sizes.astype(np.int64)
    union = na[starts] + nb[starts] - c
    ok = ~boundary & (c.astype(np.float64) / union >= threshold)
    emit = ok | boundary
    return pa.table(
        {
            "id_a": pa.array(a[starts[emit]], pa.int64()),
            "id_b": pa.array(b[starts[emit]], pa.int64()),
            "na": pa.array(na[starts[emit]], pa.int64()),
            "nb": pa.array(nb[starts[emit]], pa.int64()),
            "cnt": pa.array(c[emit], pa.int64()),
            "final": pa.array((~boundary[emit]).astype(np.int8), pa.int8()),
        }
    )


def ngram_jaccard_pairs(ds, text_field: str = "text", id_field: str = "doc_id", n: int = 3, threshold: float = 0.8, max_df: int = 100_000):
    """Dataset -> Dataset[(id_a, id_b)] of doc pairs with word-n-gram Jaccard
    similarity >= threshold (exact), id_a < id_b, sorted."""
    import ray

    from .cc import _collect_small

    postings = ds.map_batches(
        functools.partial(_posting_batch, text_field=text_field, id_field=id_field, n=n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = (
        postings.sort("gram")
        .map_batches(
            functools.partial(_scan_posting_block, max_df=max_df),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    pair_rows = scanned.map_batches(
        lambda t: t.select(["id_a", "id_b", "na", "nb"]).filter(pc.not_equal(t.column("id_a"), -1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # boundary postings: ~2 runs per block — expand on the driver
    bt = _collect_small(
        scanned.map_batches(
            lambda t: t.filter(pc.equal(t.column("id_a"), -1)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["gram", "doc", "size"],
    )
    g = bt.column("gram").to_numpy()
    d = bt.column("doc").to_numpy()
    z = bt.column("size").to_numpy()
    order = np.argsort(g, kind="stable")
    g, d, z = g[order], d[order], z[order]
    rstarts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]])) if len(g) else np.zeros(0, np.int64)
    rends = np.append(rstarts[1:], len(g))
    a, b, na, nb = _pairs_from_runs(d, z, rstarts, rends, max_df)
    boundary_pairs = pa.table(
        {
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "na": pa.array(na, pa.int64()),
            "nb": pa.array(nb, pa.int64()),
        }
    )
    all_pairs = pair_rows.union(ray.data.from_arrow(boundary_pairs))

    scanned2 = (
        all_pairs.sort(["id_a", "id_b"])
        .map_batches(
            functools.partial(_scan_pair_block, threshold=threshold),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    finals = scanned2.map_batches(
        lambda t: t.select(["id_a", "id_b"]).filter(pc.equal(t.column("final"), 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bt2 = _collect_small(
        scanned2.map_batches(
            lambda t: t.filter(pc.equal(t.column("final"), 0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["id_a", "id_b", "na", "nb", "cnt"],
    )
    a2 = bt2.column("id_a").to_numpy()
    b2 = bt2.column("id_b").to_numpy()
    na2 = bt2.column("na").to_numpy()
    nb2 = bt2.column("nb").to_numpy()
    c2 = bt2.column("cnt").to_numpy()
    order = np.lexsort((b2, a2))
    a2, b2, na2, nb2, c2 = a2[order], b2[order], na2[order], nb2[order], c2[order]
    rs = np.flatnonzero(np.concatenate([[True], (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])])) if len(a2) else np.zeros(0, np.int64)
    csum = np.add.reduceat(c2, rs) if len(a2) else np.zeros(0, np.int64)
    union = na2[rs] + nb2[rs] - csum if len(a2) else np.zeros(0, np.int64)
    okm = csum.astype(np.float64) / np.maximum(union, 1) >= threshold if len(a2) else np.zeros(0, bool)
    merged = pa.table(
        {"id_a": pa.array(a2[rs[okm]], pa.int64()), "id_b": pa.array(b2[rs[okm]], pa.int64())}
    )
    return finals.union(ray.data.from_arrow(merged)).sort(["id_a", "id_b"])
