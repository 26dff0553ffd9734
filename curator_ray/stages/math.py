"""Math-curation stages: token chunking, chunk merge, FineMath scoring,
MIME-typed content extraction.

Ray-Data-first counterparts of the reference ``stages/math`` family:

- ``token_splitter``       — TokenSplitterStage   (math/modifiers/chunking.py:24-133)
- ``merge_chunks``         — ChunkMergeStage      (math/modifiers/merge_chunks.py:22-138)
- ``center_crop``          — CenterCropTextStage  (math/classifiers/finemath.py:42-78)
- ``finemath_scorer``      — FineMathClassifier   (math/classifiers/finemath.py:89-203)
- ``math_content_extract`` — MathContentExtractor / MathExtractStage
                             (math/download/extract.py:89-270)

The splitter is fully vectorized: paragraph split + token counts are Arrow
kernels, and the greedy packing runs as multi-round ``np.searchsorted`` over
ALL documents in the batch at once (rounds = max chunks per doc, each round
one vectorized boundary lookup) — no per-row Python. Chunk text assembly is a
``ListArray.from_arrays`` + ``pc.binary_join`` (no string loops). The merge is
a ``groupby().map_groups`` — the group is one logical document, exactly the
reference's per-document grain. The content extractor is per-record Python at
the ingest boundary (format sniffing + JSON/HTML parse are sequential by
nature), matching the download stages (see PERF.md round-2 notes).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _texts, token_count

# ----------------------------------------------------------- token splitter


def _pack_greedy(n_tokens: np.ndarray, doc_starts: np.ndarray, doc_ends: np.ndarray,
                 max_tokens: int) -> np.ndarray:
    """Greedy paragraph packing for all docs at once.

    Semantics of chunking.py:89-117: accumulate paragraphs until adding the
    next would exceed ``max_tokens`` AND the chunk is non-empty — i.e. each
    chunk is the longest non-empty prefix whose token sum fits (a single
    over-budget paragraph still forms its own chunk).

    Returns the sorted array of chunk-start indices into the paragraph
    arrays. Runs one vectorized ``searchsorted`` per round; rounds = max
    chunks per document in the batch.
    """
    cum0 = np.concatenate([[0], np.cumsum(n_tokens, dtype=np.int64)])
    starts: list[np.ndarray] = []
    cur, ends = doc_starts.astype(np.int64), doc_ends.astype(np.int64)
    active = cur < ends
    while active.any():
        cur, ends = cur[active], ends[active]
        starts.append(cur)
        # largest j with sum(n_tokens[cur:j]) <= max_tokens, at least cur+1
        j = np.searchsorted(cum0, cum0[cur] + max_tokens, side="right") - 1
        j = np.maximum(np.minimum(j, ends), cur + 1)
        cur = j
        active = cur < ends
    if not starts:
        return np.zeros(0, np.int64)
    return np.sort(np.concatenate(starts))


def token_splitter(
    ds,
    max_length_tokens: int = 8000,
    separator: str = "\n\n",
    text_field: str = "text",
    chunk_id_field: str = "chunk_id",
    n_tokens_field: str = "n_tokens",
):
    """TokenSplitterStage (math/modifiers/chunking.py:24-133): split long
    texts into <= ``max_length_tokens`` chunks at paragraph boundaries.

    Paragraph rules mirror the reference: blank paragraphs are dropped, every
    kept paragraph except the document-final one carries its trailing
    separator, and token counts are taken on the separator-suffixed text
    (the reference encodes ``para_to_add``). Token counts use the repo's
    BPE-ish regex kernel instead of a HF tokenizer (no models in sandbox).
    One output row per chunk; non-text columns replicate; documents with no
    non-blank paragraph emit no rows.
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = _texts(batch, text_field)
        splits = pc.split_pattern(texts, separator)
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = splits.flatten()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        pos = np.arange(len(flat), dtype=np.int64) - offsets[doc_idx]
        is_last_raw = pos == (lengths[doc_idx] - 1)

        keep = pc.greater(
            pc.utf8_length(pc.utf8_trim_whitespace(flat)), 0
        ).to_numpy(zero_copy_only=False)
        kept = np.flatnonzero(keep)
        cols = {
            chunk_id_field: pa.array(np.zeros(0, np.int64)),
            n_tokens_field: pa.array(np.zeros(0, np.int64)),
            text_field: pa.array([], pa.string()),
        }
        if len(kept) == 0:
            other = batch.drop_columns([text_field]).take(pa.array(np.zeros(0, np.int64)))
            for name in other.column_names:
                cols[name] = other.column(name)
            return pa.table(cols)

        suffix = pa.array(np.where(is_last_raw[kept], "", separator))
        para = pc.binary_join_element_wise(flat.take(pa.array(kept)), suffix, "")
        n_tok = token_count(para).to_numpy(zero_copy_only=False).astype(np.int64)
        kdoc = doc_idx[kept]

        # per-doc boundaries over the KEPT paragraph array
        change = np.flatnonzero(np.concatenate([[True], kdoc[1:] != kdoc[:-1]]))
        doc_starts = change
        doc_ends = np.concatenate([change[1:], [len(kept)]])
        chunk_starts = _pack_greedy(n_tok, doc_starts, doc_ends, max_length_tokens)

        off32 = np.concatenate([chunk_starts, [len(kept)]]).astype(np.int32)
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off32, pa.int32()), para), ""
        )
        chunk_tokens = np.add.reduceat(n_tok, chunk_starts)
        chunk_doc = kdoc[chunk_starts]
        first = np.flatnonzero(np.concatenate([[True], chunk_doc[1:] != chunk_doc[:-1]]))
        chunk_id = np.arange(len(chunk_doc), dtype=np.int64)
        chunk_id -= np.repeat(chunk_id[first], np.diff(np.concatenate([first, [len(chunk_doc)]])))

        cols = {
            chunk_id_field: pa.array(chunk_id),
            n_tokens_field: pa.array(chunk_tokens),
            text_field: chunk_text,
        }
        other = batch.drop_columns([text_field]).take(pa.array(chunk_doc))
        for name in other.column_names:
            cols[name] = other.column(name)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------------- chunk merge


def merge_chunks(
    ds,
    text_field: str = "text",
    raw_text_field: str | None = None,
    chunk_id_field: str = "chunk_id",
    groupby_columns: list[str] | None = None,
    no_content_markers: list[str] | None = None,
    sum_columns: list[str] | None = None,
    max_text_length: int = 900_000,
    separator: str = "\n",
):
    """ChunkMergeStage (math/modifiers/merge_chunks.py:22-138): one row per
    document from its chunk rows — dedup by chunk id (keep first), drop
    no-content/null/empty chunks, sort by chunk id, concatenate text fields
    with ``separator``, sum ``sum_columns``, take first of everything else,
    and drop merged docs longer than ``max_text_length``.

    Distributed as ``groupby(key).map_groups``: the group is one document,
    so per-task memory is bounded by the largest single document.
    """
    group_cols = groupby_columns or ["doc_id"]
    markers = set(
        no_content_markers if no_content_markers is not None
        else ["NO USEFUL CONTENT", '"NO USEFUL CONTENT"']
    ) | {"", "\n"}
    sums = sum_columns if sum_columns is not None else ["num_generated_tokens", "num_input_tokens"]
    concat_fields = [text_field] + ([raw_text_field] if raw_text_field else [])

    def merge_group(group: pa.Table) -> pa.Table:
        cid = group.column(chunk_id_field).to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(cid, return_index=True)  # dedup keep-first, sorted by chunk id
        group = group.take(pa.array(np.sort(first_idx)))
        order = np.argsort(group.column(chunk_id_field).to_numpy(zero_copy_only=False), kind="stable")
        group = group.take(pa.array(order))
        txt = group.column(text_field)
        ok = pc.and_(
            pc.is_valid(txt),
            pc.invert(pc.is_in(txt, value_set=pa.array(sorted(markers), pa.string()))),
        )
        group = group.filter(ok)
        if group.num_rows == 0:
            return group
        cols = {}
        for name in group.column_names:
            col = group.column(name)
            if name == chunk_id_field:
                continue
            if name in concat_fields:
                joined = separator.join(
                    "" if v is None else str(v) for v in col.to_pylist()
                )
                cols[name] = pa.array([joined], pa.string())
            elif name in sums:
                cols[name] = pa.array([pc.sum(col).as_py() or 0], col.type)
            else:
                cols[name] = col.slice(0, 1)
        out = pa.table(cols)
        merged_txt = out.column(text_field)
        keep = pc.and_(
            pc.invert(pc.is_in(merged_txt, value_set=pa.array(["", "\n"]))),
            pc.less_equal(pc.utf8_length(merged_txt), max_text_length),
        )
        return out.filter(keep)

    if len(group_cols) == 1:
        return ds.groupby(group_cols[0]).map_groups(merge_group, batch_format="pyarrow")

    # multi-column key: pack into one temp key column, group, then drop it
    def add_key(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            *[pc.cast(b.column(c), pa.string()) for c in group_cols], "\x1f"
        )
        return b.append_column("__merge_key", key)

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    merged = keyed.groupby("__merge_key").map_groups(merge_group, batch_format="pyarrow")
    return merged.map_batches(
        lambda b: b.drop_columns(["__merge_key"]), batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------- FineMath classifier


def center_crop(ds, text_field: str = "text", center_crop_chars: int = 10_000):
    """CenterCropTextStage (math/classifiers/finemath.py:42-78): keep the
    middle ``2*center_crop_chars`` characters of each text.

    Vectorized fast path: rows already short enough pass through zero-copy;
    only the long minority is sliced (per-row starts rule out a pc kernel).
    """
    n = max(0, int(center_crop_chars))

    def fn(batch: pa.Table) -> pa.Table:
        txt = _texts(batch, text_field)
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        long_idx = np.flatnonzero(lens > 2 * n)
        if len(long_idx) == 0:
            return batch
        vals = txt.take(pa.array(long_idx)).to_pylist()
        cropped = []
        for s in vals:
            m = len(s) // 2
            cropped.append(s[max(0, m - n): min(m + n, len(s))])
        # reassemble without boxing the short majority: concat the untouched
        # short rows (Arrow take) with the cropped long rows, then restore
        # row order with one permutation take
        short_idx = np.setdiff1d(np.arange(len(txt), dtype=np.int64), long_idx, assume_unique=True)
        combined = pa.concat_arrays(
            [txt.take(pa.array(short_idx)), pa.array(cropped, pa.string())]
        )
        perm = np.empty(len(txt), dtype=np.int64)
        perm[np.concatenate([short_idx, long_idx])] = np.arange(len(txt), dtype=np.int64)
        out = combined.take(pa.array(perm))
        return batch.set_column(
            batch.column_names.index(text_field), text_field, out
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def finemath_scorer(ds, text_field: str = "text", center_crop_chars: int = 10_000):
    """FineMathClassifier (math/classifiers/finemath.py:89-203): center-crop
    -> tokenizer pool -> micro-batched regression model -> float score
    clipped to [0, 5] (``finemath_scores``) + rounded int
    (``finemath_int_scores``). Model is the deterministic classifier-scaffold
    stub (no torch in sandbox), same plumbing as fineweb_edu_scorer.
    """
    from .classifier import classifier_stage

    cropped = center_crop(ds, text_field=text_field, center_crop_chars=center_crop_chars)
    labels = [str(i) for i in range(6)]
    scored = classifier_stage(
        cropped, labels, text_field=text_field, label_field="_fm_bucket", score_field="_fm_prob",
    )

    def finish(b: pa.Table) -> pa.Table:
        bucket = pc.cast(b.column("_fm_bucket"), pa.float64())
        score = pc.min_element_wise(
            pc.max_element_wise(pc.add(bucket, pc.subtract(b.column("_fm_prob"), 0.5)), 0.0), 5.0
        )
        out = b.append_column("finemath_scores", score)
        out = out.append_column("finemath_int_scores", pc.cast(pc.round(score), pa.int64()))
        return out.drop_columns(["_fm_bucket", "_fm_prob"])

    return scored.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- MIME content extraction

# Representative subsets of the reference's header/magic MIME tables
# (math/download/mime_types.py) — membership logic is what matters.
TEXT_MIME_TYPES = {
    "text/plain", "text/markdown", "text/x-web-markdown", "text/x-python",
    "text/x-csrc", "text/x-c++src", "text/x-rst", "text/x-diff", "text/x-log",
    "text/csv", "application/json",
}
HTML_MIME_TYPES = {"text/html", "application/xhtml+xml"}
TEXT_MAGIC_TYPES = {"text/plain", "application/json", "text/csv"}
HTML_MAGIC_TYPES = {"text/html", "application/xhtml+xml", "text/xml"}

_XML_DECL_RE = re.compile(r"^\s*<\?xml.*?\?>")


def _decode_text(binary: bytes | None) -> str | None:
    """bytes -> str with encoding fallback (extract.py:39-52; resiliparse
    charset detection replaced by utf-8 -> latin-1, which never fails)."""
    if binary is None:
        return None
    try:
        content = binary.decode("utf-8")
    except (UnicodeDecodeError, UnicodeError):
        content = binary.decode("latin-1")
    return _XML_DECL_RE.sub("", content)


def _is_notebook(content: str) -> bool:
    """Jupyter nbformat sniff (extract.py:55-66)."""
    try:
        data = json.loads(content)
    except (json.JSONDecodeError, TypeError, ValueError):
        return False
    return (
        isinstance(data, dict)
        and "nbformat" in data
        and "nbformat_minor" in data
        and isinstance(data.get("cells"), list)
    )


def notebook_to_text(content: str) -> str:
    """Flatten nbformat cells + stream/plain outputs (extract.py:69-86)."""
    data = json.loads(content)
    out = []
    for cell in data.get("cells", []):
        t = cell.get("cell_type")
        if t in ("code", "markdown", "raw"):
            out.append("".join(cell.get("source", [])))
        if t == "code":
            for o in cell.get("outputs", []):
                ot = o.get("output_type")
                if ot == "stream" or ot == "text":
                    out.append("".join(o.get("text", [])))
                elif ot in ("execute_result", "display_data"):
                    d = o.get("data", {})
                    if "text/plain" in d:
                        out.append("".join(d["text/plain"]))
    return "".join(out)


_HTML_PARTS = [
    re.compile(p, re.IGNORECASE)
    for p in (r"<html[^>]*>", r"</html\s*>", r"<head[^>]*>", r"</head\s*>",
              r"<body[^>]*>", r"</body\s*>")
]


def _is_html_document(text: str) -> bool:
    return all(p.search(text) for p in _HTML_PARTS)


def _determine_type(content: str, magic_mime: str | None, mime: str | None, url: str | None) -> str:
    """Type routing (extract.py:186-221): notebook > magic/header MIME > sniff."""
    if ((magic_mime == "application/json") or (url or "").endswith(".ipynb")) and _is_notebook(content):
        return "notebook"
    if magic_mime is None:
        if mime in TEXT_MIME_TYPES:
            return "text"
        return "html"
    if magic_mime in HTML_MAGIC_TYPES or (mime in HTML_MIME_TYPES):
        return "html"
    if mime in TEXT_MIME_TYPES or magic_mime in TEXT_MAGIC_TYPES:
        return "text"
    return "html"


class MathContentExtractor:
    """MathContentExtractor (math/download/extract.py:89-221) as an actor
    stage: per-worker setup loads libmagic when importable (absent in this
    sandbox -> magic_mime_type stays null, the reference's own no-magic
    branch). HTML extraction uses the repo's jusText-algorithm extractor
    (``functions/htmltext.py``) in place of a ``lynx`` subprocess dump —
    lynx is absent; the output contract (main text, boilerplate dropped)
    is the same.
    """

    def __init__(self, binary_column: str = "binary_content", url_column: str = "url",
                 mime_type_column: str = "mime_type", stop_words=None, **justext_kwargs):
        from ..functions.htmltext import EN_STOP_WORDS

        try:
            import magic  # noqa: F401  (absent in sandbox)

            self._magic = magic.Magic(mime=True)
        except Exception:
            self._magic = None
        self.binary_column = binary_column
        self.url_column = url_column
        self.mime_type_column = mime_type_column
        self.stop_words = stop_words or EN_STOP_WORDS
        self.justext_kwargs = justext_kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.htmltext import extract_html_text

        urls = batch.column(self.url_column).to_pylist()
        mimes = (
            batch.column(self.mime_type_column).to_pylist()
            if self.mime_type_column in batch.column_names else [None] * len(batch)
        )
        out = {"text": [], self.url_column: [], "type": [], "magic_mime_type": []}
        for binary, url, mime in zip(batch.column(self.binary_column).to_pylist(), urls, mimes):
            magic_mime = None
            if self._magic is not None and isinstance(binary, (bytes, bytearray)):
                try:
                    magic_mime = self._magic.from_buffer(binary)
                except Exception:
                    magic_mime = None
            content = _decode_text(bytes(binary) if binary is not None else None)
            if not content:
                continue
            doc_type = _determine_type(content, magic_mime, mime, url)
            if doc_type == "notebook":
                text = notebook_to_text(content)
            elif doc_type == "html":
                paragraphs = extract_html_text(content, self.stop_words, **self.justext_kwargs)
                text = "\n\n".join(paragraphs)
            else:
                text = content
            out["text"].append(text)
            out[self.url_column].append(url)
            out["type"].append(doc_type)
            out["magic_mime_type"].append(magic_mime)
        return pa.table(
            {
                "text": pa.array(out["text"], pa.string()),
                self.url_column: pa.array(out[self.url_column], pa.string()),
                "type": pa.array(out["type"], pa.string()),
                "magic_mime_type": pa.array(out["magic_mime_type"], pa.string()),
            }
        )


def math_content_extract(ds, concurrency: tuple[int, int] = (1, 8), batch_size: int = 256, **kwargs):
    """MathExtractStage (math/download/extract.py:224-270): apply the
    extractor to a table of (binary_content, url, mime_type) rows, dropping
    rows where extraction fails. Actor pool so libmagic loads once/worker."""
    return ds.map_batches(
        MathContentExtractor,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
