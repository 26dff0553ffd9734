"""Interleaved (multimodal document) curation stages.

Ray-Data-native re-expression of ``reference/nemo_curator/stages/
interleaved/``: an interleaved document is a *sample* of ordered rows —
text / image / metadata — in ONE flat Arrow table with the reference's
reserved columns (``tasks/interleaved.py:60-80``):

    sample_id:string, position:int64, modality:string,
    content_type:string?, text_content:string?, binary_content:binary?,
    source_ref:string?, materialize_error:string?

The reference's ``InterleavedBatch`` is already columnar, so the mapping
to a Ray ``Dataset`` is direct; its parquet/WebDataset readers and writers
map onto the engine's existing IO (``sources/io.py`` / ``sources/tar.py``).

Implemented semantics (``stages/interleaved/stages.py:67-176``):

- basic row validity: modality in {text, image, metadata}; metadata rows
  sit at position -1, content rows at position >= 0;
- :func:`aspect_ratio_filter_stage`: drop image rows whose aspect ratio
  (width/height) leaves ``[min_aspect_ratio, max_aspect_ratio]`` — reading
  dimensions from the container *header* (``functions/imageinfo.py``)
  instead of the reference's full Pillow open; unreadable bytes drop the
  row like the reference's ``None`` path;
- post-filter repair, exactly the reference's ``annotate``: surviving
  content rows are re-indexed 0..k-1 per sample in original position
  order, metadata rows whose sample lost all content are dropped as
  orphans, output sorted by (sample_id, position).

Partitioning assumption (same as the reference, whose task = one file
group): all rows of a sample sit in one block — readers emit samples
contiguously and the repair runs per batch. A repartition-by-sample_id
restores the invariant if an upstream shuffle broke it.

The PDF half of the family (partitioning, extraction, nemotron-output
postprocess) lives in ``stages/pdf.py`` over the from-scratch codec
``functions/pdf.py``; only the page renderer and the VLM forward pass stay
deployment-gated there. Lazy ``source_ref`` materialization is replaced by
inline ``binary_content`` bytes — the engine's multimodal-column
discipline (payload beside typed metadata).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.imageinfo import image_dims

INTERLEAVED_SCHEMA = pa.schema(
    [
        pa.field("sample_id", pa.string(), nullable=False),
        pa.field("position", pa.int64(), nullable=False),
        pa.field("modality", pa.string(), nullable=False),
        pa.field("content_type", pa.string(), nullable=True),
        pa.field("text_content", pa.string(), nullable=True),
        pa.field("binary_content", pa.large_binary(), nullable=True),
        pa.field("source_ref", pa.string(), nullable=True),
        pa.field("materialize_error", pa.string(), nullable=True),
    ]
)

_ALLOWED_MODALITIES = ("text", "image", "metadata")


def basic_row_validity(batch: pa.Table) -> np.ndarray:
    """Reference ``_basic_row_validity_mask`` (stages.py:78-86), vectorized."""
    modality = batch.column("modality")
    position = batch.column("position")
    allowed = pc.is_in(modality, value_set=pa.array(_ALLOWED_MODALITIES))
    is_meta = pc.equal(modality, "metadata")
    ok_pos = pc.if_else(is_meta, pc.equal(position, -1), pc.greater_equal(position, 0))
    return pc.and_(allowed, ok_pos).to_numpy(zero_copy_only=False).astype(bool)


def _repair_samples(batch: pa.Table, keep: np.ndarray) -> pa.Table:
    """Apply a keep mask, then the reference's post-filter repair
    (stages.py:120-130): re-index surviving content rows per sample, drop
    orphan metadata rows, sort by (sample_id, position)."""
    kept = batch.filter(pa.array(keep))
    if len(kept) == 0:
        return kept
    kept = kept.sort_by([("sample_id", "ascending"), ("position", "ascending")])
    sample = np.asarray(kept.column("sample_id").to_pylist(), dtype=object)
    modality = kept.column("modality").to_numpy(zero_copy_only=False)
    position = kept.column("position").to_numpy(zero_copy_only=False).copy()
    content = modality != "metadata"
    # cumcount of content rows within each sample (rows already sorted by
    # position): arange rebased at each sample's first content row
    if content.any():
        idx = np.flatnonzero(content)
        s = sample[idx]
        new_sample = np.concatenate([[True], s[1:] != s[:-1]])
        seq = np.arange(len(idx), dtype=np.int64)
        base = np.maximum.accumulate(np.where(new_sample, seq, -1))
        position[idx] = seq - base
    kept = kept.set_column(
        kept.schema.get_field_index("position"), "position", pa.array(position, pa.int64())
    )
    content_samples = set(sample[content].tolist())
    orphan = (~content) & np.array([sid not in content_samples for sid in sample], dtype=bool)
    if orphan.any():
        kept = kept.filter(pa.array(~orphan))
    return kept.sort_by([("sample_id", "ascending"), ("position", "ascending")])


def aspect_ratio_filter_stage(
    ds,
    min_aspect_ratio: float = 1.0,
    max_aspect_ratio: float = 2.0,
    drop_invalid_rows: bool = True,
):
    """Reference ``InterleavedAspectRatioFilterStage`` (stages.py:134-176)
    with header-only dimension reads. Image rows with unreadable bytes or
    out-of-range aspect drop; text/metadata rows pass the content check."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keep = np.ones(n, dtype=bool)
        if drop_invalid_rows:
            keep &= basic_row_validity(batch)
        modality = batch.column("modality").to_numpy(zero_copy_only=False)
        is_img = modality == "image"
        if is_img.any():
            blobs = batch.column("binary_content")
            for i in np.flatnonzero(is_img & keep):
                dims = image_dims(blobs[i].as_py() or b"")
                if dims is None or dims[1] <= 0:
                    keep[i] = False
                    continue
                ar = dims[0] / dims[1]
                if ar < min_aspect_ratio or ar > max_aspect_ratio:
                    keep[i] = False
        return _repair_samples(batch, keep)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def text_length_filter_stage(ds, min_chars: int = 1, drop_invalid_rows: bool = True):
    """Companion content filter: drop text rows shorter than ``min_chars``
    (the family's filter contract applied to the text modality), with the
    same validity + repair semantics."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keep = np.ones(n, dtype=bool)
        if drop_invalid_rows:
            keep &= basic_row_validity(batch)
        modality = batch.column("modality").to_numpy(zero_copy_only=False)
        txt = pc.fill_null(batch.column("text_content"), "")
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        keep &= (modality != "text") | (lens >= min_chars)
        return _repair_samples(batch, keep)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def derive_interleaved_table(ds, text_field: str = "text", id_field: str = "doc_id"):
    """Deterministic interleaved corpus from a text table: per document a
    sample of [metadata@-1, text@0, image@1, text@2] where the image is a
    real PNG whose dimensions follow the SQL-expressible rule
    ``w = 8 + L % 24, h = 8 + L % 13`` (L = collapsed text length), so an
    oracle can recompute the aspect-ratio keep set and position re-index."""
    from ..functions.png import encode_png

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_field)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.fill_null("") if texts.null_count else texts
        collapsed = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(texts, r"\s+", " ")
        )
        ids = batch.column(id_field).cast(pa.string()).to_pylist()
        col = collapsed.to_pylist()
        rows = {k: [] for k in INTERLEAVED_SCHEMA.names}

        def add(sid, pos, mod, ctype=None, text=None, blob=None):
            rows["sample_id"].append(sid)
            rows["position"].append(pos)
            rows["modality"].append(mod)
            rows["content_type"].append(ctype)
            rows["text_content"].append(text)
            rows["binary_content"].append(blob)
            rows["source_ref"].append(None)
            rows["materialize_error"].append(None)

        for sid, txt in zip(ids, col):
            L = len(txt)
            add(sid, -1, "metadata", "application/json", '{"source": "documents"}')
            add(sid, 0, "text", "text/plain", txt[:40])
            w, h = 8 + L % 24, 8 + L % 13
            px = np.full((h, w, 3), L % 256, dtype=np.uint8)
            add(sid, 1, "image", "image/png", None, encode_png(px))
            add(sid, 2, "text", "text/plain", txt[40:80])
        arrays = [
            pa.array(rows[f.name], f.type) for f in INTERLEAVED_SCHEMA
        ]
        return pa.Table.from_arrays(arrays, schema=INTERLEAVED_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
