"""Interleaved PDF curation stages (nemotron_parse family), Ray-Data-native.

Re-expression of ``reference/nemo_curator/stages/interleaved/pdf/
nemotron_parse/`` over flat Arrow batches:

- :func:`pdf_partitioning_stage` — the manifest explode of
  ``PDFPartitioningStage`` (``partitioning.py:31``): one output row per PDF,
  expanding CC-MAIN style ``cc_pdf_file_names`` lists; ``max_pdfs`` caps the
  total. The reference packs rows into ``FileGroupTask``s of
  ``pdfs_per_task`` because its executor schedules per task; Ray Data's
  streaming executor batches natively, so packing is subsumed by
  ``map_batches(batch_size=...)`` downstream — a deliberate architectural
  deletion, not a missing feature.
- :func:`pdf_extract_stage` — the CPU half of ``PDFPreprocessStage``
  (``preprocess.py:41``) fused with the row construction of
  ``build_interleaved_rows`` (``utils.py:328-415``): parse each PDF blob
  with the from-scratch codec (``functions/pdf.py``), emit interleaved-
  schema rows — one metadata row per document (position -1, JSON with
  pdf_name/num_pages like the reference's url/pdf_name/num_pages), one row
  per extracted text element (``modality='text'``,
  ``content_type='text/markdown'``, ``element_class='Text'``), one row per
  embedded image (``modality='image'``, PNG-encoded pixels in
  ``binary_content`` via the repo's own codec). Page *rendering* to images
  (pypdfium2) and the Nemotron VLM forward pass are model-bound and gated —
  see :func:`render_pdf_pages_gated` / :class:`NemotronParseInference`.
- :func:`parse_nemotron_output` / :func:`interleave_floaters` — the
  postprocess parse of the model's public tag format
  (``<x_..><y_..>text<x_..><y_..><class_..>``) and the v1.1 floater
  (Picture/Caption) reading-order repair (``utils.py:141-325``),
  reimplemented; :func:`nemotron_postprocess_stage` applies them over a
  Dataset of (sample_id, page model-output) rows so a weights-in-hand user
  only swaps the inference seam.

Scale notes: PDFs are opaque binary blobs — parse work is per-blob inside
``map_batches`` on an actor-less task pool (stateless, pure function), the
same discipline as image decode; no pixel or blob ever enters a wide stage;
element rows are small (text + per-image PNGs) and stream.
"""

from __future__ import annotations

import json
import re
from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.pdf import PdfError, parse_pdf
from ..functions.png import encode_png

__all__ = [
    "NemotronParseInference",
    "interleave_floaters",
    "nemotron_postprocess_stage",
    "parse_nemotron_output",
    "pdf_extract_stage",
    "pdf_partitioning_stage",
    "render_pdf_pages_gated",
]


# ---------------------------------------------------------------------------
# Partitioning (manifest explode)
# ---------------------------------------------------------------------------


def pdf_partitioning_stage(
    ds,
    *,
    file_name_field: str = "file_name",
    url_field: str = "url",
    cc_list_field: str = "cc_pdf_file_names",
    max_pdfs: int = 0,
):
    """Manifest rows -> one row per PDF (``file_name``, ``url``).

    Mirrors ``PDFPartitioningStage`` (``partitioning.py:31-60``): a row
    carrying ``cc_pdf_file_names`` (list) expands into one row per entry
    sharing the row's ``url``; otherwise ``file_name`` passes through.
    ``max_pdfs`` > 0 limits the total like the reference's ``max_pdfs``.
    """

    def explode(batch: pa.Table) -> pa.Table:
        names: list[str] = []
        urls: list[str] = []
        cols = batch.column_names
        cc = batch.column(cc_list_field).to_pylist() if cc_list_field in cols else [None] * len(batch)
        fn = batch.column(file_name_field).to_pylist() if file_name_field in cols else [None] * len(batch)
        uu = batch.column(url_field).to_pylist() if url_field in cols else [None] * len(batch)
        for c, f, u in zip(cc, fn, uu):
            if c:
                for entry in c:
                    if entry:
                        names.append(str(entry))
                        urls.append(u or "")
            elif f:
                names.append(str(f))
                urls.append(u or "")
        return pa.table({"file_name": pa.array(names, pa.string()),
                         "url": pa.array(urls, pa.string())})

    out = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    if max_pdfs > 0:
        out = out.limit(max_pdfs)
    return out


# ---------------------------------------------------------------------------
# Extraction (CPU preprocess + interleaved row construction)
# ---------------------------------------------------------------------------

_INTERLEAVED_FIELDS = [
    ("sample_id", pa.string()),
    ("position", pa.int64()),
    ("modality", pa.string()),
    ("content_type", pa.string()),
    ("text_content", pa.string()),
    ("binary_content", pa.large_binary()),
    ("source_ref", pa.string()),
    ("page_number", pa.int64()),
    ("pdf_name", pa.string()),
    ("element_class", pa.string()),
    ("materialize_error", pa.string()),
]


def pdf_extract_stage(
    ds,
    *,
    pdf_col: str = "pdf_bytes",
    id_col: str = "sample_id",
    name_col: str | None = None,
    max_pages: int = 0,
    encode_images: bool = True,
):
    """PDF blobs -> interleaved-schema element rows.

    Output columns follow the reference's ``INTERLEAVED_SCHEMA`` +
    provenance extras (``tasks/interleaved.py:55``, ``utils.py:352-414``):
    per document a metadata row at position -1 whose ``text_content`` is the
    JSON ``{"pdf_name": ..., "num_pages": N}``, then content rows numbered
    0..k-1 in reading order (text elements in content-stream order, then
    the page's images in resource order — this engine's deterministic
    ordering; the reference's order comes from the VLM's reading-order
    output, unavailable without the model). Undecodable documents yield a
    single metadata row with ``materialize_error`` set (the reference's
    error-row discipline) instead of failing the batch.

    ``encode_images=False`` keeps raw RGB bytes (content_type
    ``image/x-raw;w=..;h=..``) instead of PNG-encoding — cheaper when a
    downstream stage re-decodes anyway.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        blobs = batch.column(pdf_col).to_pylist()
        names = (
            batch.column(name_col).cast(pa.string()).to_pylist()
            if name_col and name_col in batch.column_names
            else [f"{i}.pdf" for i in ids]
        )
        cols: dict[str, list] = {k: [] for k, _ in _INTERLEAVED_FIELDS}

        def emit(sid, pos, modality, ctype, text, binary, sref, page, pname, ecls, err):
            cols["sample_id"].append(sid)
            cols["position"].append(pos)
            cols["modality"].append(modality)
            cols["content_type"].append(ctype)
            cols["text_content"].append(text)
            cols["binary_content"].append(binary)
            cols["source_ref"].append(sref)
            cols["page_number"].append(page)
            cols["pdf_name"].append(pname)
            cols["element_class"].append(ecls)
            cols["materialize_error"].append(err)

        for sid, blob, pname in zip(ids, blobs, names):
            try:
                pages = parse_pdf(bytes(blob or b""), max_pages=max_pages)
            except PdfError as exc:
                emit(sid, -1, "metadata", "application/json", None, None,
                     None, None, pname, None, f"PdfError: {exc}")
                continue
            meta = '{"pdf_name": "%s", "num_pages": %d}' % (pname, len(pages))
            emit(sid, -1, "metadata", "application/json", meta, None,
                 None, None, pname, None, None)
            pos = 0
            for page in pages:
                for text in page.texts:
                    emit(sid, pos, "text", "text/markdown", text, None,
                         json.dumps({"page": page.index}), page.index,
                         pname, "Text", None)
                    pos += 1
                for im in page.images:
                    try:
                        px = im.pixels()
                    except (PdfError, ValueError) as exc:
                        emit(sid, pos, "image", None, None, None,
                             json.dumps({"page": page.index, "xobject": im.name}),
                             page.index, pname, "Picture", f"decode: {exc}")
                        pos += 1
                        continue
                    if encode_images:
                        ctype, binary = "image/png", encode_png(px)
                    else:
                        ctype = f"image/x-raw;w={px.shape[1]};h={px.shape[0]}"
                        binary = np.ascontiguousarray(px).tobytes()
                    emit(sid, pos, "image", ctype, None, binary,
                         json.dumps({"page": page.index, "xobject": im.name}),
                         page.index, pname, "Picture", None)
                    pos += 1
        arrays = [pa.array(cols[k], type=t) for k, t in _INTERLEAVED_FIELDS]
        return pa.table(dict(zip([k for k, _ in _INTERLEAVED_FIELDS], arrays)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Nemotron-Parse output postprocess (model output -> elements)
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(
    r"<x_([\d.]+)><y_([\d.]+)>(.*?)<x_([\d.]+)><y_([\d.]+)><class_([^>]+)>",
    re.DOTALL,
)
_STRIP_TAGS_RE = re.compile(r"<[^>]+>")
_FLOATER_CLASSES = ("Picture", "Caption")


def parse_nemotron_output(raw_text: str) -> list[dict[str, Any]]:
    """Parse the model's public tag format into element dicts.

    Format (``utils.py:141-169``): each element is
    ``<x_x1><y_y1>text<x_x2><y_y2><class_C>`` with normalized bbox corners.
    Elements with empty text are kept only for the Picture class; a
    tag-free non-empty output degrades to one untyped Text element.
    """
    elements: list[dict[str, Any]] = []
    for m in _TAG_RE.finditer(raw_text):
        cls = m.group(6)
        text = _STRIP_TAGS_RE.sub("", m.group(3)).strip()
        if text or cls == "Picture":
            elements.append({
                "class": cls,
                "text": text,
                "bbox": [float(m.group(1)), float(m.group(2)),
                         float(m.group(4)), float(m.group(5))],
            })
    if not elements and raw_text.strip():
        cleaned = _STRIP_TAGS_RE.sub("", raw_text).strip()
        if cleaned:
            elements.append({"class": "Text", "text": cleaned, "bbox": None})
    return elements


def _center_y(e: dict[str, Any]) -> float:
    b = e.get("bbox")
    return 0.0 if not b else (b[1] + b[3]) / 2.0


def interleave_floaters(
    anchored: list[dict[str, Any]], floaters: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """v1.1 reading-order repair (``utils.py:285-325``): pair each Caption
    with its nearest unclaimed Picture by bbox center-y (captions greedily,
    in output order), sort groups by center-y, insert each group after the
    anchored element with the closest center-y."""
    if not floaters:
        return list(anchored)
    pictures = [f for f in floaters if f["class"] == "Picture"]
    captions = [f for f in floaters if f["class"] == "Caption"]
    taken: set[int] = set()
    pairing: dict[int, list[dict[str, Any]]] = {i: [p] for i, p in enumerate(pictures)}
    loose: list[dict[str, Any]] = []
    for cap in captions:
        cy = _center_y(cap)
        best, best_d = None, float("inf")
        for i, pic in enumerate(pictures):
            if i in taken:
                continue
            d = abs(_center_y(pic) - cy)
            if d < best_d:
                best, best_d = i, d
        if best is None:
            loose.append(cap)
        else:
            taken.add(best)
            pairing[best].append(cap)
    groups = list(pairing.values()) + [[c] for c in loose]
    groups.sort(key=lambda g: _center_y(g[0]))
    if not anchored:
        return [e for g in groups for e in g]
    anchor_ys = [_center_y(e) for e in anchored]
    at: dict[int, list[list[dict[str, Any]]]] = {}
    for g in groups:
        gy = _center_y(g[0])
        idx = min(range(len(anchor_ys)), key=lambda i: abs(anchor_ys[i] - gy))
        at.setdefault(idx, []).append(g)
    out: list[dict[str, Any]] = []
    for i, e in enumerate(anchored):
        out.append(e)
        for g in sorted(at.get(i, []), key=lambda g: _center_y(g[0])):
            out.extend(g)
    return out


def nemotron_postprocess_stage(
    ds,
    *,
    id_col: str = "sample_id",
    output_col: str = "model_output",
    page_col: str = "page_number",
    reorder_floaters: bool = True,
):
    """Model-output rows -> interleaved element rows (text/table classes;
    Picture crops need the rendered page canvas, which is gated with the
    renderer). One input row = one page's raw output; positions are
    assigned per sample across its pages in (page, element) order —
    requires a sample's pages to sit in one batch (the family's standing
    partitioning assumption, ``stages/interleaved.py`` module doc)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        outs = batch.column(output_col).to_pylist()
        pages = (
            batch.column(page_col).to_pylist()
            if page_col in batch.column_names
            else list(range(len(batch)))
        )
        rows = sorted(zip(ids, pages, outs), key=lambda r: (r[0], r[1] or 0))
        cols: dict[str, list] = {
            "sample_id": [], "position": [], "modality": [],
            "content_type": [], "text_content": [], "source_ref": [],
            "page_number": [], "element_class": [],
        }
        pos = 0
        prev_sid = None
        for sid, page, raw in rows:
            if sid != prev_sid:
                pos, prev_sid = 0, sid
            elements = parse_nemotron_output(str(raw or ""))
            if reorder_floaters:
                anchored = [e for e in elements if e["class"] not in _FLOATER_CLASSES]
                floaters = [e for e in elements if e["class"] in _FLOATER_CLASSES]
                elements = interleave_floaters(anchored, floaters)
            for e in elements:
                cls = e["class"]
                if cls == "Picture":
                    modality, ctype = "image", "image/png"
                elif cls == "Table":
                    modality, ctype = "table", "text/markdown"
                else:
                    modality, ctype = "text", "text/markdown"
                cols["sample_id"].append(sid)
                cols["position"].append(pos)
                cols["modality"].append(modality)
                cols["content_type"].append(ctype)
                cols["text_content"].append(e["text"] or None)
                cols["source_ref"].append(json.dumps({"page": page, "bbox": e["bbox"]}))
                cols["page_number"].append(page)
                cols["element_class"].append(cls)
                pos += 1
        return pa.table({
            "sample_id": pa.array(cols["sample_id"], pa.string()),
            "position": pa.array(cols["position"], pa.int64()),
            "modality": pa.array(cols["modality"], pa.string()),
            "content_type": pa.array(cols["content_type"], pa.string()),
            "text_content": pa.array(cols["text_content"], pa.string()),
            "source_ref": pa.array(cols["source_ref"], pa.string()),
            "page_number": pa.array(cols["page_number"], pa.int64()),
            "element_class": pa.array(cols["element_class"], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Gated model-bound seams
# ---------------------------------------------------------------------------


def render_pdf_pages_gated(pdf_bytes: bytes, dpi: int = 300, max_pages: int = 0):
    """Page rasterization seam (``preprocess.py:96`` renders via pypdfium2).

    Rasterizing arbitrary PDF graphics needs a full renderer; gated on the
    absent ``pypdfium2`` package like vLLM/Lance. Text and embedded-image
    extraction do NOT need this — use :func:`pdf_extract_stage`.
    """
    try:
        import pypdfium2  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "PDF page rendering requires the 'pypdfium2' package "
            "(reference: stages/interleaved/pdf/nemotron_parse/utils.py:96 "
            "render_pdf_pages); install it in deployment. Structural text/"
            "image extraction works without it via pdf_extract_stage."
        ) from exc
    raise NotImplementedError  # pragma: no cover - package absent in sandbox


class NemotronParseInference:
    """VLM inference seam (``inference.py``, GPU/vLLM-bound).

    Callable-class actor shape matching the engine's other gated model
    stages: raises at construction unless an ``infer_fn(page_png_bytes) ->
    raw_output`` injection is provided (the test seam, same policy as the
    audio ``scores_fn`` seams)."""

    def __init__(self, infer_fn=None):
        if infer_fn is None:
            raise ImportError(
                "Nemotron-Parse inference is model-bound (reference: stages/"
                "interleaved/pdf/nemotron_parse/inference.py); supply "
                "infer_fn=... or deploy with the model available."
            )
        self._infer = infer_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self._infer(b) for b in batch.column("binary_content").to_pylist()]
        return batch.append_column("model_output", pa.array(outs, pa.string()))
