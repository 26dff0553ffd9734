"""Translation stage family: segment -> translate -> exact reassembly.

Counterpart of the reference's experimental translation pipeline
(``stages/text/experimental/translation/``): ``SegmentationStage`` coarse
mode (``stages/segmentation.py:512-551``: line-level splitting with
code-block awareness, non-translatable lines preserved verbatim, leading
whitespace carried separately), the per-segment translate stage
(``stages/translate.py``; backends ``backends/{aws,google,nmt}.py`` are
network/model services absent from this sandbox, so a deterministic echo
client stands in — the plumbing: per-worker client setup, segment-only
routing, order restoration — is real), and ``ReassemblyStage``
(``stages/reassembly.py``: exact-structure reconstruction).

Ray-Data-first shape: segmentation is ONE vectorized ``map_batches`` that
explodes documents to one row per LINE (translatable segments and fixed
template lines share the table, flagged by ``kind``); translation is an
actor-pool ``map_batches`` touching only the segment rows; reassembly is the
single wide op — a ``groupby(id)`` that rejoins lines in order. Fixed lines
never enter the translator, matching the reference's template mechanism
without a per-doc JSON sidecar.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _texts

KIND_FIXED = 0  # verbatim template line (code block, tag, JSON, no letters)
KIND_SEG = 1  # translatable segment (leading whitespace split off)


def _translatable_mask(flat: pa.Array, stripped: pa.Array) -> np.ndarray:
    """Vectorized ``is_line_translatable_content``
    (reference segmentation.py:226-248): needs a letter, not an XML/HTML
    tag, not a parseable JSON object/array (checked in Python only for the
    bracketed minority)."""
    has_alpha = pc.greater(pc.count_substring_regex(stripped, r"\p{L}"), 0)
    tag = pc.and_(pc.starts_with(stripped, "<"), pc.ends_with(stripped, ">"))
    mask = pc.and_(has_alpha, pc.invert(tag)).to_numpy(zero_copy_only=False)
    bracketed = pc.or_(
        pc.and_(pc.starts_with(stripped, "{"), pc.ends_with(stripped, "}")),
        pc.and_(pc.starts_with(stripped, "["), pc.ends_with(stripped, "]")),
    ).to_numpy(zero_copy_only=False)
    for i in np.flatnonzero(mask & bracketed):  # rare: JSON-looking lines
        try:
            parsed = json.loads(stripped[i].as_py())
        except (json.JSONDecodeError, TypeError):
            parsed = None
        if isinstance(parsed, (dict, list)):
            mask[i] = False
    return mask


def _segment_batch(batch: pa.Table, *, text_field: str, id_field: str) -> pa.Table:
    txt = _texts(batch, text_field)
    ids = batch.column(id_field)
    splits = pc.split_pattern(txt, "\n")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = splits.flatten()
    n = len(flat)
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    line_idx = np.arange(n, dtype=np.int64) - starts[doc_idx]

    stripped = pc.utf8_trim_whitespace(flat)
    fence = pc.starts_with(stripped, "```").to_numpy(zero_copy_only=False)
    # per-doc count of fences strictly before each line -> in-code-block parity
    prefix = np.concatenate([[0], np.cumsum(fence.astype(np.int64))])
    before = prefix[:n] - prefix[starts][doc_idx]
    in_block = (before % 2) == 1

    seg = _translatable_mask(flat, stripped) & ~fence & ~in_block

    # leading whitespace split (reference keeps line[:num_leading] verbatim);
    # per-row prefix extraction is Python only for the rare indented segments
    lstripped = pc.utf8_ltrim_whitespace(flat)
    lead_n = pc.subtract(pc.utf8_length(flat), pc.utf8_length(lstripped)).to_numpy(
        zero_copy_only=False
    )
    lead = np.full(n, "", dtype=object)
    for i in np.flatnonzero(seg & (lead_n > 0)):
        lead[i] = flat[i].as_py()[: lead_n[i]]

    # seg rows carry the left-stripped text, fixed rows the verbatim line
    seg_pa = pa.array(seg)
    text_col = pc.if_else(seg_pa, lstripped, flat)
    out_ids = ids.take(pa.array(doc_idx)) if isinstance(ids, pa.Array) else ids.combine_chunks().take(pa.array(doc_idx))
    return pa.table(
        {
            id_field: out_ids,
            "line_idx": pa.array(line_idx, pa.int64()),
            "kind": pa.array(seg.astype(np.int64), pa.int64()),
            "lead": pa.array(lead, pa.string()),
            text_field: text_col,
        }
    )


def segment_stage(ds, text_field: str = "text", id_field: str = "doc_id"):
    """Dataset[doc] -> Dataset[line row] (id, line_idx, kind, lead, text)."""
    import functools

    fn = functools.partial(_segment_batch, text_field=text_field, id_field=id_field)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class EchoTranslationClient:
    """Deterministic stand-in for the cloud / NMT translation backends:
    prefixes ``[<tgt>] `` to every segment. Swap via ``client_factory``."""

    def __init__(self, src_lang: str, tgt_lang: str):
        self.src_lang = src_lang
        self.tgt_lang = tgt_lang

    def translate(self, texts: pa.Array) -> pa.Array:
        return pc.binary_join_element_wise(
            pa.scalar(f"[{self.tgt_lang}] "), texts, ""
        )


class IdentityTranslationClient:
    """No-op client: reassembled output must equal the input exactly —
    the round-trip proof of the segmentation/reassembly structure
    preservation. (Also the class must live in the library, not a test
    module: actor-pool constructor args are deserialized in Ray workers,
    which can only import installed/package modules.)"""

    def __init__(self, src_lang: str, tgt_lang: str):
        pass

    def translate(self, texts: pa.Array) -> pa.Array:
        return texts


class TranslateStage:
    """Actor-pool stage: per-worker client setup in ``__init__`` (the
    reference builds its backend client once per worker too), translate ONLY
    the ``kind == KIND_SEG`` rows per batch, fixed rows pass through."""

    def __init__(self, text_field: str = "text", src_lang: str = "en",
                 tgt_lang: str = "de", client_factory=None):
        self.text_field = text_field
        factory = client_factory or EchoTranslationClient
        self.client = factory(src_lang, tgt_lang)

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _texts(batch, self.text_field)
        kind = batch.column("kind").to_numpy()
        seg_idx = np.flatnonzero(kind == KIND_SEG)
        if len(seg_idx) == 0:
            return batch
        translated = self.client.translate(txt.take(pa.array(seg_idx)))
        # reassemble column without boxing the fixed rows (permutation take)
        fixed_idx = np.flatnonzero(kind != KIND_SEG)
        combined = pa.concat_arrays(
            [txt.take(pa.array(fixed_idx)), translated.combine_chunks() if isinstance(translated, pa.ChunkedArray) else translated]
        )
        perm = np.empty(len(txt), dtype=np.int64)
        perm[np.concatenate([fixed_idx, seg_idx])] = np.arange(len(txt), dtype=np.int64)
        out = combined.take(pa.array(perm))
        return batch.set_column(
            batch.column_names.index(self.text_field), self.text_field, out
        )


def translate_stage(ds, text_field: str = "text", src_lang: str = "en",
                    tgt_lang: str = "de", client_factory=None,
                    concurrency=(1, 8), batch_size: int = 4096):
    return ds.map_batches(
        TranslateStage,
        fn_constructor_kwargs={
            "text_field": text_field,
            "src_lang": src_lang,
            "tgt_lang": tgt_lang,
            "client_factory": client_factory,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def reassemble_stage(ds, text_field: str = "text", id_field: str = "doc_id"):
    """Line rows -> documents: seg lines get their leading whitespace back,
    lines rejoin with \\n in ``line_idx`` order. The family's one wide op."""

    def join_group(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("line_idx").to_numpy())
        lead = group.column("lead").to_pylist()
        txt = group.column(text_field).to_pylist()
        lines = [lead[i] + txt[i] for i in order]
        return pa.table(
            {
                id_field: group.column(id_field).slice(0, 1),
                text_field: pa.array(["\n".join(lines)], pa.string()),
            }
        )

    return ds.groupby(id_field).map_groups(join_group, batch_format="pyarrow")


def translate_documents(ds, text_field: str = "text", id_field: str = "doc_id",
                        src_lang: str = "en", tgt_lang: str = "de",
                        client_factory=None):
    """Full TranslationStage composite (reference pipeline.py:47): one lazy
    chain, streaming until the final groupby."""
    segs = segment_stage(ds, text_field, id_field)
    translated = translate_stage(
        segs, text_field, src_lang, tgt_lang, client_factory
    )
    return reassemble_stage(translated, text_field, id_field)
