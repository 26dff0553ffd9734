"""Download -> iterate -> extract pipelines (Common Crawl / Wikipedia / ArXiv).

Ray-Data-native counterpart of the reference's download package
(``stages/text/download/base/{url_generation,download,iterator,stage}.py``:
URLGenerationStage fans one FileGroupTask per URL, DocumentDownloadStage
fetches to local files, DocumentIterateExtractStage parses records and
extracts text; ``download/common_crawl/*``, ``wikipedia/*``, ``arxiv/*``
specialize the four hooks).

Here the same four hooks compose as a Dataset pipeline::

    urls -> ray.data.from_items -> map_batches(Downloader actor)
         -> map_batches(iterate: one task per file, emits record rows)
         -> map_batches(extractor kernel, vectorized)

This sandbox has no network, so the HTTP downloader is gated behind a
clearly-marked error and ``LocalFileDownloader`` serves pre-fetched fixture
files — the iterate/extract stages are pure functions and fully tested. The
reference's justext/trafilatura/resiliparse HTML extractors are model-free
C libraries absent here; ``html_to_text`` is a regex stand-in with the same
contract (``html_extractors/base.py``).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ------------------------------------------------------------ URL generation


class URLGenerator:
    """Reference URLGenerator (url_generation.py:25-30)."""

    def generate_urls(self) -> list[str]:
        raise NotImplementedError


@dataclass
class CommonCrawlUrlGenerator(URLGenerator):
    """CC-MAIN WARC paths for a snapshot range (common_crawl/url_generation.py
    semantics: snapshot -> warc.paths listing). Offline: emits the
    deterministic path patterns; fetching the real path index needs network."""

    snapshot: str = "2025-30"
    num_segments: int = 10

    def generate_urls(self) -> list[str]:
        base = f"https://data.commoncrawl.org/crawl-data/CC-MAIN-{self.snapshot}/segments"
        return [f"{base}/{i:05d}/warc/CC-MAIN-segment-{i:05d}.warc.gz" for i in range(self.num_segments)]


@dataclass
class LocalGlobUrlGenerator(URLGenerator):
    """Fixture-file generator: 'urls' are local paths (pre-downloaded)."""

    pattern: str

    def generate_urls(self) -> list[str]:
        return sorted(_glob.glob(self.pattern))


# ----------------------------------------------------------------- download


class LocalFileDownloader:
    """Downloader for pre-fetched files: url == local path, verified to
    exist. Mirrors the reference's check_download/skip-existing behavior
    (download.py:60-120) without the network fetch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("url").to_pylist()
        ok = [os.path.exists(p) for p in paths]
        return pa.table(
            {"path": pa.array([p for p, k in zip(paths, ok) if k], pa.string())}
        )


class HttpDownloader:
    """Real fetch path — unavailable in this sandbox (no network). The class
    exists so the pipeline shape is complete; constructing it raises."""

    def __init__(self, output_dir: str):
        raise NotImplementedError(
            "network access is unavailable in this environment; pre-fetch files "
            "and use LocalFileDownloader"
        )


# ----------------------------------------------------------------- iterators


def iterate_warc(path: str) -> list[dict]:
    """Minimal WARC 1.0/1.1 parser: yields one record dict per 'response'
    record with (url, content) where content is the HTTP payload — the
    contract of the reference's CommonCrawlWarcIterator
    (common_crawl/iterator.py). Pure function over a local file."""
    records = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while True:
        start = data.find(b"WARC/1.", pos)
        if start < 0:
            break
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        header = data[start:head_end].decode("utf-8", "replace")
        fields = dict(
            (k.strip().lower(), v.strip())
            for k, v in (line.split(":", 1) for line in header.splitlines()[1:] if ":" in line)
        )
        length = int(fields.get("content-length", 0))
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if fields.get("warc-type") == "response":
            # skip the HTTP response header block if present
            http_end = body.find(b"\r\n\r\n")
            payload = body[http_end + 4 :] if http_end >= 0 else body
            records.append(
                {
                    "url": fields.get("warc-target-uri", ""),
                    "content": payload.decode("utf-8", "replace"),
                }
            )
    return records


def iterate_wikipedia_dump(path: str) -> list[dict]:
    """Wikipedia XML dump -> one record per <page> with (title, content)
    (wikipedia/iterator.py contract). stdlib ElementTree, pure function."""
    import xml.etree.ElementTree as ET

    records = []
    tree = ET.parse(path)
    root = tree.getroot()
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    for page in root.iter(f"{ns}page"):
        title = page.findtext(f"{ns}title") or ""
        text = page.findtext(f"{ns}revision/{ns}text") or ""
        records.append({"title": title, "content": text})
    return records


def iterate_jsonl(path: str) -> list[dict]:
    import json

    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


# ---------------------------------------------------------------- extractors


_TAG_RE = r"<[^>]*>"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>"


def html_to_text(arr) -> pa.Array:
    """Vectorized HTML -> visible text (regex stand-in for the reference's
    justext/trafilatura extractors, html_extractors/base.py): drop
    script/style blocks and tags, unescape the common entities, collapse
    blank runs."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.replace_substring_regex(arr, _SCRIPT_RE, "")
    out = pc.replace_substring_regex(out, _TAG_RE, "")
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        out = pc.replace_substring(out, ent, ch)
    out = pc.replace_substring_regex(out, r"[ \t]+", " ")
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(out, r"\n{3,}", "\n\n"))


def tex_to_text(arr) -> pa.Array:
    """ArXiv TeX -> plain-ish text (arxiv/extract.py contract): strip
    comments, inline math, common commands and braces."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.replace_substring_regex(arr, r"(?m)%.*$", "")
    out = pc.replace_substring_regex(out, r"\$[^$]*\$", "")
    out = pc.replace_substring_regex(out, r"\\[a-zA-Z]+(\[[^\]]*\])?(\{[^{}]*\})?", "")
    out = pc.replace_substring_regex(out, r"[{}]", "")
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(out, r"[ \t]+", " "))


# ----------------------------------------------------------------- pipeline


def download_extract_pipeline(
    url_generator: URLGenerator,
    iterate_fn,
    extract_field: str | None = "content",
    extractor=html_to_text,
    downloader_cls=LocalFileDownloader,
    limit: int | None = None,
):
    """URL generation -> download -> iterate -> extract as one Dataset.

    ``iterate_fn(path) -> list[dict]`` runs one task per file (the
    reference's DocumentIterateExtractStage fan-out); ``extractor`` is a
    vectorized column kernel applied to ``extract_field`` (pass None to skip
    extraction, e.g. for jsonl that is already text)."""
    import ray

    urls = url_generator.generate_urls()
    if limit is not None:
        urls = urls[:limit]
    if not urls:
        raise ValueError("URL generator produced no urls")
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    files = ds.map_batches(
        downloader_cls, batch_format="pyarrow", zero_copy_batch=True, batch_size=1, concurrency=(1, 8)
    )

    def iterate_batch(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path in batch.column("path").to_pylist():
            for rec in iterate_fn(path):
                rec = dict(rec)
                rec["file_name"] = os.path.basename(path)
                rows.append(rec)
        if not rows:
            return pa.table({"file_name": pa.array([], pa.string())})
        keys = sorted({k for r in rows for k in r})
        return pa.table({k: pa.array([r.get(k) for r in rows]) for k in keys})

    records = files.map_batches(iterate_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=1)
    if extract_field is None or extractor is None:
        return records

    def extract_batch(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(extract_field)
        return batch.set_column(idx, "text", extractor(batch.column(extract_field))).rename_columns(
            [("text" if c == extract_field else c) for c in batch.column_names]
        )

    return records.map_batches(extract_batch, batch_format="pyarrow", zero_copy_batch=True)
