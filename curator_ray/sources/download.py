"""Download → iterate → extract pipelines (Common Crawl / Wikipedia / ArXiv).

Re-expresses the reference's ``DocumentDownloadExtractStage`` composite
(``stages/text/download/base/stage.py:27-84``) Ray-Data-first:

- URL generation is a tiny driver-side list (one row per remote file);
- download + iterate + extract run as ONE ``map_batches`` task per file
  (``batch_size=1`` over the URL table): each task materializes one remote
  file to local scratch, parses its records, extracts, and emits an Arrow
  table of documents. File-level parallelism is exactly the reference's
  ``FileGroupTask`` fan-out, but scheduled by the streaming executor with
  backpressure — at 100 TB the stage streams: no file list ever
  materializes more than URL strings, and each task's footprint is one
  archive + its parsed records.
- the parsers are pure functions (``functions/warc.py``, ``wikitext.py``,
  ``latex.py``, ``htmltext.py``) so iterate/extract are testable offline
  on fixture files — the sandbox has no network, so the wget downloader is
  present but only exercised when a URL is reachable; ``LocalCopyDownloader``
  serves fixtures through the identical code path.

Iterator/extractor contracts mirror the reference
(``base/iterator.py:32-47``, ``base/extract.py``): iterators yield dict
records from one file path; extractors map record -> record | None.
"""

from __future__ import annotations

import bz2
import codecs
import gzip
import os
import subprocess
import tarfile
import tempfile
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Any, Callable
from urllib.parse import quote, urlparse

import pyarrow as pa

from ..functions.htmltext import EN_STOP_WORDS, decode_html, extract_html_text
from ..functions.latex import clean_latex_project
from ..functions.warc import iter_warc_records, strip_http_headers
from ..functions.wikitext import clean_wikitext

# --------------------------------------------------------------- URL generation


@dataclass
class CommonCrawlURLGenerator:
    """WARC urls for a crawl snapshot (reference
    ``common_crawl/url_generation.py``). Offline-deterministic: builds the
    canonical ``crawl-data/CC-MAIN-{snapshot}/segments/...`` layout from an
    explicit segment/file count instead of fetching ``warc.paths.gz``."""

    snapshot: str  # e.g. "2024-30"
    segments: list[str] = field(default_factory=list)
    files_per_segment: int = 1
    base_url: str = "https://data.commoncrawl.org/"

    def generate_urls(self) -> list[str]:
        urls = []
        for seg in self.segments or ["1720763517846.73"]:
            for i in range(self.files_per_segment):
                urls.append(
                    f"{self.base_url}crawl-data/CC-MAIN-{self.snapshot}/segments/{seg}/warc/"
                    f"CC-MAIN-{self.snapshot}-{i:05d}.warc.gz"
                )
        return urls


@dataclass
class WikipediaURLGenerator:
    """Dump-part urls for a wiki dump date (reference
    ``wikipedia/url_generation.py``)."""

    language: str = "en"
    dump_date: str = "20240401"
    parts: int = 1
    base_url: str = "https://dumps.wikimedia.org/"

    def generate_urls(self) -> list[str]:
        prefix = f"{self.language}wiki/{self.dump_date}/{self.language}wiki-{self.dump_date}"
        return [
            f"{self.base_url}{prefix}-pages-articles-multistream{i if i > 1 else ''}.xml.bz2"
            for i in range(1, self.parts + 1)
        ]


@dataclass
class ArxivURLGenerator:
    """s3-layout tar urls for arXiv source chunks (reference
    ``arxiv/url_generation.py``)."""

    yymms: list[str] = field(default_factory=lambda: ["2401"])
    chunks_per_month: int = 1

    def generate_urls(self) -> list[str]:
        return [
            f"s3://arxiv/src/arXiv_src_{ym}_{i:03d}.tar"
            for ym in self.yymms
            for i in range(1, self.chunks_per_month + 1)
        ]


# ------------------------------------------------------------------ downloaders


class LocalCopyDownloader:
    """'Download' = the url path IS a local file (file:// or plain path).

    Serves fixtures and pre-mirrored corpora through the same pipeline
    code path the network downloader uses."""

    def fetch(self, url: str, download_dir: str) -> str:
        path = urlparse(url).path if "://" in url else url
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return path


class WgetDownloader:
    """wget-based downloader (reference
    ``common_crawl/download.py:41-108``): retries on HTTP 503, atomic
    temp-file rename so a killed task never leaves a partial file."""

    def __init__(self, tries: int = 5):
        self.tries = tries

    def fetch(self, url: str, download_dir: str) -> str:
        os.makedirs(download_dir, exist_ok=True)
        out = os.path.join(download_dir, urlparse(url).path[1:].replace("/", "-"))
        if os.path.exists(out):
            return out
        tmp = out + ".tmp"
        cmd = ["wget", url, "-O", tmp, "--retry-on-http-error=503", f"--tries={self.tries}", "-q"]
        res = subprocess.run(cmd, stderr=subprocess.PIPE)
        if res.returncode != 0:
            raise RuntimeError(f"download failed for {url}: {res.stderr.decode()[-500:]}")
        os.replace(tmp, out)
        return out


# -------------------------------------------------------------------- iterators


class WarcIterator:
    """Yield response records from a WARC file (reference
    ``common_crawl/warc_iterator.py:30-57``)."""

    output_columns = ["url", "warc_id", "source_id", "content"]
    column_types = {"content": pa.binary()}

    def iterate(self, file_path: str) -> Iterator[dict[str, Any]]:
        source_id = os.path.basename(file_path)
        for headers, payload in iter_warc_records(file_path):
            if headers.get("WARC-Type") != "response":
                continue
            rid = headers.get("WARC-Record-ID", "")
            yield {
                "url": headers.get("WARC-Target-URI", ""),
                "warc_id": rid[10:-1] if rid.startswith("<urn:uuid:") else rid,
                "source_id": source_id,
                "content": strip_http_headers(payload),
            }


class WikipediaIterator:
    """Yield main-namespace, non-redirect articles from a pages-articles
    .xml.bz2 dump (reference ``wikipedia/iterator.py:28-148``)."""

    output_columns = ["title", "id", "url", "language", "source_id", "raw_content"]

    def __init__(self, language: str = "en"):
        self.language = language

    def iterate(self, file_path: str) -> Iterator[dict[str, Any]]:
        source_id = os.path.basename(file_path)
        opener = bz2.BZ2File(file_path) if file_path.endswith(".bz2") else open(file_path, "rb")
        with opener as fh:
            reader = codecs.getreader("utf-8")(fh)
            for _event, elem in ET.iterparse(reader, events=("end",)):
                if not elem.tag.endswith("page"):
                    continue
                ns_prefix = elem.tag[: -len("page")]
                title = elem.findtext(f"./{ns_prefix}title")
                ns = elem.findtext(f"./{ns_prefix}ns")
                page_id = elem.findtext(f"./{ns_prefix}id")
                redirect = elem.find(f"./{ns_prefix}redirect")
                text = elem.findtext(f"./{ns_prefix}revision/{ns_prefix}text")
                elem.clear()
                if not (title and page_id) or ns != "0" or redirect is not None or text is None:
                    continue
                yield {
                    "title": title,
                    "id": page_id,
                    "url": f"https://{self.language}.wikipedia.org/wiki/{quote(title)}",
                    "language": self.language,
                    "source_id": source_id,
                    "raw_content": text,
                }


class ArxivIterator:
    """Yield per-submission tex-file lists from an arXiv source chunk tar
    (reference ``arxiv/iterator.py:33-155``): the chunk tar contains one
    inner archive per paper — a tar of .tex files or a gzipped single file."""

    output_columns = ["id", "source_id", "content"]
    column_types = {"content": pa.list_(pa.string())}

    def iterate(self, file_path: str) -> Iterator[dict[str, Any]]:
        source_id = os.path.basename(file_path)
        with tempfile.TemporaryDirectory() as tmpdir, tarfile.open(file_path) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                # safe extraction: refuse members escaping the tmpdir
                dest = os.path.realpath(os.path.join(tmpdir, member.name))
                if not dest.startswith(os.path.realpath(tmpdir) + os.sep):
                    continue
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(dest, "wb") as out:
                    out.write(tf.extractfile(member).read())
                tex_files = self._load_project(dest)
                os.unlink(dest)
                if tex_files is None:
                    continue
                arxiv_id = os.path.splitext(os.path.basename(member.name))[0]
                yield {"id": arxiv_id, "source_id": source_id, "content": tex_files}

    @staticmethod
    def _load_project(path: str) -> list[str] | None:
        try:
            with tarfile.open(path) as sub:
                out = []
                for m in sub.getmembers():
                    if m.name.endswith(".tex"):
                        try:
                            out.append(sub.extractfile(m).read().decode("utf-8"))
                        except UnicodeDecodeError:
                            return None
                return out
        except tarfile.ReadError:
            pass
        try:
            with gzip.open(path, "rb") as gz:
                return [gz.read().decode("utf-8")]
        except (OSError, UnicodeDecodeError):
            return None


# ------------------------------------------------------------------- extractors


class CommonCrawlHTMLExtractor:
    """HTML → main text + language (reference
    ``common_crawl/extract.py:29-104``). ``algorithm`` selects the
    extraction algorithm like the reference's ``html_extraction`` arg:
    ``justext`` (default), ``resiliparse``, or ``trafilatura`` — see
    ``functions/htmltext.py`` for each algorithm's semantics."""

    input_columns = ["url", "warc_id", "source_id", "content"]
    output_columns = ["url", "warc_id", "source_id", "language", "text"]

    _ALGORITHMS = ("justext", "resiliparse", "trafilatura")

    def __init__(
        self,
        stop_lists: dict[str, frozenset[str]] | None = None,
        algorithm: str = "justext",
        **extractor_kwargs,
    ):
        if algorithm not in self._ALGORITHMS:
            raise ValueError(f"algorithm must be one of {self._ALGORITHMS}, got {algorithm!r}")
        self.stop_lists = stop_lists or {"en": EN_STOP_WORDS}
        self.algorithm = algorithm
        self.kwargs = extractor_kwargs

    def _extract_paragraphs(self, html: str, stop_words: frozenset[str]) -> list[str] | None:
        if self.algorithm == "resiliparse":
            from ..functions.htmltext import extract_resiliparse_style

            return extract_resiliparse_style(html, stop_words, **self.kwargs)
        if self.algorithm == "trafilatura":
            from ..functions.htmltext import extract_trafilatura_style

            return extract_trafilatura_style(html, stop_words, **self.kwargs)
        return extract_html_text(html, stop_words, **self.kwargs)

    def extract(self, record: dict[str, Any]) -> dict[str, Any] | None:
        html = decode_html(record.get("content") or b"")
        if not html:
            return None
        lang = self._detect_lang(html)
        if lang not in self.stop_lists:
            return None
        paragraphs = self._extract_paragraphs(html, self.stop_lists[lang])
        if not paragraphs:
            return None
        return {
            "url": record["url"],
            "warc_id": record["warc_id"],
            "source_id": record["source_id"],
            "language": lang,
            "text": "\n\n".join(paragraphs),
        }

    @staticmethod
    def _detect_lang(html: str) -> str:
        from ..stages.text import lang_id

        return lang_id(pa.array([html]))[0].as_py()


class WikipediaExtractor:
    """Wikitext → plain text (reference ``wikipedia/extract.py:568-716``)."""

    input_columns = ["title", "id", "url", "language", "source_id", "raw_content"]
    output_columns = ["text", "title", "id", "url", "language", "source_id"]

    def extract(self, record: dict[str, Any]) -> dict[str, Any] | None:
        text = clean_wikitext(record.get("raw_content") or "")
        if not text:
            return None
        return {
            "text": text,
            "title": record["title"],
            "id": record["id"],
            "url": record["url"],
            "language": record["language"],
            "source_id": record["source_id"],
        }


class ArxivLatexExtractor:
    """Tex project → cleaned text (reference ``arxiv/extract.py:28-207``,
    RedPajama rules)."""

    input_columns = ["id", "source_id", "content"]
    output_columns = ["text", "id", "source_id"]

    def extract(self, record: dict[str, Any]) -> dict[str, Any] | None:
        text = clean_latex_project(record.get("content") or [])
        if not text:
            return None
        return {"text": text, "id": record["id"], "source_id": record["source_id"]}


# ----------------------------------------------------------------- Ray plumbing


def _file_task(
    batch: pa.Table,
    *,
    downloader,
    iterator,
    extractor,
    download_dir: str,
    record_limit: int | None,
    add_filename_column: bool,
) -> pa.Table:
    """One task = one file: download, iterate, extract, emit documents."""
    records: list[dict] = []
    cols = list(extractor.output_columns if extractor else iterator.output_columns)
    # extractors emit string columns; raw iterator output may carry typed
    # columns (binary WARC payloads, list<string> tex projects) — a zero-record
    # file must emit the same schema or the Dataset union fails
    types = {} if extractor else dict(getattr(iterator, "column_types", {}))
    if add_filename_column:
        cols.append("file_name")
    for url in batch.column("url").to_pylist():
        path = downloader.fetch(url, download_dir)
        n = 0
        for rec in iterator.iterate(path):
            if record_limit is not None and n >= record_limit:
                break
            out = extractor.extract(rec) if extractor else rec
            if out is None:
                continue
            if add_filename_column:
                out["file_name"] = os.path.basename(path)
            records.append(out)
            n += 1
    return pa.table(
        {c: pa.array([r.get(c) for r in records], types.get(c, pa.string())) for c in cols}
    )


def download_extract_dataset(
    urls: list[str] | Any,
    downloader,
    iterator,
    extractor=None,
    *,
    download_dir: str = "/tmp/curator_ray_downloads",
    record_limit: int | None = None,
    add_filename_column: bool = True,
    url_limit: int | None = None,
):
    """URL list → Dataset of extracted documents (one streaming task/file).

    ``urls`` may be a list or a URLGenerator. The reference's composite
    URL→download→iterate→extract stage, as a single ``map_batches`` with
    ``batch_size=1``: Ray Data schedules one task per file and the
    streaming executor backpressures downloads against downstream
    consumers, so disk/object-store footprint stays bounded by
    in-flight-task count rather than corpus size."""
    import functools

    import ray

    if hasattr(urls, "generate_urls"):
        urls = urls.generate_urls()
    if url_limit is not None:
        urls = urls[:url_limit]
    ds = ray.data.from_items([{"url": u} for u in urls])
    fn = functools.partial(
        _file_task,
        downloader=downloader,
        iterator=iterator,
        extractor=extractor,
        download_dir=download_dir,
        record_limit=record_limit,
        add_filename_column=add_filename_column,
    )
    return ds.map_batches(fn, batch_size=1, batch_format="pyarrow")


def common_crawl_pipeline(warc_urls: list[str], local: bool = False, **kwargs):
    """CommonCrawlDownloadExtractStage equivalent
    (reference ``common_crawl/stage.py``)."""
    return download_extract_dataset(
        warc_urls,
        LocalCopyDownloader() if local else WgetDownloader(),
        WarcIterator(),
        CommonCrawlHTMLExtractor(),
        **kwargs,
    )


def wikipedia_pipeline(dump_urls: list[str], language: str = "en", local: bool = False, **kwargs):
    """WikipediaDownloadExtractStage equivalent
    (reference ``wikipedia/stage.py``)."""
    return download_extract_dataset(
        dump_urls,
        LocalCopyDownloader() if local else WgetDownloader(),
        WikipediaIterator(language=language),
        WikipediaExtractor(),
        **kwargs,
    )


def arxiv_pipeline(tar_urls: list[str], local: bool = False, **kwargs):
    """ArxivDownloadExtractStage equivalent (reference ``arxiv/stage.py``)."""
    return download_extract_dataset(
        tar_urls,
        LocalCopyDownloader() if local else WgetDownloader(),
        ArxivIterator(),
        ArxivLatexExtractor(),
        **kwargs,
    )
