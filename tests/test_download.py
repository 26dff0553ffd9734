"""Download -> iterate -> extract pipeline on local fixture files."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from curator_ray.sources.download import (
    CommonCrawlUrlGenerator,
    HttpDownloader,
    LocalGlobUrlGenerator,
    download_extract_pipeline,
    html_to_text,
    iterate_jsonl,
    iterate_warc,
    iterate_wikipedia_dump,
    tex_to_text,
)


def _write_warc(path: str, pages: list[tuple[str, str]]) -> None:
    """Minimal WARC 1.0 fixture: one warcinfo + one response per page."""
    chunks = [b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo"]
    for url, html in pages:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        chunks.append(head + b"\r\n" + http)
    with open(path, "wb") as f:
        f.write(b"\r\n\r\n".join(chunks))


WIKI_XML = """<mediawiki>
  <page><title>Alpha</title><revision><text>Alpha article text.</text></revision></page>
  <page><title>Beta</title><revision><text>Beta body.</text></revision></page>
</mediawiki>"""


def test_iterate_warc(tmp_path):
    p = str(tmp_path / "f.warc")
    _write_warc(p, [("http://a.example/x", "<html><body>Hello <b>world</b></body></html>"),
                    ("http://b.example/y", "<p>second</p>")])
    recs = iterate_warc(p)
    assert [r["url"] for r in recs] == ["http://a.example/x", "http://b.example/y"]
    assert "Hello" in recs[0]["content"] and "second" in recs[1]["content"]


def test_iterate_wikipedia(tmp_path):
    p = str(tmp_path / "dump.xml")
    open(p, "w").write(WIKI_XML)
    recs = iterate_wikipedia_dump(p)
    assert [(r["title"], r["content"]) for r in recs] == [
        ("Alpha", "Alpha article text."),
        ("Beta", "Beta body."),
    ]


def test_extract_kernels():
    html = pa.array(
        ["<html><script>x=1</script><body>Hi &amp; bye</body></html>", "plain"],
        pa.string(),
    )
    out = html_to_text(html).to_pylist()
    assert out == ["Hi & bye", "plain"]
    tex = pa.array([r"intro % comment" + "\n" + r"\section{One} body $x^2$ end", ""], pa.string())
    out = tex_to_text(tex).to_pylist()
    assert "section" not in out[0] and "%" not in out[0] and "$" not in out[0]
    assert "body" in out[0] and "end" in out[0]


def test_url_generators(tmp_path):
    urls = CommonCrawlUrlGenerator(snapshot="2025-30", num_segments=3).generate_urls()
    assert len(urls) == 3 and all("CC-MAIN-2025-30" in u for u in urls)
    open(tmp_path / "a.jsonl", "w").write('{"text": "t"}\n')
    got = LocalGlobUrlGenerator(str(tmp_path / "*.jsonl")).generate_urls()
    assert got == [str(tmp_path / "a.jsonl")]


def test_http_downloader_gated():
    with pytest.raises(NotImplementedError):
        HttpDownloader("/tmp/x")


def test_warc_pipeline_end_to_end(ray_session, tmp_path):
    for i in range(3):
        _write_warc(
            str(tmp_path / f"shard{i}.warc"),
            [(f"http://site{i}.example/{j}", f"<html><body>doc {i}-{j} <i>text</i></body></html>")
             for j in range(4)],
        )
    ds = download_extract_pipeline(
        LocalGlobUrlGenerator(str(tmp_path / "*.warc")), iterate_warc, "content", html_to_text
    )
    rows = ds.take_all()
    assert len(rows) == 12
    assert {r["file_name"] for r in rows} == {f"shard{i}.warc" for i in range(3)}
    assert all(r["text"].startswith("doc ") and "<" not in r["text"] for r in rows)


def test_jsonl_pipeline_no_extract(ray_session, tmp_path):
    import json

    with open(tmp_path / "d.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"doc_id": i, "text": f"doc {i}"}) + "\n")
    ds = download_extract_pipeline(
        LocalGlobUrlGenerator(str(tmp_path / "*.jsonl")), iterate_jsonl, extract_field=None
    )
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in rows] == [f"doc {i}" for i in range(5)]
