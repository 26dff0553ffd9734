"""PDF codec (functions/pdf.py) + interleaved PDF stages (stages/pdf.py).

Mirrors the reference's nemotron_parse family surface
(reference/nemo_curator/stages/interleaved/pdf/nemotron_parse/): the CPU
halves (structural parse, text/image extraction, manifest partitioning,
model-output postprocess) are real; renderer/VLM seams are gated.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from curator_ray.functions.pdf import PdfError, build_pdf, parse_pdf
from curator_ray.functions.png import decode_png
from curator_ray.stages.pdf import (
    NemotronParseInference,
    interleave_floaters,
    nemotron_postprocess_stage,
    parse_nemotron_output,
    pdf_extract_stage,
    pdf_partitioning_stage,
    render_pdf_pages_gated,
)


def _smooth_rgb(w, h, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 16 + seed) % 256, (y * 16) % 256, ((x + y) * 8) % 256], axis=2
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_roundtrip_text_multipage():
    pdf = build_pdf(
        [
            {"texts": ["Hello world.", "Line (two) with \\ backslash"], "images": []},
            {"texts": [], "images": []},
            {"texts": ["page three"], "images": []},
        ]
    )
    assert pdf.startswith(b"%PDF-1.7")
    pages = parse_pdf(pdf)
    assert [p.texts for p in pages] == [
        ["Hello world.", "Line (two) with \\ backslash"],
        [],
        ["page three"],
    ]


def test_roundtrip_flate_image_exact():
    rgb = (np.arange(12 * 9 * 3, dtype=np.uint8) % 251).reshape(9, 12, 3)
    pdf = build_pdf([{"texts": ["t"], "images": [(12, 9, rgb.tobytes())]}])
    (page,) = parse_pdf(pdf)
    (im,) = page.images
    assert (im.width, im.height, im.filter) == (12, 9, "FlateDecode")
    assert np.array_equal(im.pixels(), rgb)  # lossless: exact equality


def test_roundtrip_dct_image_psnr():
    # the north rule's lossy invariant: PSNR >= 40 dB on the decoded pixels
    from curator_ray.functions.jpeg import encode_jpeg

    px = _smooth_rgb(16, 16)
    pdf = build_pdf([{"texts": [], "images": [(16, 16, encode_jpeg(px, quality=92))]}])
    (page,) = parse_pdf(pdf)
    (im,) = page.images
    assert im.filter == "DCTDecode"
    dec = im.pixels().astype(np.float64)
    mse = ((dec - px.astype(np.float64)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) >= 40.0


def test_string_escapes_and_hex():
    from curator_ray.functions.pdf import _Lexer, _decode_pdf_text

    lx = _Lexer(rb"(a\101\n\)\(b\\)")
    assert lx.parse_object() == b"aA\n)(b\\"
    lx = _Lexer(b"<FEFF00480069>")
    assert _decode_pdf_text(lx.parse_object()) == "Hi"
    lx = _Lexer(b"<48 6\n9>")  # whitespace inside hex, odd digit pads 0
    assert lx.parse_object() == b"Hi"


def test_object_syntax_refs_names_arrays():
    from curator_ray.functions.pdf import _Lexer, _Name, _Ref

    lx = _Lexer(b"<< /A#20B [1 2.5 /N true null] /R 7 0 R >>")
    d = lx.parse_object()
    assert d["A B"] == [1, 2.5, _Name("N"), True, None]
    assert d["R"] == _Ref(7, 0)


def test_malformed_inputs_raise():
    for bad in (b"", b"not a pdf", b"%PDF-1.7 nothing here"):
        with pytest.raises(PdfError):
            parse_pdf(bad)


def test_max_pages_truncates():
    pdf = build_pdf([{"texts": [f"p{i}"], "images": []} for i in range(5)])
    assert len(parse_pdf(pdf, max_pages=2)) == 2


def test_damaged_xref_still_parses():
    # the object-scan parser must survive a corrupted xref table
    pdf = bytearray(build_pdf([{"texts": ["survives"], "images": []}]))
    at = bytes(pdf).find(b"xref")
    pdf[at : at + 4] = b"XXXX"
    (page,) = parse_pdf(bytes(pdf))
    assert page.texts == ["survives"]


# ---------------------------------------------------------------------------
# nemotron output parse + floater repair
# ---------------------------------------------------------------------------


def test_parse_nemotron_output_tags():
    raw = (
        "<x_0.1><y_0.2>Body <b>text</b><x_0.5><y_0.3><class_Text>"
        "<x_0.0><y_0.0><x_0.2><y_0.1><class_Picture>"
        "<x_0.0><y_0.0><x_0.2><y_0.1><class_Footnote>"  # empty non-Picture: dropped
    )
    els = parse_nemotron_output(raw)
    assert [(e["class"], e["text"]) for e in els] == [("Text", "Body text"), ("Picture", "")]
    assert els[0]["bbox"] == [0.1, 0.2, 0.5, 0.3]
    # tag-free fallback
    assert parse_nemotron_output("<i>plain</i> words") == [
        {"class": "Text", "text": "plain words", "bbox": None}
    ]
    assert parse_nemotron_output("   ") == []


def test_interleave_floaters_pairing_and_insertion():
    def el(cls, y, text="x"):
        return {"class": cls, "text": text, "bbox": [0.0, y, 1.0, y]}

    anchored = [el("Text", 0.1), el("Text", 0.5), el("Text", 0.9)]
    floaters = [el("Picture", 0.52), el("Caption", 0.55), el("Picture", 0.08)]
    out = interleave_floaters(anchored, floaters)
    classes_y = [(e["class"], e["bbox"][1]) for e in out]
    # pic@0.08 lands after anchor@0.1; pic@0.52+its caption after anchor@0.5
    assert classes_y == [
        ("Text", 0.1), ("Picture", 0.08),
        ("Text", 0.5), ("Picture", 0.52), ("Caption", 0.55),
        ("Text", 0.9),
    ]
    # no anchors: groups sorted by center-y
    out2 = interleave_floaters([], floaters)
    assert [e["bbox"][1] for e in out2] == [0.08, 0.52, 0.55]


# ---------------------------------------------------------------------------
# stages (need the session Ray fixture)
# ---------------------------------------------------------------------------


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def test_pdf_partitioning_stage_explode(ray_session):
    man = ray.data.from_arrow(
        pa.table(
            {
                "file_name": ["a.pdf", None, "c.pdf"],
                "url": ["u1", "u2", "u3"],
                "cc_pdf_file_names": [None, ["x.pdf", "y.pdf"], None],
            }
        )
    )
    t = _collect(pdf_partitioning_stage(man))
    assert t.column("file_name").to_pylist() == ["a.pdf", "x.pdf", "y.pdf", "c.pdf"]
    assert t.column("url").to_pylist() == ["u1", "u2", "u2", "u3"]
    assert _collect(pdf_partitioning_stage(man, max_pdfs=2)).num_rows == 2


def test_pdf_extract_stage_rows_and_error_row(ray_session):
    rgb = _smooth_rgb(8, 8, seed=3)
    items = [
        {
            "sample_id": "d0",
            "pdf_name": "d0.pdf",
            "pdf_bytes": build_pdf(
                [{"texts": ["alpha", "beta"], "images": [(8, 8, rgb.tobytes())]}]
            ),
        },
        {"sample_id": "bad", "pdf_name": "bad.pdf", "pdf_bytes": b"junk"},
    ]
    out = _collect(
        pdf_extract_stage(ray.data.from_items(items), name_col="pdf_name")
    ).sort_by([("sample_id", "ascending"), ("position", "ascending")])
    rows = out.to_pylist()
    bad = [r for r in rows if r["sample_id"] == "bad"]
    assert len(bad) == 1 and bad[0]["materialize_error"].startswith("PdfError")
    good = [r for r in rows if r["sample_id"] == "d0"]
    assert [(r["position"], r["modality"]) for r in good] == [
        (-1, "metadata"), (0, "text"), (1, "text"), (2, "image"),
    ]
    assert good[0]["text_content"] == '{"pdf_name": "d0.pdf", "num_pages": 1}'
    assert [good[1]["text_content"], good[2]["text_content"]] == ["alpha", "beta"]
    # PNG payload decodes back to the planted pixels exactly
    assert np.array_equal(decode_png(good[3]["binary_content"]), rgb)
    assert good[3]["element_class"] == "Picture"


def test_nemotron_inference_seam_and_postprocess(ray_session):
    pages = ray.data.from_arrow(
        pa.table(
            {
                "sample_id": ["s1", "s1"],
                "page_number": [1, 0],  # out of order: positions follow page order
                "binary_content": pa.array([b"p1", b"p0"], pa.large_binary()),
            }
        )
    )

    def fake_infer(blob):
        if blob == b"p0":
            return (
                "<x_0.1><y_0.2>first<x_0.5><y_0.3><class_Text>"
                "<x_0.1><y_0.1>cap<x_0.2><y_0.15><class_Caption>"
            )
        return "<x_0.1><y_0.2>second<x_0.5><y_0.3><class_Section-header>"

    inf = pages.map_batches(
        NemotronParseInference,
        fn_constructor_kwargs={"infer_fn": fake_infer},
        concurrency=1,
        batch_format="pyarrow",
    )
    rows = _collect(nemotron_postprocess_stage(inf)).sort_by(
        [("sample_id", "ascending"), ("position", "ascending")]
    ).to_pylist()
    assert [(r["position"], r["page_number"], r["text_content"]) for r in rows] == [
        (0, 0, "first"), (1, 0, "cap"), (2, 1, "second"),
    ]
    assert rows[1]["element_class"] == "Caption" and rows[1]["modality"] == "text"


def test_gates_raise_informative():
    with pytest.raises(ImportError, match="pypdfium2"):
        render_pdf_pages_gated(b"%PDF-1.7")
    with pytest.raises(ImportError, match="model-bound"):
        NemotronParseInference()
