"""From-scratch PDF writer + parser (PDF 1.7 subset, pure Python).

The reference's interleaved PDF family
(``reference/nemo_curator/stages/interleaved/pdf/nemotron_parse/``) obtains
PDF bytes, renders pages (pypdfium2) and sends page images to a VLM. The
*rendering* and *VLM* halves are model-bound and stay gated in this engine
(``stages/pdf.py``); this module supplies the CPU-computable half a curation
pipeline needs on raw PDFs: structural parse, per-page text extraction from
content streams, and embedded-image extraction from XObjects — the same
build-the-codec-in-repo policy as ``functions/jpeg.py`` (T.81) and
``functions/mp4.py`` (ISO BMFF).

Everything here follows the public PDF 1.7 spec (ISO 32000-1):

- object syntax: dictionaries ``<< >>``, arrays, names ``/X``, numbers,
  literal strings ``( )`` with backslash escapes incl. octal, hex strings
  ``< >``, booleans, null, indirect references ``n g R``;
- objects are discovered by a linear ``N G obj``...``endobj`` scan rather
  than the xref table — totality over seek speed, the right trade for a
  per-blob ``map_batches`` kernel that must survive truncated/damaged files
  (the xref offsets are the first thing corruption breaks);
- streams: ``/Length`` (direct or indirect) with an ``endstream`` search
  fallback; filters: FlateDecode (zlib), ASCIIHexDecode, DCTDecode
  (passthrough — the payload IS a JPEG, decodable by ``functions/jpeg``);
- text extraction: content-stream tokenization, ``Tj`` ``'`` ``"`` ``TJ``
  string operators inside ``BT``/``ET``, PDFDocEncoding ≈ Latin-1 plus
  UTF-16BE with BOM; one extracted element per BT/ET block;
- image extraction: page ``/Resources`` → ``/XObject`` of ``/Subtype
  /Image``; Flate-compressed DeviceRGB/DeviceGray raw bitmaps decode to
  numpy; DCTDecode returns the embedded JPEG bytes.

The writer emits classic (non-compressed-xref) PDFs with correct offsets so
round-trip tests exercise the real format, and any external PDF reader can
open its output.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np

__all__ = [
    "PdfError",
    "PdfImage",
    "PdfPage",
    "build_pdf",
    "parse_pdf",
]


class PdfError(ValueError):
    """Raised for PDFs this parser cannot interpret."""


# ---------------------------------------------------------------------------
# Object model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Ref:
    num: int
    gen: int


class _Name(str):
    """A PDF name token (``/Type``); subclass so names differ from strings."""


@dataclass
class PdfImage:
    """One embedded image XObject."""

    name: str
    width: int
    height: int
    filter: str  # "FlateDecode" | "DCTDecode" | "Raw"
    colorspace: str  # "DeviceRGB" | "DeviceGray" | other name
    data: bytes  # decoded raw samples (Flate/Raw) or the JPEG bytes (DCT)

    def pixels(self) -> np.ndarray:
        """Decode to an (h, w, 3) uint8 array. DCTDecode routes through the
        repo's own T.81 decoder (``functions/jpeg.decode_jpeg``)."""
        if self.filter == "DCTDecode":
            from .jpeg import decode_jpeg

            return decode_jpeg(self.data)
        n = 3 if self.colorspace == "DeviceRGB" else 1
        need = self.width * self.height * n
        if len(self.data) < need:
            raise PdfError(
                f"image {self.name}: {len(self.data)} bytes < {need} expected"
            )
        arr = np.frombuffer(self.data[:need], dtype=np.uint8).reshape(
            self.height, self.width, n
        )
        if n == 1:
            arr = np.repeat(arr, 3, axis=2)
        return arr


@dataclass
class PdfPage:
    """One parsed page: extracted text elements + embedded images."""

    index: int
    texts: list[str] = field(default_factory=list)
    images: list[PdfImage] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Lexer for PDF object syntax
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_object(self, depth: int = 0) -> Any:
        if depth > 64:
            raise PdfError("object nesting too deep")
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfError("unexpected end of data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict(depth)
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array(depth)
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        m = _NUM_RE.match(d, self.pos)
        if m:
            return self._parse_number_or_ref(m)
        raise PdfError(f"unexpected byte {d[self.pos:self.pos + 1]!r} at {self.pos}")

    def _parse_number_or_ref(self, m: re.Match) -> Any:
        tok = m.group()
        end = m.end()
        # "N G R" indirect reference lookahead (both ints, then R)
        if b"." not in tok:
            m2 = re.compile(rb"\s+(\d+)\s+R\b").match(self.data, end)
            if m2:
                self.pos = m2.end()
                return _Ref(int(tok), int(m2.group(1)))
        self.pos = end
        return float(tok) if b"." in tok else int(tok)

    def _parse_name(self) -> _Name:
        self.pos += 1  # '/'
        d, n = self.data, len(self.data)
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx' hex escape
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return _Name(out.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '('
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    oct_digits = bytearray()
                    while self.pos < n and len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '<'
        digits = bytearray()
        while self.pos < n and d[self.pos] != 0x3E:
            c = d[self.pos]
            if c not in _WS:
                digits.append(c)
            self.pos += 1
        self.pos += 1  # '>'
        if len(digits) % 2:
            digits.append(0x30)  # spec: odd count pads with 0
        try:
            return bytes.fromhex(digits.decode("ascii"))
        except ValueError as exc:
            raise PdfError("bad hex string") from exc

    def _parse_array(self, depth: int) -> list:
        self.pos += 1  # '['
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise PdfError("unterminated array")
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_object(depth + 1))

    def _parse_dict(self, depth: int) -> dict:
        self.pos += 2  # '<<'
        out: dict[str, Any] = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            if self.pos >= len(self.data):
                raise PdfError("unterminated dictionary")
            key = self.parse_object(depth + 1)
            if not isinstance(key, _Name):
                raise PdfError(f"dict key is not a name: {key!r}")
            out[str(key)] = self.parse_object(depth + 1)


# ---------------------------------------------------------------------------
# Document parsing
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_MAX_OBJECTS = 200_000  # totality bound for adversarial inputs


class _Document:
    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict[int, Any] = {}
        self.streams: dict[int, bytes] = {}
        self._scan_objects()

    def _scan_objects(self) -> None:
        count = 0
        for m in _OBJ_RE.finditer(self.data):
            count += 1
            if count > _MAX_OBJECTS:
                raise PdfError("too many objects")
            num = int(m.group(1))
            lex = _Lexer(self.data, m.end())
            try:
                obj = lex.parse_object()
            except PdfError:
                continue  # skip an unparseable body; keep scanning
            raw = None
            # stream payload follows the dict?
            tail = self.data[lex.pos : lex.pos + 32]
            sm = re.match(rb"\s*stream\r?\n", self.data[lex.pos : lex.pos + 16])
            if sm and isinstance(obj, dict):
                start = lex.pos + sm.end()
                raw = self._slice_stream(obj, start)
            # last definition of an object number wins (incremental updates)
            self.objects[num] = obj
            if raw is not None:
                self.streams[num] = raw
            del tail

    def _slice_stream(self, sdict: dict, start: int) -> bytes:
        length = sdict.get("Length")
        if isinstance(length, _Ref):
            length = self.objects.get(length.num)
        if isinstance(length, int) and 0 <= length <= len(self.data) - start:
            end = start + length
            # trust /Length only if endstream actually follows
            if re.match(rb"\s*endstream", self.data[end : end + 16]):
                return self.data[start:end]
        # fallback: search for the terminator
        idx = self.data.find(b"endstream", start)
        if idx < 0:
            raise PdfError("unterminated stream")
        raw = self.data[start:idx]
        # strip the EOL that precedes endstream per spec
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        return raw

    # -- object graph helpers ------------------------------------------------

    def resolve(self, obj: Any, depth: int = 0) -> Any:
        while isinstance(obj, _Ref):
            if depth > 32:
                raise PdfError("reference cycle")
            obj = self.objects.get(obj.num)
            depth += 1
        return obj

    def decoded_stream(self, num: int) -> bytes:
        raw = self.streams.get(num, b"")
        sdict = self.objects.get(num)
        if not isinstance(sdict, dict):
            return raw
        filters = self.resolve(sdict.get("Filter"))
        if filters is None:
            return raw
        if not isinstance(filters, list):
            filters = [filters]
        out = raw
        for f in filters:
            f = str(self.resolve(f))
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error as exc:
                    raise PdfError(f"bad Flate stream in obj {num}") from exc
            elif f == "ASCIIHexDecode":
                digits = re.sub(rb"[\s>]", b"", out)
                if len(digits) % 2:
                    digits += b"0"
                out = bytes.fromhex(digits.decode("ascii", "replace"))
            elif f == "DCTDecode":
                return out  # payload is a JPEG; caller decides
            else:
                raise PdfError(f"unsupported filter {f} in obj {num}")
        return out

    def catalog(self) -> dict:
        # prefer the trailer's /Root; fall back to any /Type /Catalog object
        for m in re.finditer(rb"trailer\b", self.data):
            lex = _Lexer(self.data, m.end())
            try:
                tr = lex.parse_object()
            except PdfError:
                continue
            if isinstance(tr, dict) and "Root" in tr:
                root = self.resolve(tr["Root"])
                if isinstance(root, dict):
                    return root
        for obj in self.objects.values():
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "Catalog":
                return obj
        raise PdfError("no document catalog")

    def pages(self) -> list[tuple[int, dict]]:
        """Walk the page tree; returns (objnum, page dict) in document order."""
        root = self.catalog()
        pages_ref = root.get("Pages")
        out: list[tuple[int, dict]] = []
        seen: set[int] = set()

        def walk(ref: Any) -> None:
            num = ref.num if isinstance(ref, _Ref) else -1
            if num in seen or len(out) > _MAX_OBJECTS:
                return
            if num >= 0:
                seen.add(num)
            node = self.resolve(ref)
            if not isinstance(node, dict):
                return
            t = str(node.get("Type", ""))
            if t == "Page":
                out.append((num, node))
            else:  # Pages (or untyped intermediate)
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)

        walk(pages_ref)
        if not out:  # damaged tree: fall back to scanning for /Type /Page
            for num, obj in sorted(self.objects.items()):
                if isinstance(obj, dict) and str(obj.get("Type", "")) == "Page":
                    out.append((num, obj))
        return out


# ---------------------------------------------------------------------------
# Content-stream text extraction
# ---------------------------------------------------------------------------

_OPERATOR_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _decode_pdf_text(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")  # PDFDocEncoding ≈ Latin-1 for printables


def _extract_text_elements(content: bytes) -> list[str]:
    """One element per BT..ET block; strings from Tj / ' / " / TJ."""
    elements: list[str] = []
    lex = _Lexer(content)
    d, n = content, len(content)
    in_text = False
    parts: list[str] = []
    operands: list[Any] = []
    while lex.pos < n:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = d[lex.pos]
        if c in b"/<([" or c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:
            try:
                operands.append(lex.parse_object())
            except PdfError:
                lex.pos += 1
            if len(operands) > 64:
                operands = operands[-64:]
            continue
        m = _OPERATOR_RE.match(d, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group()
        lex.pos = m.end()
        if op == b"BT":
            in_text, parts = True, []
        elif op == b"ET":
            if in_text:
                text = "".join(parts).strip()
                if text:
                    elements.append(text)
            in_text = False
        elif in_text and op in (b"Tj", b"'", b'"'):
            if operands and isinstance(operands[-1], bytes):
                parts.append(_decode_pdf_text(operands[-1]))
            if op in (b"'", b'"'):
                parts.append("")  # ' and " imply a preceding T* (newline)
        elif in_text and op == b"TJ":
            if operands and isinstance(operands[-1], list):
                for item in operands[-1]:
                    if isinstance(item, bytes):
                        parts.append(_decode_pdf_text(item))
        operands = []
    return elements


# ---------------------------------------------------------------------------
# Public parse entry
# ---------------------------------------------------------------------------


def parse_pdf(data: bytes, max_pages: int = 0) -> list[PdfPage]:
    """Parse a PDF into pages with extracted text elements + images.

    ``max_pages`` > 0 truncates like the reference preprocess stage's
    ``max_pages`` (``preprocess.py:78``). Raises :class:`PdfError` on
    documents without a recognizable structure.
    """
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF- header")
    doc = _Document(data)
    pages = doc.pages()
    if max_pages > 0:
        pages = pages[:max_pages]
    out: list[PdfPage] = []
    for idx, (_num, pdict) in enumerate(pages):
        page = PdfPage(index=idx)
        # text: concatenate the page's content streams, then one element
        # per BT/ET block
        contents = doc.resolve(pdict.get("Contents"))
        refs = contents if isinstance(contents, list) else [pdict.get("Contents")]
        blob = bytearray()
        for ref in refs:
            r = ref
            if isinstance(r, _Ref):
                blob += doc.decoded_stream(r.num)
                blob += b"\n"
        page.texts = _extract_text_elements(bytes(blob))
        # images: /Resources -> /XObject -> /Subtype /Image
        res = doc.resolve(pdict.get("Resources")) or {}
        xobjs = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
        if isinstance(xobjs, dict):
            for name in sorted(xobjs):
                ref = xobjs[name]
                if not isinstance(ref, _Ref):
                    continue
                sdict = doc.resolve(ref)
                if not isinstance(sdict, dict):
                    continue
                if str(doc.resolve(sdict.get("Subtype", ""))) != "Image":
                    continue
                filters = doc.resolve(sdict.get("Filter"))
                if isinstance(filters, list):
                    fname = str(doc.resolve(filters[-1])) if filters else "Raw"
                else:
                    fname = str(filters) if filters is not None else "Raw"
                cs = str(doc.resolve(sdict.get("ColorSpace", "DeviceRGB")))
                w = int(doc.resolve(sdict.get("Width", 0)) or 0)
                h = int(doc.resolve(sdict.get("Height", 0)) or 0)
                try:
                    payload = doc.decoded_stream(ref.num)
                except PdfError:
                    continue  # skip undecodable image, keep the page
                page.images.append(
                    PdfImage(
                        name=str(name), width=w, height=h,
                        filter=fname if fname in ("DCTDecode", "FlateDecode") else "Raw",
                        colorspace=cs, data=payload,
                    )
                )
        out.append(page)
    return out


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _esc_literal(s: str) -> bytes:
    raw = s.encode("latin-1", "replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def build_pdf(pages: list[dict[str, Any]]) -> bytes:
    """Write a classic PDF.

    Each page dict: ``{"texts": [str, ...], "images": [(w, h, payload), ...]}``
    where ``payload`` is either raw RGB bytes (h*w*3, Flate-compressed into
    the file) or JPEG bytes (detected by the SOI marker, embedded DCTDecode).
    Produces real xref offsets; output round-trips through :func:`parse_pdf`
    and opens in standard viewers.
    """
    objs: list[bytes] = []  # body of object i+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_obj_nums: list[int] = []
    kids_placeholder = add(b"")  # 1: Pages node, patched later
    catalog = add(b"<< /Type /Catalog /Pages 1 0 R >>")
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    for page in pages:
        xobj_entries: list[bytes] = []
        for i, (w, h, payload) in enumerate(page.get("images", ())):
            name = f"Im{i}".encode()
            if payload[:2] == b"\xff\xd8":  # JPEG SOI → DCTDecode passthrough
                flt, data, cs = b"/DCTDecode", payload, b"/DeviceRGB"
            else:
                flt, data, cs = b"/FlateDecode", zlib.compress(bytes(payload), 6), b"/DeviceRGB"
            img = add(
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent 8 /Filter %s /Length %d >>\n"
                b"stream\n%s\nendstream" % (w, h, cs, flt, len(data), data)
            )
            xobj_entries.append(b"/%s %d 0 R" % (name, img))

        ops = bytearray()
        for j, text in enumerate(page.get("texts", ())):
            ops += b"BT /F1 11 Tf 36 %d Td (%s) Tj ET\n" % (
                720 - 14 * j,
                _esc_literal(text),
            )
        for i in range(len(page.get("images", ()))):
            ops += b"q 96 0 0 96 36 %d cm /Im%d Do Q\n" % (400 - 110 * i, i)
        zdata = zlib.compress(bytes(ops), 6)
        content = add(
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(zdata), zdata)
        )
        res = b"<< /Font << /F1 %d 0 R >>" % font
        if xobj_entries:
            res += b" /XObject << %s >>" % b" ".join(xobj_entries)
        res += b" >>"
        pg = add(
            b"<< /Type /Page /Parent 1 0 R /MediaBox [0 0 612 792] "
            b"/Resources %s /Contents %d 0 R >>" % (res, content)
        )
        page_obj_nums.append(pg)

    objs[kids_placeholder - 1] = b"<< /Type /Pages /Count %d /Kids [%s] >>" % (
        len(page_obj_nums),
        b" ".join(b"%d 0 R" % n for n in page_obj_nums),
    )

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    return bytes(out)
