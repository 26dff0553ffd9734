"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Replaces the round-1 JPEG stub in ``stages/image.decode_image`` (the sandbox
has no PIL/libjpeg/DALI).  This is a real, self-contained implementation of
the baseline process — JFIF container, Annex K quantization tables with IJG
quality scaling, the spec's standard Huffman tables, interleaved MCUs with
sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0), restart markers — built from the
public ITU-T T.81 spec.  The reference decodes JPEG on GPU via DALI
(``stages/image/io/image_reader.py:31-156``); here decode runs inside
actor-pool ``map_batches`` workers, so throughput scales with the pool even
though Huffman entropy decoding is per-image sequential by nature.

Encoder: 3-component YCbCr 4:4:4 (or 1-component grayscale), quality per the
IJG curve.  Decoder: any baseline sequential JPEG with sampling factors <= 2
(progressive / arithmetic / 12-bit raise ``NotImplementedError``).

Round-trip accuracy is pytest-enforced (PSNR >= 40 dB at quality 95 on the
synthetic corpus — BASELINE.md's lossy-survivor invariant).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- constants

# Annex K.1 — luminance / chrominance quantization tables (natural order).
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zig-zag scan: _ZIGZAG[i] = natural-order index of the i-th zig-zag coeff
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8x8 DCT-II matrix
_k = np.arange(8)
_D = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_D[0, :] = 0.5 / np.sqrt(2)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality curve (public libjpeg jpeg_set_quality semantics)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _block_dct(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//8, W//8, 8, 8) DCT coefficients."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    return np.einsum("ij,bcjk,lk->bcil", _D, blocks, _D, optimize=True)


def _block_idct(coeffs: np.ndarray) -> np.ndarray:
    """(nb, 8, 8) coefficient blocks -> (nb, 8, 8) samples."""
    return np.einsum("ji,bjk,kl->bil", _D, coeffs, _D, optimize=True)


# ------------------------------------------------------------ Huffman tables


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _DecodeTable:
    """Canonical per-length MINCODE/MAXCODE/VALPTR decoding (spec F.2.2.3)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per spec F.1.2.1 (negative = one's complement)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(zz: np.ndarray, pred: int, dc_tbl, ac_tbl, bw: _BitWriter) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, length = dc_tbl[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tbl[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_tbl[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 to baseline JFIF 4:4:4."""
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, ncomp = pixels.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    qt_l, qt_c = _quality_tables(quality)
    planes = (
        [p for p in np.moveaxis(_rgb_to_ycbcr(pixels), -1, 0)]
        if ncomp == 3
        else [pixels[..., 0].astype(np.float64)]
    )
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    qts = [qt_l] + [qt_c] * (ncomp - 1)

    buf = bytearray()
    buf += b"\xff\xd8"  # SOI
    buf += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate([qt_l] + ([qt_c] if ncomp == 3 else [])):
        buf += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        buf += bytes(int(x) for x in qt[_ZIGZAG])
    # SOF0
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    buf += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ncomp == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, vals) in tables:
        seg = bytes([tc]) + bytes(bits) + bytes(vals)
        buf += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    # SOS
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    buf += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    enc_dc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    enc_ac = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    comp_zz = []
    for ci, plane in enumerate(planes):
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        coeffs = _block_dct(padded)  # (by, bx, 8, 8)
        q = np.round(coeffs / qts[ci].reshape(8, 8)).astype(np.int32)
        flat = q.reshape(-1, 64)[:, _ZIGZAG]  # zig-zag per block, raster order
        comp_zz.append(flat.reshape(ph // 8, pw // 8, 64))
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(ph // 8):  # 4:4:4 interleave: one block per component
        for bx in range(pw // 8):
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                preds[ci] = _encode_block(
                    comp_zz[ci][by, bx], preds[ci], enc_dc[t], enc_ac[t], bw
                )
    bw.flush()
    buf += bw.out
    buf += b"\xff\xd9"  # EOI
    return bytes(buf)


# ------------------------------------------------------------------ decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RST handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past EOI (F.2.2.5)
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                    break
                else:  # EOI / next marker: stop consuming
                    break
                self.acc = (self.acc << 8) | byte
                self.nbits += 8
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | byte
                self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                self.acc = 0xFF
                self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Skip to just past an RSTn marker; reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _decode_huff(br: _BitReader, tbl: _DecodeTable) -> int:
    code = br.read_bit()
    length = 1
    while code > tbl.maxcode[length]:
        code = (code << 1) | br.read_bit()
        length += 1
        if length > 16:
            raise ValueError("corrupt JPEG: invalid Huffman code")
    return tbl.huffval[tbl.valptr[length] + code - tbl.mincode[length]]


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (h, w, 3) RGB (or grayscale->RGB).

    Malformed streams always raise ValueError (or NotImplementedError for
    valid-but-unsupported variants): a corrupt payload must surface as the
    per-row error the decode stages catch, never a raw KeyError/IndexError
    from a bogus table id or truncated segment."""
    try:
        return _decode_jpeg(data)
    except (KeyError, IndexError, StopIteration, ZeroDivisionError) as exc:
        raise ValueError(f"corrupt JPEG stream: {type(exc).__name__} {exc}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tbls: dict[int, _DecodeTable] = {}
    ac_tbls: dict[int, _DecodeTable] = {}
    comps = []  # (id, h_samp, v_samp, qt_id)
    height = width = 0
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2) — resync on the next 0xFF
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8).astype(np.int32)
                qts[tq] = tbl[_UNZIGZAG].reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                (ac_tbls if tc else dc_tbls)[th] = _DecodeTable(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append([cid, samp >> 4, samp & 0xF, tq])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xCB, 0xCC, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker 0x{marker:02X})")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []  # (comp index, dc table, ac table)
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c[0] == cid)
                scan.append((ci, dc_tbls[tsel >> 4], ac_tbls[tsel & 0xF]))
            pos += seglen
            return _decode_scan(
                data, pos, comps, scan, qts, height, width, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, comps, scan, qts, height, width, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2 unsupported")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component zig-zag coefficient stores
    stores = []
    for _, hs, vs, _tq in comps:
        stores.append(np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(comps)
            for ci, dct, act in scan:
                _, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = stores[ci][my * vs + by, mx * hs + bx]
                        size = _decode_huff(br, dct)
                        diff = _extend(br.receive(size), size) if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC run overflow")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
            mcu_count += 1
    # dequantize + IDCT + upsample per component (vectorized over blocks)
    planes = []
    for (cid, hs, vs, tq), store in zip(comps, stores):
        nby, nbx = store.shape[0], store.shape[1]
        nat = store.reshape(-1, 64)[:, _UNZIGZAG].astype(np.float64)
        nat *= qts[tq].reshape(-1)[None, :]
        samples = _block_idct(nat.reshape(-1, 8, 8)) + 128.0
        plane = (
            samples.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
