"""Minimal pure-stdlib PNG encoder/decoder (8-bit RGB).

The sandbox has no PIL/OpenCV, so the image payloads of the input table
(``bytes: binary`` column, see BASELINE input_hint) are real PNG files produced
and consumed by this module: zlib (stdlib) + the PNG spec. Lossless, so the
per-row invariant check is exact pixel equality (PSNR is infinite); the JPEG
path of the reference's image pipeline is stubbed at decode (see
``curator_ray.stages.image``).

Supports color type 2 (RGB, bit depth 8) which is all the synthetic generator
emits; the decoder handles all five scanline filter types for robustness.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (filter type 0 per scanline)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by any encoder -> (h, w, 3) uint8."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + width * 3
    raw = raw.reshape(height, stride)
    filters = raw[:, 0]
    out = np.zeros((height, width * 3), dtype=np.uint8)
    bpp = 3
    for y in range(height):
        line = raw[y, 1:].copy()
        f = filters[y]
        prev = out[y - 1] if y else np.zeros(width * 3, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(width * 3):
                line[x] = (line[x] + (line[x - bpp] if x >= bpp else 0)) & 0xFF
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average
            for x in range(width * 3):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            for x in range(width * 3):
                left = line[x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                line[x] = (int(line[x]) + int(_paeth(np.array(left), np.array(prev[x]), np.array(ul)))) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"bad filter {f}")
    return out.reshape(height, width, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
