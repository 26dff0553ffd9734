"""DCT-based 64-bit perceptual hash (pHash) over decoded pixels.

Standard construction (Zauner 2010 / the common `imagehash.phash` recipe):
grayscale -> resize to 32x32 -> 2-D DCT-II -> top-left 8x8 low-frequency block
-> bit i = coefficient > median. Deterministic, pure numpy.

Used for the graft-specific SimHash-over-pHash image near-dup stage
(SURVEY.md §2.7) — small pixel perturbations flip only a few of the 64 bits.
"""

from __future__ import annotations

import numpy as np

_N = 32
_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    mat = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    mat[0] /= np.sqrt(2.0)
    return mat


_DCT = _dct_matrix(_N)


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape
    if (h, w) == (out_h, out_w):
        return img.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def phash64(pixels: np.ndarray) -> int:
    """64-bit pHash of an (h, w, 3) or (h, w) uint8 image, as signed int64."""
    if pixels.ndim == 3:
        gray = pixels[..., 0] * 0.299 + pixels[..., 1] * 0.587 + pixels[..., 2] * 0.114
    else:
        gray = pixels.astype(np.float64)
    small = _resize_bilinear(gray, _N, _N)
    dct = _DCT @ small @ _DCT.T
    block = dct[:_K, :_K].copy()
    flat = block.flatten()
    med = np.median(flat[1:])  # exclude DC term from the median, per convention
    bits = flat > med
    value = 0
    for b in bits:
        value = (value << 1) | int(b)
    # reinterpret as signed int64 (the table column is int64)
    return int(np.uint64(value).astype(np.int64))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between int64/uint64 arrays."""
    x = (np.asarray(a).astype(np.int64).view(np.uint64)) ^ (np.asarray(b).astype(np.int64).view(np.uint64))
    return popcount64(x)


def popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)
