"""Header-only image dimension probing (PNG IHDR, JPEG SOF, GIF, BMP).

The reference's interleaved aspect-ratio filter opens every image with
Pillow just to read ``image.size``
(``reference/nemo_curator/stages/interleaved/stages.py:142-156``). Pillow
is absent here, and a full decode for two integers is wasteful anyway at
10^12 rows, so this reads the dimensions straight from the container
headers — O(header bytes) per image, no pixel decode.
"""

from __future__ import annotations

import struct


def image_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the image header, or None if unrecognized."""
    if data is None or len(data) < 16:
        return None
    # PNG: 8-byte signature, then IHDR chunk with big-endian w, h
    if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", data, 16)
        return (w, h) if w and h else None
    # JPEG: walk marker segments to the first SOF (C0-CF except C4/C8/CC)
    if data[:2] == b"\xff\xd8":
        pos = 2
        n = len(data)
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if pos + 4 > n:
                return None
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 > n:
                    return None
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return (w, h) if w and h else None
            pos += 2 + seglen
        return None
    # GIF87a/89a: little-endian logical screen size
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return (w, h) if w and h else None
    # BMP: BITMAPINFOHEADER
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
        return (w, abs(h)) if w > 0 and h != 0 else None
    return None
