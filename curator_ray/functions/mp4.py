"""Minimal ISO BMFF (MP4) box parser + writer: container metadata only.

The reference's video reader shells out to ffprobe for metadata
(``reference/nemo_curator/stages/video/io/video_reader.py:73-228`` fills
``num_frames / framerate / width / height / video_codec / duration``).
ffmpeg/ffprobe/PyAV are absent in this sandbox, and the engine keeps video
as opaque ``binary`` columns anyway, so this module implements the one
thing metadata scans need — walking the ISO/IEC 14496-12 box tree — from
the public specification:

- ``mvhd``: movie timescale + duration -> duration seconds
- ``tkhd``: track width / height (16.16 fixed point)
- ``mdhd`` + ``stts``: media timescale + sample deltas -> frame count, fps
- ``stsd``: first sample-entry fourcc -> codec name

The writer emits a structurally valid, codec-payload-free MP4 (ftyp +
empty mdat + moov) so tests and synthetic corpora can round-trip metadata
through real container bytes. Sample *decode* requires a codec and stays
gated at the stage layer.

Parsing touches only box headers + the few fixed-size leaf boxes:
O(#boxes) per file, no frame data read — safe for metadata scans over
10^12 rows.
"""

from __future__ import annotations

import struct
from typing import Iterator, NamedTuple


class Mp4Info(NamedTuple):
    duration: float  # seconds (mvhd)
    timescale: int
    width: int
    height: int
    num_frames: int
    framerate: float
    video_codec: str | None


def _boxes(b: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        fourcc = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr:
            return
        yield fourcc, pos + hdr, min(pos + size, end)
        pos += size


def _find(b: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int] | None:
    if not path:
        return start, end
    for cc, s, e in _boxes(b, start, end):
        if cc == path[0]:
            got = _find(b, s, e, path[1:])
            if got is not None:
                return got
    return None


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _need(n_entries: int, entry_size: int, table_start: int, box_end: int, cc: bytes) -> None:
    """Bound a sample-table entry count against its box payload: a truncated
    or corrupt table must surface as ValueError (the error the stages catch
    per row), never struct.error or a multi-GB list allocation from a bogus
    32-bit count."""
    if n_entries < 0 or table_start + n_entries * entry_size > box_end:
        raise ValueError(
            f"corrupt {cc.decode('ascii', 'replace')} box: {n_entries} entries "
            "exceed the box payload"
        )


def _walk(b: bytes, start: int, end: int, out: dict) -> None:
    for cc, s, e in _boxes(b, start, end):
        if cc in _CONTAINERS:
            if cc == b"trak":
                out.setdefault("traks", []).append({})
                out["_cur"] = out["traks"][-1]
            _walk(b, s, e, out)
        elif cc == b"mvhd":
            ver = b[s]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", b, s + 4 + 16)
            else:
                ts, dur = struct.unpack_from(">II", b, s + 4 + 8)
            out["timescale"], out["duration_units"] = ts, dur
        elif cc == b"tkhd":
            ver = b[s]
            off = s + 4 + (32 if ver == 1 else 20) + 52
            w, h = struct.unpack_from(">II", b, off)
            cur = out.get("_cur", out)
            cur["width"], cur["height"] = w >> 16, h >> 16
        elif cc == b"mdhd":
            ver = b[s]
            if ver == 1:
                mts, mdur = struct.unpack_from(">IQ", b, s + 4 + 16)
            else:
                mts, mdur = struct.unpack_from(">II", b, s + 4 + 8)
            cur = out.get("_cur", out)
            cur["media_timescale"], cur["media_duration"] = mts, mdur
        elif cc == b"stts":
            (n,) = struct.unpack_from(">I", b, s + 4)
            _need(n, 8, s + 8, e, cc)
            counts = 0
            for i in range(n):
                cnt, _delta = struct.unpack_from(">II", b, s + 8 + 8 * i)
                counts += cnt
            cur = out.get("_cur", out)
            cur["num_frames"] = counts
        elif cc == b"stsd":
            (n,) = struct.unpack_from(">I", b, s + 4)
            if n >= 1 and s + 16 <= e:
                cur = out.get("_cur", out)
                cur["codec"] = b[s + 12 : s + 16].decode("ascii", "replace")
        elif cc == b"stsz":
            sample_size, n = struct.unpack_from(">II", b, s + 4)
            cur = out.get("_cur", out)
            if sample_size:
                # fixed-size form carries no table to bound against; the
                # samples themselves must fit in the file
                if n < 0 or sample_size * n > len(b):
                    raise ValueError(f"corrupt stsz box: {n} x {sample_size} B samples")
                cur["sample_sizes"] = [sample_size] * n
            else:
                _need(n, 4, s + 12, e, cc)
                cur["sample_sizes"] = list(
                    struct.unpack_from(f">{n}I", b, s + 12)
                )
        elif cc in (b"stco", b"co64"):
            (n,) = struct.unpack_from(">I", b, s + 4)
            _need(n, 4 if cc == b"stco" else 8, s + 8, e, cc)
            fmt = ">%d%s" % (n, "I" if cc == b"stco" else "Q")
            cur = out.get("_cur", out)
            cur["chunk_offsets"] = list(struct.unpack_from(fmt, b, s + 8))
        elif cc == b"stsc":
            (n,) = struct.unpack_from(">I", b, s + 4)
            _need(n, 12, s + 8, e, cc)
            cur = out.get("_cur", out)
            cur["sample_to_chunk"] = [
                struct.unpack_from(">III", b, s + 8 + 12 * i) for i in range(n)
            ]


def mp4_sample_ranges(b: bytes) -> list[tuple[int, int]]:
    """(file_offset, size) per media sample of the first video track,
    resolved from the sample tables (stsz x stsc x stco/co64) the same way
    a demuxer locates frames — ISO/IEC 14496-12 §8.7. For MJPEG tracks
    (sample entry ``jpeg``) each range is one complete JFIF stream, so
    ``b[off:off+size]`` feeds the repo's own T.81 decoder directly."""
    out: dict = {}
    try:
        _walk(b, 0, len(b), out)
    except struct.error as exc:  # truncated leaf box -> the stages' per-row error
        raise ValueError(f"truncated MP4 box: {exc}") from exc
    trak = None
    for t in out.get("traks", []):
        if t.get("sample_sizes"):
            trak = t
            break
    if trak is None:
        raise ValueError("no track with a non-empty sample-size table")
    sizes = trak["sample_sizes"]
    offsets = trak.get("chunk_offsets") or []
    stsc = trak.get("sample_to_chunk") or []
    if not offsets or not stsc:
        raise ValueError("missing stco/stsc sample tables")
    # expand stsc runs: entry i applies from first_chunk_i until first_chunk_{i+1}
    ranges: list[tuple[int, int]] = []
    si = 0
    for ei, (first_chunk, per_chunk, _desc) in enumerate(stsc):
        last_chunk = (
            stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else len(offsets)
        )
        for chunk in range(first_chunk, last_chunk + 1):
            pos = offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return ranges
                ranges.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
    return ranges


def mp4_info(b: bytes) -> Mp4Info:
    """Parse metadata from MP4 bytes (raises ValueError on non-BMFF data)."""
    top = list(_boxes(b, 0, len(b)))
    if not any(cc == b"moov" for cc, _, _ in top) and not any(
        cc == b"ftyp" for cc, _, _ in top
    ):
        raise ValueError("not an ISO BMFF stream")
    out: dict = {}
    try:
        _walk(b, 0, len(b), out)
    except struct.error as exc:  # truncated leaf box -> the stages' per-row error
        raise ValueError(f"truncated MP4 box: {exc}") from exc
    ts = out.get("timescale", 0)
    dur = out.get("duration_units", 0) / ts if ts else 0.0
    # pick the first track carrying video-shaped metadata
    video_trak = None
    for trak in out.get("traks", []):
        if trak.get("width") or trak.get("num_frames"):
            video_trak = trak
            break
    video_trak = video_trak or {}
    n = video_trak.get("num_frames", 0)
    mts = video_trak.get("media_timescale", 0)
    mdur = video_trak.get("media_duration", 0)
    fps = n * mts / mdur if (mts and mdur) else (n / dur if dur else 0.0)
    return Mp4Info(
        duration=dur,
        timescale=ts,
        width=video_trak.get("width", 0),
        height=video_trak.get("height", 0),
        num_frames=n,
        framerate=fps,
        video_codec=video_trak.get("codec"),
    )


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), fourcc) + payload


# units per frame at the media timescale (media_ts = framerate * 1000, so
# each frame's stts delta is an integer and parsed fps is exact for any
# rational framerate with millihertz precision)
_FRAME_DELTA = 1000


def _sample_entry(codec: bytes, width: int, height: int) -> bytes:
    """stsd box holding one visual sample entry of the given fourcc."""
    return _box(
        b"stsd",
        struct.pack(">B3xI", 0, 1)
        + _box(
            codec,
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + b"\x00" * 50,
        ),
    )


def _mux(
    num_frames: int,
    framerate: float,
    width: int,
    height: int,
    timescale: int,
    stbl: bytes,
    mdat: bytes,
) -> bytes:
    """Assemble ftyp + mdat + moov around a finished sample table — the
    header boxes (mvhd/tkhd/mdhd/hdlr/vmhd) shared by both writers."""
    media_ts = int(round(framerate * 1000))
    media_dur = num_frames * _FRAME_DELTA
    dur_units = int(round(num_frames / framerate * timescale)) if framerate else 0
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, dur_units)
        + struct.pack(">IH2x8x36xI24x", 0x00010000, 0x0100, 2),  # rate/volume/matrix pad/next_track
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3xIIII4x", 7, 0, 0, 1, dur_units)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + b"\x00" * 36
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, media_ts, media_dur, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3xI4s12x", 0, 0, b"vide") + b"video\x00")
    minf = _box(b"minf", _box(b"vmhd", struct.pack(">B3xHHHH", 0, 1, 0, 0, 0)) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return _FTYP + mdat + moov


_FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")


def write_minimal_mp4(
    num_frames: int,
    framerate: float,
    width: int,
    height: int,
    codec: bytes = b"avc1",
    timescale: int = 600,
) -> bytes:
    """Structurally valid MP4 with correct metadata and no codec payload."""
    stbl = _box(
        b"stbl",
        _sample_entry(codec, width, height)
        + _box(b"stts", struct.pack(">B3xIII", 0, 1, num_frames, _FRAME_DELTA))
        + _box(b"stsc", struct.pack(">B3xI", 0, 0))
        + _box(b"stsz", struct.pack(">B3xII", 0, 0, 0))
        + _box(b"stco", struct.pack(">B3xI", 0, 0)),
    )
    return _mux(num_frames, framerate, width, height, timescale, stbl, _box(b"mdat", b""))


def write_mjpeg_mp4(
    frames: list[bytes],
    framerate: float,
    width: int,
    height: int,
    timescale: int = 600,
) -> bytes:
    """MP4 carrying a Motion-JPEG video track: each sample is one complete
    JFIF stream (sample entry fourcc ``jpeg``, ISO 14496-12's pre-AVC
    RFC-2435-style layout), all samples in a single chunk inside ``mdat``.

    Gives the sandbox a real end-to-end pixel path: the repo's own T.81
    JPEG codec (``functions/jpeg.py``) encodes frames, this writer muxes
    them, :func:`mp4_sample_ranges` demuxes them, and the video clip
    stages decode real pixels — no ffmpeg. The box layout mirrors
    :func:`write_minimal_mp4` with real stsz/stsc/stco tables.
    """
    num_frames = len(frames)
    mdat = _box(b"mdat", b"".join(frames))
    mdat_payload_off = len(_FTYP) + 8  # moov follows mdat, so this is stable
    stbl = _box(
        b"stbl",
        _sample_entry(b"jpeg", width, height)
        + _box(b"stts", struct.pack(">B3xIII", 0, 1, num_frames, _FRAME_DELTA))
        + _box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, num_frames, 1))
        + _box(
            b"stsz",
            struct.pack(">B3xII", 0, 0, num_frames)
            + struct.pack(f">{num_frames}I", *[len(f) for f in frames]),
        )
        + _box(b"stco", struct.pack(">B3xII", 0, 1, mdat_payload_off)),
    )
    return _mux(num_frames, framerate, width, height, timescale, stbl, mdat)
