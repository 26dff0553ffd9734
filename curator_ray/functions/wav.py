"""Pure-numpy RIFF/WAVE codec: header parse, PCM decode, PCM16 encode.

The reference's audio stack reads files through ``soundfile`` / ``librosa``
(``reference/nemo_curator/stages/audio/common.py:33-41`` —
``soundfile.info(path).frames / samplerate``; ``metrics/bandwidth.py:130``
``librosa.load``). Neither package ships in this sandbox, and the engine's
multimodal model keeps audio as opaque ``binary`` columns anyway (FIXTURES.md
F1 discipline: payload bytes ride beside typed metadata), so this module
implements the one container format every ASR corpus uses — RIFF/WAVE with
integer or float PCM — from the public specification (RIFF 1991 / WAVE
format registry; also mirrored by CPython's ``wave`` module, which only
handles integer PCM and no float32, hence the from-scratch decoder).

Scale notes: ``wav_info`` touches only the chunk headers (O(#chunks), no
sample decode) so a duration scan over 10^12 rows reads ~44 bytes per value;
``decode_wav`` returns float32 in [-1, 1] like ``librosa.load(sr=None)``.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np


class WavInfo(NamedTuple):
    sample_rate: int
    frames: int
    channels: int
    bits: int
    fmt: int  # 1 = integer PCM, 3 = IEEE float

    @property
    def duration(self) -> float:
        return self.frames / self.sample_rate if self.sample_rate else 0.0


def _iter_chunks(b: bytes):
    """Yield (fourcc, offset, size) for each top-level RIFF sub-chunk."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(b):
        cc = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def wav_info(b: bytes) -> WavInfo:
    """Parse container metadata without touching the sample data.

    Mirrors ``soundfile.info`` for the fields the reference uses
    (``frames``, ``samplerate`` -> duration).
    """
    fmt = None
    data_size = None
    for cc, off, size in _iter_chunks(b):
        if cc == b"fmt " and size >= 16:
            tag, ch, rate, _br, block, bits = struct.unpack_from("<HHIIHH", b, off)
            if tag == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE: real tag
                (tag,) = struct.unpack_from("<H", b, off + 24)  # in the GUID head
            fmt = (tag, ch, rate, block, bits)
        elif cc == b"data":
            data_size = min(size, len(b) - off)
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, block, bits = fmt
    bytes_per_frame = block or (ch * max(bits, 8) // 8)
    frames = data_size // bytes_per_frame if bytes_per_frame else 0
    return WavInfo(rate, frames, ch, bits, tag)


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Decode to mono float32 in [-1, 1] (channels averaged), like
    ``librosa.load(path, sr=None, mono=True)``.

    Supports PCM u8 / i16 / i24 / i32 and IEEE float32/float64.
    """
    info = wav_info(b)
    raw = None
    for cc, off, size in _iter_chunks(b):
        if cc == b"data":
            raw = b[off : off + min(size, len(b) - off)]
            break
    assert raw is not None  # wav_info already validated
    if info.fmt not in (1, 3):
        # ALAW (6), MULAW (7), ADPCM, … — decoding them via the integer-PCM
        # branches would yield garbage samples; refuse instead.
        raise ValueError(f"unsupported WAV format tag: {info.fmt} (only PCM=1 and IEEE float=3)")
    if info.fmt == 3:  # IEEE float
        dt = np.float32 if info.bits == 32 else np.float64
        x = np.frombuffer(raw, dtype="<" + np.dtype(dt).char).astype(np.float32)
    elif info.bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif info.bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif info.bits == 24:
        u = np.frombuffer(raw, dtype=np.uint8)
        u = u[: (len(u) // 3) * 3].reshape(-1, 3).astype(np.uint32)
        v = (u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)).astype(np.int32)
        v = (v << 8) >> 8  # sign-extend 24 -> 32
        x = v.astype(np.float32) / 8388608.0
    elif info.bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM width: {info.bits}")
    if info.channels > 1:
        x = x[: (len(x) // info.channels) * info.channels]
        x = x.reshape(-1, info.channels).mean(axis=1)
    return x, info.sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono float (clipped to [-1, 1]) or int16 samples as PCM16 WAV."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = np.round(samples * 32767.0).astype("<i2")
    else:
        samples = samples.astype("<i2", copy=False)
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data
