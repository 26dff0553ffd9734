"""Baseline JPEG codec (functions/jpeg.py): round-trip + format conformance.

Validates BASELINE.md's lossy-survivor invariant (PSNR >= 40 dB) and the
decode-stage contract that round 1 stubbed out (VERDICT.md coverage row 8).
"""

import numpy as np
import pytest

from curator_ray.functions.jpeg import decode_jpeg, encode_jpeg
from curator_ray.functions.png import psnr


def _smooth_image(h=48, w=40, seed=3):
    """Natural-image stand-in: smooth gradients + a few soft shapes."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            120 + 80 * np.sin(yy / 17.0) + 40 * np.cos(xx / 23.0),
            100 + 60 * np.cos((xx + yy) / 19.0),
            140 + 50 * np.sin(xx / 13.0) * np.cos(yy / 29.0),
        ],
        axis=-1,
    )
    base += rng.normal(scale=2.0, size=base.shape)  # mild sensor-ish noise
    return np.clip(base, 0, 255).astype(np.uint8)


def test_roundtrip_psnr_q95():
    img = _smooth_image()
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert psnr(img, out) >= 40.0


def test_roundtrip_flat_color_near_exact():
    img = np.full((16, 16, 3), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(out.astype(int) - 77).max() <= 2


def test_roundtrip_odd_dimensions():
    img = _smooth_image(h=33, w=31)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (33, 31, 3)
    assert psnr(img, out) >= 35.0


def test_grayscale_roundtrip():
    img = _smooth_image()[:, :, 0]
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (img.shape[0], img.shape[1], 3)
    assert psnr(np.stack([img] * 3, axis=-1), out) >= 40.0


def test_quality_controls_size_and_fidelity():
    img = _smooth_image(h=64, w=64)
    lo, hi = encode_jpeg(img, quality=30), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert psnr(img, decode_jpeg(lo)) < psnr(img, decode_jpeg(hi))


def test_magnitude_extremes_survive():
    """Hard-edge checkerboard exercises long AC runs, ZRL and large coeffs."""
    img = (np.indices((24, 24)).sum(axis=0) % 2 * 255).astype(np.uint8)
    img = np.stack([img, 255 - img, img], axis=-1)
    out = decode_jpeg(encode_jpeg(img, quality=97))
    assert out.shape == img.shape  # fidelity is low at Nyquist; decode must not error


def test_progressive_rejected():
    img = _smooth_image(h=16, w=16)
    data = bytearray(encode_jpeg(img, quality=90))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")


def test_decode_stage_handles_jpeg(ray_session):
    import pyarrow as pa
    import ray

    from curator_ray.stages.image import decode_stage

    imgs = [_smooth_image(h=16, w=16, seed=s) for s in range(4)]
    tbl = pa.table(
        {
            "image_id": pa.array([f"im{i}" for i in range(4)]),
            "bytes": pa.array([encode_jpeg(im, quality=95) for im in imgs], pa.binary()),
            "w": pa.array([16] * 4, pa.int32()),
            "h": pa.array([16] * 4, pa.int32()),
            "fmt": pa.array(["jpeg"] * 4),
        }
    )
    out = decode_stage(ray.data.from_arrow(tbl)).take_all()
    assert len(out) == 4
    for row, im in zip(sorted(out, key=lambda r: r["image_id"]), imgs):
        got = np.asarray(row["pixels"], dtype=np.uint8).reshape(16, 16, 3)
        assert psnr(im, got) >= 40.0


def test_corrupt_stream_raises_valueerror_not_keyerror():
    """Any malformed payload must surface as ValueError (the per-row error
    the decode stages catch), never a raw KeyError/IndexError from a bogus
    table id or truncated segment."""
    import numpy as np

    from curator_ray.functions.jpeg import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.zeros((16, 16, 3), np.uint8))
    # zero out 40 bytes right after SOI: wipes the DQT/DHT headers the scan
    # later references (previously escaped as KeyError from qts[tq])
    bad = good[:8] + b"\x00" * 40 + good[48:]
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bad)
    # truncate at every depth: ValueError / NotImplementedError only
    for cut in range(1, len(good), 37):
        try:
            decode_jpeg(good[:cut])
        except (ValueError, NotImplementedError):
            pass
