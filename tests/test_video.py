"""Video family: MP4 metadata, fixed-stride clipping, motion scoring."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.functions.mp4 import mp4_info, write_minimal_mp4
from curator_ray.stages.video import motion_scores, paint_flowfield


# ------------------------------------------------------------- MP4 codec


def test_mp4_metadata_roundtrip():
    b = write_minimal_mp4(300, 30.0, 1280, 720)
    info = mp4_info(b)
    assert info.num_frames == 300
    assert info.framerate == pytest.approx(30.0)
    assert (info.width, info.height) == (1280, 720)
    assert info.duration == pytest.approx(10.0)
    assert info.video_codec == "avc1"


def test_mp4_fractional_framerate_and_codec():
    info = mp4_info(write_minimal_mp4(725, 23.976, 640, 480, codec=b"hev1"))
    assert info.framerate == pytest.approx(23.976)
    assert info.num_frames == 725
    assert info.video_codec == "hev1"


def test_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        mp4_info(b"RIFFxxxxWAVE")  # valid header of the *wrong* container
    with pytest.raises(ValueError):
        mp4_info(b"\x00" * 64)


# ---------------------------------------------------------- motion math


def test_flowfield_uniform_translation_analytic():
    h = w = 256
    gx, gy = np.meshgrid(np.arange(8, w, 16), np.arange(8, h, 16))
    centers = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    mv = np.zeros((len(centers), 10))
    mv[:, 0] = mv[:, 1] = 16
    mv[:, 4:6] = centers
    mv[:, 7], mv[:, 8] = -3.0, -4.0  # delta = -motion/scale = (3, 4)
    mv[:, 9] = 1.0
    flow = np.zeros((h, w, 2))
    paint_flowfield(mv, h, w, flow)
    # full 16x16 coverage: every pixel painted with (3, 4)
    assert np.all(flow[..., 0] == 3.0) and np.all(flow[..., 1] == 4.0)
    gm, pm = motion_scores([mv], h, w)
    assert gm == pytest.approx(5.0 / (h + w))  # |(3,4)| / (h+w)
    assert pm == pytest.approx(5.0 / (h + w))


def test_motion_scores_zero_and_min_resolution():
    h = w = 256
    gm, pm = motion_scores([np.zeros((0, 10))], h, w)
    assert gm == 0.0 and pm == 0.0
    with pytest.raises(ValueError):
        motion_scores([], 100, 256)


def test_flowfield_clamps_out_of_range():
    h = w = 256
    mv = np.zeros((1, 10))
    mv[0, 0] = mv[0, 1] = 16
    mv[0, 4:6] = (2.0, 2.0)  # rect extends past the top-left corner
    mv[0, 7:9] = -1.0
    mv[0, 9] = 1.0
    flow = np.zeros((h, w, 2))
    paint_flowfield(mv, h, w, flow)  # must not raise / wrap around
    assert flow[0, 0, 0] == 1.0 and flow[255, 255, 0] == 0.0


# ----------------------------------------------------------- Ray stages


@pytest.mark.usefixtures("ray_session")
def test_metadata_and_clipping_pipeline():
    import ray

    from curator_ray.stages.video import (
        clip_frame_indices_stage,
        fixed_stride_clip_stage,
        video_metadata_stage,
    )

    rows = pa.table(
        {
            "video_id": ["v1", "v2", "bad"],
            "video": [
                write_minimal_mp4(300, 30.0, 640, 360),  # 10 s
                write_minimal_mp4(90, 30.0, 640, 360),  # 3 s
                b"not an mp4",
            ],
        }
    )
    meta = video_metadata_stage(ray.data.from_arrow(rows))
    md = meta.to_pandas().set_index("video_id")
    assert md.loc["v1", "duration"] == pytest.approx(10.0)
    assert md.loc["v1", "num_frames"] == 300
    assert md.loc["bad", "errors"] == "metadata"

    clips = fixed_stride_clip_stage(
        meta, clip_len_s=4.0, clip_stride_s=3.0, min_clip_length_s=2.0
    )
    cf = clip_frame_indices_stage(clips, target_fps=2.0).to_pandas()
    v1 = cf[cf.video_id == "v1"].sort_values("span_start")
    # starts 0,3,6,9 -> spans (0,4),(3,7),(6,10),(9,10 dropped: 1s < min 2s)
    assert list(v1.span_start) == [0.0, 3.0, 6.0]
    assert list(v1.span_end) == [4.0, 7.0, 10.0]
    assert list(v1.clip_id)[0] == "v1_0_120"
    # 2 fps over a 4 s clip -> 8 sampled frames
    assert len(v1.iloc[0].frame_indices) == 8
    v2 = cf[cf.video_id == "v2"]
    assert list(v2.span_start) == [0.0]  # start 3.0 >= duration, dropped
    assert "bad" not in set(cf.video_id)  # metadata gate skips it

    # limit_clips caps per video like the reference
    lim = fixed_stride_clip_stage(
        meta, clip_len_s=4.0, clip_stride_s=3.0, min_clip_length_s=2.0, limit_clips=2
    ).to_pandas()
    assert (lim.groupby("video_id").size() <= 2).all()


@pytest.mark.usefixtures("ray_session")
def test_motion_filter_pipeline():
    import ray

    from curator_ray.stages.video import (
        derive_motion_corpus,
        motion_filter_stage,
        motion_score_stage,
    )

    docs = pa.table({"doc_id": [f"c{i}" for i in range(16)]})
    corpus = derive_motion_corpus(ray.data.from_arrow(docs))
    scored = motion_score_stage(corpus, concurrency=(1, 2)).to_pandas()
    moving = scored[~scored.static]
    static = scored[scored.static]
    assert len(moving) > 0 and len(static) > 0
    assert (static.motion_score_global_mean == 0.0).all()
    # uniform translation with full block coverage: gm = |delta| / (h + w)
    for _, r in moving.iterrows():
        assert r.motion_score_global_mean > 0.00098  # above the filter default
    kept = motion_filter_stage(
        motion_score_stage(derive_motion_corpus(ray.data.from_arrow(docs)), concurrency=(1, 2))
    ).to_pandas()
    assert set(kept.clip_id) == set(moving.clip_id)


def test_decode_motion_vectors_gated():
    from curator_ray.stages.video import decode_motion_vectors

    # PyAV is absent in this sandbox: the gate must raise an informative
    # ImportError (with the package present the real decode path runs)
    with pytest.raises(ImportError, match="mv_frames"):
        decode_motion_vectors(b"")


# ------------------------------------------------- MJPEG frame extraction


def test_mjpeg_mux_demux_lossless():
    from curator_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from curator_ray.functions.mp4 import mp4_sample_ranges, write_mjpeg_mp4

    planted = []
    frames = []
    for i in range(7):
        px = np.full((64, 64, 3), (10 * i + 5, 250 - 20 * i, 13 * i), np.uint8)
        planted.append(px)
        frames.append(encode_jpeg(px, quality=90))
    b = write_mjpeg_mp4(frames, 24.0, 64, 64)
    info = mp4_info(b)
    assert (info.num_frames, info.video_codec) == (7, "jpeg")
    assert info.framerate == pytest.approx(24.0)
    ranges = mp4_sample_ranges(b)
    assert len(ranges) == 7
    for (off, sz), want in zip(ranges, planted):
        got = decode_jpeg(b[off : off + sz])
        assert (got == want).all()  # solid frames decode losslessly (PSNR inf)
    # the sample table must reproduce the exact encoded streams
    assert [b[o : o + s] for o, s in ranges] == frames
    with pytest.raises(ValueError):
        mp4_sample_ranges(write_minimal_mp4(10, 30.0, 64, 64))  # no samples


@pytest.mark.usefixtures("ray_session")
def test_clip_frame_extraction_pipeline():
    import ray

    from curator_ray.stages.video import (
        ClipFrameExtraction,
        clip_frame_extraction_stage,
        derive_mjpeg_video_table,
        fixed_stride_clip_stage,
        mjpeg_clip_remux_stage,
        planted_frame_color,
        video_metadata_stage,
    )

    docs = pa.table(
        {"doc_id": ["a", "b", "c"], "text": ["hello world", "x" * 25, "y" * 7]}
    )
    vids = video_metadata_stage(derive_mjpeg_video_table(ray.data.from_arrow(docs)))
    clips = fixed_stride_clip_stage(
        vids,
        clip_len_s=0.2,
        clip_stride_s=0.2,
        carry_fields=("video", "seed"),
    )
    bufs = mjpeg_clip_remux_stage(clips)
    out = clip_frame_extraction_stage(
        bufs,
        extraction_policies=("sequence", "first", "middle", "last"),
        target_fps=(30.0,),
        concurrency=(1, 2),
    )
    rows = out.take_all()
    assert rows, "no clip rows"
    by_sig: dict[str, int] = {}
    for row in rows:
        assert row["errors"] is None
        sig = row["frame_signature"]
        by_sig[sig] = by_sig.get(sig, 0) + 1
        h, w = row["frame_height"], row["frame_width"]
        n_clip = row["end_frame"] - row["start_frame"]
        if sig.startswith("FrameExtractionPolicy.sequence"):
            assert row["frame_count"] == n_clip  # 30 fps on a 30 fps track
        else:
            assert row["frame_count"] == 1
        for k, fb in enumerate(row["frames"]):
            px = np.frombuffer(fb, np.uint8).reshape(h, w, 3)
            if sig.startswith("FrameExtractionPolicy.middle"):
                fi = row["start_frame"] + n_clip // 2
            elif sig.startswith("FrameExtractionPolicy.last"):
                fi = row["end_frame"] - 1
            else:
                fi = row["start_frame"] + k
            want = planted_frame_color(row["seed"], fi)
            assert (px == np.array(want, np.uint8)).all(), (row["clip_id"], sig, k)
    assert len(by_sig) == 4  # one row per (clip, policy) signature
    assert len(set(by_sig.values())) == 1

    # signature string parity + policy validation
    assert "FrameExtractionPolicy.sequence-30000" in by_sig
    with pytest.raises(ValueError, match="policy"):
        ClipFrameExtraction(extraction_policies=("bogus",))


@pytest.mark.usefixtures("ray_session")
def test_clip_frame_extraction_lcm_and_target_res():
    import ray

    from curator_ray.functions.jpeg import encode_jpeg
    from curator_ray.functions.mp4 import write_mjpeg_mp4
    from curator_ray.stages.video import clip_frame_extraction_stage

    # 12 frames at 12 fps; target fps {2, 3} -> decode once at LCM 6,
    # stride-slice to 3 and 2 frames
    frames = [
        encode_jpeg(np.full((32, 32, 3), (i, i, i), np.uint8)) for i in range(12)
    ]
    buf = write_mjpeg_mp4(frames, 12.0, 32, 32)
    ds = ray.data.from_arrow(pa.table({"clip_id": ["c"], "clip_buffer": [buf]}))
    rows = clip_frame_extraction_stage(
        ds, target_fps=(2.0, 3.0), concurrency=(1, 1)
    ).take_all()
    got = {r["frame_signature"]: r["frame_count"] for r in rows}
    # 1 s of video: 2 fps samples t={0, .5} -> 2 frames; 3 fps -> 3 frames
    assert got == {
        "FrameExtractionPolicy.sequence-2000": 2,
        "FrameExtractionPolicy.sequence-3000": 3,
    }

    # target_res block-mean downsample: 32x32 -> 16x16
    small = clip_frame_extraction_stage(
        ds, target_fps=(12.0,), target_res=(16, 16), concurrency=(1, 1)
    ).take_all()
    assert small[0]["frame_height"] == 16 and small[0]["frame_width"] == 16
    px = np.frombuffer(small[0]["frames"][0], np.uint8).reshape(16, 16, 3)
    assert (px == 0).all()  # frame 0 is solid black at any resolution

    # empty buffer -> reference-style error row
    empty = ray.data.from_arrow(
        pa.table({"clip_id": ["e"], "clip_buffer": pa.array([b""], pa.binary())})
    )
    err = clip_frame_extraction_stage(empty, concurrency=(1, 1)).take_all()
    assert err[0]["errors"] == "empty" and err[0]["frames"] is None


# ------------------------------------------------- corrupt-input hardening


def test_mp4_corrupt_sample_tables_raise_valueerror():
    """Truncated or count-corrupted sample tables must surface as ValueError
    (the error the stages catch per row), never struct.error or a huge
    bogus-count allocation."""
    from curator_ray.functions.jpeg import encode_jpeg
    from curator_ray.functions.mp4 import mp4_sample_ranges, write_mjpeg_mp4

    frames = [encode_jpeg(np.zeros((16, 16, 3), np.uint8))] * 3
    good = write_mjpeg_mp4(frames, 10.0, 16, 16)

    # corrupt the stsz entry count (payload: ver/flags, sample_size, count)
    i = good.index(b"stsz")
    bad = bytearray(good)
    bad[i + 12 : i + 16] = (0x00FFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError):
        mp4_info(bytes(bad))

    # truncation at any depth: either parses to a shorter table or raises
    # ValueError — never an uncaught struct.error
    for cut in range(1, 60):
        try:
            mp4_info(good[:-cut])
            mp4_sample_ranges(good[:-cut])
        except ValueError:
            pass


@pytest.mark.usefixtures("ray_session")
def test_remux_and_extraction_error_rows():
    """Per-row failures become error rows (reference per-clip error dict):
    spans past the sample table -> no_frames; remux labels survive
    extraction; an undecodable JPEG payload -> video_decode_failed without
    killing the batch."""
    import ray

    from curator_ray.functions.jpeg import encode_jpeg
    from curator_ray.functions.mp4 import write_mjpeg_mp4
    from curator_ray.stages.video import (
        clip_frame_extraction_stage,
        mjpeg_clip_remux_stage,
    )

    ok_buf = write_mjpeg_mp4(
        [encode_jpeg(np.zeros((16, 16, 3), np.uint8))] * 3, 10.0, 16, 16
    )
    junk_buf = write_mjpeg_mp4([b"\xff\xd8 not a jpeg stream"], 10.0, 16, 16)
    clips = pa.table(
        {
            "clip_id": ["good", "past_end", "trunc"],
            "video_id": ["va", "va", "vb"],
            "start_frame": pa.array([0, 5, 0], pa.int64()),
            "end_frame": pa.array([2, 8, 2], pa.int64()),
            "video": pa.array([ok_buf, ok_buf, ok_buf[:-20]], pa.binary()),
        }
    )
    out = {
        r["clip_id"]: r
        for r in mjpeg_clip_remux_stage(ray.data.from_arrow(clips)).take_all()
    }
    assert out["good"]["errors"] is None and out["good"]["clip_buffer"]
    assert out["past_end"]["errors"] == "no_frames"
    assert out["past_end"]["clip_buffer"] is None
    assert out["trunc"]["errors"] in ("metadata", "codec")

    # extraction keeps the remux label for null buffers, emits
    # video_decode_failed for the junk payload, and the batch survives
    rows = pa.table(
        {
            "clip_id": ["g", "j", "n"],
            "clip_buffer": pa.array([ok_buf, junk_buf, None], pa.binary()),
            "errors": pa.array([None, None, "no_frames"], pa.string()),
        }
    )
    got = {
        r["clip_id"]: r
        for r in clip_frame_extraction_stage(
            ray.data.from_arrow(rows), target_fps=(10.0,), concurrency=(1, 1)
        ).take_all()
    }
    assert got["g"]["errors"] is None and got["g"]["frame_count"] == 3
    assert got["j"]["errors"] == "video_decode_failed" and got["j"]["frames"] is None
    assert got["n"]["errors"] == "no_frames"


def test_parse_diar_segments_skips_malformed():
    from curator_ray.stages.audio import parse_diar_segments

    segs = parse_diar_segments(["1.0", "", "0.5 2.0 spk1", "3.0 4.0"])
    assert segs == [
        {"start": 0.5, "end": 2.0, "speaker": "spk1"},
        {"start": 3.0, "end": 4.0, "speaker": "unknown"},
    ]
