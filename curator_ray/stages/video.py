"""Video curation stages: metadata, fixed-stride clipping, motion filter.

Ray-Data-native re-expression of the CPU-computable core of the reference
video stack (``reference/nemo_curator/stages/video/``):

- ``VideoReaderStage`` metadata extraction (``io/video_reader.py:31-228``,
  ffprobe) -> :func:`video_metadata_stage` parses the ISO BMFF box tree
  from the ``binary`` video column (``functions/mp4.py``, header-only);
- ``FixedStrideExtractorStage`` (``clipping/clip_extraction_stages.py:350-420``)
  -> :func:`fixed_stride_clip_stage`: explode each video row into clip rows
  with the reference's bound semantics (start < duration; keep clips with
  ``end - start >= min_clip_length_s``; optional per-video limit) and its
  deterministic clip identity (``{video}_{start_frame}_{end_frame}``,
  uuid5-equivalent content-derived id);
- ``MotionVectorDecodeStage`` + ``MotionFilterStage``
  (``filtering/motion_filter.py:27-170``, ``motion_vector_backend.py``):
  decoding motion vectors out of H.264/HEVC needs PyAV (absent) and is
  gated; the *scoring* math — flow-field painting from per-block motion
  vectors, magnitude normalization by (h + w), ``global_mean`` and
  ``per_patch_min_256`` small-motion test — is implemented for real in
  numpy over a nested Arrow motion-vector column
  (:func:`motion_score_stage`, :func:`motion_filter_stage`);
- ``ClipFrameExtractionStage`` (``clipping/clip_frame_extraction.py``):
  the frame-index policy (uniform sampling at target fps) is real
  (:func:`clip_frame_indices_stage`); pixel decode needs a codec and is
  gated like the reference's DALI path;
- ``ClipWriterStage`` (``io/clip_writer.py``) -> clips are rows; the
  engine's parquet/webdataset writers persist them (no special stage);
- ``ClipTranscodingStage`` / TransNetV2 / caption+embedding stages are
  ffmpeg- or model-bound and stay gated (same policy as vLLM/Lance).

Data model: one video row = ``(video_id, video:binary, ...)``; clips are
exploded rows ``(clip_id, video_id, span_start, span_end, ...)`` — the
columnar analogue of the reference's ``Video.clips`` list. Motion vectors
ride as ``mv_frames: large_list<large_list<float64>>`` (frames x flattened
(n_vectors, 10) rows, the 10 post-``source`` AVMotionVector fields).

Scale: metadata parse touches box headers only; clipping is arithmetic;
motion scoring is O(painted pixels) per frame in numpy — all inside
``map_batches`` with zero wide operations.
"""

from __future__ import annotations

import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.mp4 import (
    mp4_info,
    mp4_sample_ranges,
    write_minimal_mp4,
    write_mjpeg_mp4,
)

_MIN_SIDE_RESOLUTION = 256  # motion_vector_backend.py:28

# ---------------------------------------------------------------- metadata


def video_metadata_stage(ds, video_field: str = "video"):
    """Append ``duration, framerate, num_frames, width, height, video_codec``
    parsed from MP4 container bytes; unparseable rows get nulls + an
    ``errors`` marker like the reference's metadata gate
    (``video_reader.py:179-186``)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        dur = np.full(n, np.nan)
        fps = np.full(n, np.nan)
        frames = np.zeros(n, np.int64)
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        codec: list[str | None] = [None] * n
        err: list[str | None] = [None] * n
        for i, blob in enumerate(batch.column(video_field)):
            b = blob.as_py()
            if not b:
                err[i] = "empty"
                continue
            try:
                info = mp4_info(b)
            except Exception:
                err[i] = "metadata"
                continue
            dur[i], fps[i], frames[i] = info.duration, info.framerate, info.num_frames
            w[i], h[i], codec[i] = info.width, info.height, info.video_codec
        return (
            batch.append_column("duration", pa.array(dur, pa.float64()))
            .append_column("framerate", pa.array(fps, pa.float64()))
            .append_column("num_frames", pa.array(frames, pa.int64()))
            .append_column("width", pa.array(w, pa.int32()))
            .append_column("height", pa.array(h, pa.int32()))
            .append_column("video_codec", pa.array(codec, pa.string()))
            .append_column("errors", pa.array(err, pa.string()))
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- clipping


def fixed_stride_clip_stage(
    ds,
    clip_len_s: float,
    clip_stride_s: float,
    min_clip_length_s: float = 0.0,
    limit_clips: int = 0,
    id_field: str = "video_id",
    carry_fields: tuple[str, ...] = (),
):
    """Explode videos into fixed-stride clip rows (reference
    ``FixedStrideExtractorStage.process``, ``clip_extraction_stages.py:
    390-420``): bounds ``[i*stride, min(i*stride + len, duration))`` for
    every start strictly inside the video, keeping clips at least
    ``min_clip_length_s`` long.

    ``limit_clips`` is a DELIBERATE REINTERPRETATION for the columnar model:
    the reference uses it only to skip videos whose ``video.clips`` list
    already holds >= limit entries (a re-run guard against its mutable task
    objects, ``clip_extraction_stages.py:380-382``) and otherwise emits every
    bound. Columnar rows carry no pre-existing clip list, so that guard is
    vacuous here; instead ``limit_clips > 0`` caps the clips *emitted* per
    video, which is the useful analogue (and a no-op at the reference's
    default ``limit_clips=0``).

    ``clip_id`` is the reference's deterministic identity string
    ``{video}_{start_frame}_{end_frame}`` (frame indices at the parsed
    framerate); ``clip_uuid`` is its uuid5 like the reference's
    ``uuid.uuid5(NAMESPACE_URL, ...)``.

    Start positions are ``i * stride`` (closed form) rather than the
    reference's repeated ``+=`` float accumulation — identical except for
    sub-ulp drift after tens of thousands of strides, and exactly
    reproducible by a SQL ``range()`` oracle.

    ``carry_fields`` names source columns to repeat onto each emitted clip
    row (e.g. ``("video", "framerate")`` so a downstream remux/decode stage
    sees the bytes) — the columnar analogue of the reference clips keeping a
    pointer to their parent ``Video``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        vids = batch.column(id_field).cast(pa.string()).to_pylist()
        durs = batch.column("duration").to_numpy(zero_copy_only=False)
        fpss = batch.column("framerate").to_numpy(zero_copy_only=False)
        out_vid, out_cid, out_uuid = [], [], []
        out_s, out_e, out_sf, out_ef = [], [], [], []
        take_rows: list[int] = []  # source row per emitted clip (carry_fields)
        for row, (vid, dur, fps) in enumerate(zip(vids, durs, fpss)):
            if not np.isfinite(dur) or dur <= 0 or not np.isfinite(fps):
                continue  # reference skips rows with incomplete metadata
            n_starts = int(np.ceil(dur / clip_stride_s))
            count = 0
            for i in range(n_starts):
                start = i * clip_stride_s
                if start >= dur:
                    break
                end = min(start + clip_len_s, dur)
                if end - start < min_clip_length_s:
                    continue
                if limit_clips > 0 and count >= limit_clips:
                    break
                sf, ef = int(start * fps), int(end * fps)
                key = f"{vid}_{sf}_{ef}"
                out_vid.append(vid)
                out_cid.append(key)
                out_uuid.append(str(uuid.uuid5(uuid.NAMESPACE_URL, key)))
                out_s.append(start)
                out_e.append(end)
                out_sf.append(sf)
                out_ef.append(ef)
                take_rows.append(row)
                count += 1
        out = pa.table(
            {
                "clip_id": pa.array(out_cid, pa.string()),
                "clip_uuid": pa.array(out_uuid, pa.string()),
                "video_id": pa.array(out_vid, pa.string()),
                "span_start": pa.array(out_s, pa.float64()),
                "span_end": pa.array(out_e, pa.float64()),
                "start_frame": pa.array(out_sf, pa.int64()),
                "end_frame": pa.array(out_ef, pa.int64()),
            }
        )
        idx = pa.array(take_rows, pa.int64())
        for name in carry_fields:
            out = out.append_column(name, batch.column(name).take(idx))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def clip_frame_indices_stage(ds, target_fps: float = 2.0):
    """Frame indices each clip would sample at ``target_fps`` (reference
    ``ClipFrameExtractionStage`` policy; the pixel decode itself is
    codec-bound and gated — see module docstring)."""

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column("span_start").to_numpy(zero_copy_only=False)
        e = batch.column("span_end").to_numpy(zero_copy_only=False)
        fps = batch.column("framerate").to_numpy(zero_copy_only=False) if "framerate" in batch.schema.names else np.full(len(batch), 30.0)
        idx_lists = []
        for a, b, f in zip(s, e, fps):
            times = np.arange(a, b, 1.0 / target_fps)
            idx_lists.append((times * f).astype(np.int64))
        flat = np.concatenate(idx_lists) if idx_lists else np.zeros(0, np.int64)
        offsets = np.zeros(len(idx_lists) + 1, dtype=np.int32)
        np.cumsum([len(x) for x in idx_lists], out=offsets[1:])
        col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int64()))
        return batch.append_column("frame_indices", col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- clip buffers/frames


def mjpeg_clip_remux_stage(ds, video_field: str = "video", id_field: str = "video_id"):
    """Cut each clip's own standalone buffer out of its parent video by
    stream copy (reference ``ClipTranscodingStage``,
    ``clipping/clip_extraction_stages.py:28-250`` — ffmpeg-bound there, so
    its codecs stay gated; for MJPEG tracks a clip is just a sample-range
    remux, which this stage does losslessly with the repo's own muxer).

    Input rows: clips carrying ``start_frame/end_frame`` plus the parent
    ``video`` bytes (``fixed_stride_clip_stage(carry_fields=("video", ...))``).
    Output: ``clip_buffer`` (one self-contained MJPEG MP4 per clip) replaces
    the parent bytes; rows whose track is not MJPEG get a ``buffer`` error
    marker like the reference's per-clip error dict.

    Scale: sample ranges are header arithmetic; the only bytes moved are the
    clip's own frames (no decode, no re-encode — PSNR is exactly infinite
    vs the source frames, satisfying the lossless per-row invariant).
    """

    def fn(batch: pa.Table) -> pa.Table:
        sf = batch.column("start_frame").to_numpy(zero_copy_only=False)
        ef = batch.column("end_frame").to_numpy(zero_copy_only=False)
        # cheap parent-cache key: the id column when the clips carry one
        # (fixed_stride_clip_stage always emits video_id); falling back to
        # the bytes themselves costs an O(video size) memcmp per clip row
        ids = (
            batch.column(id_field).to_pylist()
            if id_field and id_field in batch.schema.names
            else None
        )
        bufs: list[bytes | None] = []
        errs: list[str | None] = []
        prev_key: object = None
        have_prev = False
        prev: tuple[list[tuple[int, int]], float, int, int] | None = None
        prev_err = "metadata"
        for i, blob in enumerate(batch.column(video_field)):
            b = blob.as_py()
            if not b:
                bufs.append(None)
                errs.append("empty")
                continue
            key = ids[i] if ids is not None else b
            if not have_prev or key != prev_key:  # consecutive clips share a parent
                try:
                    info = mp4_info(b)
                    if info.video_codec != "jpeg":
                        raise ValueError("not an MJPEG track")
                    prev = (mp4_sample_ranges(b), info.framerate, info.width, info.height)
                except ValueError as exc:
                    prev = None
                    prev_err = "codec" if "MJPEG" in str(exc) else "metadata"
                prev_key = key
                have_prev = True
            if prev is None:
                bufs.append(None)
                errs.append(prev_err)
                continue
            ranges, fps, w, h = prev
            lo, hi = int(sf[i]), min(int(ef[i]), len(ranges))
            if hi <= lo:
                # the clip's frame span lies past the sample table (e.g. stts
                # advertises more frames than stsz carries): error row, not a
                # 0-sample MP4 the extraction stage would choke on
                bufs.append(None)
                errs.append("no_frames")
                continue
            frames = [b[off : off + sz] for off, sz in ranges[lo:hi]]
            bufs.append(write_mjpeg_mp4(frames, fps, w, h))
            errs.append(None)
        out = batch.drop_columns([video_field])
        return out.append_column("clip_buffer", pa.array(bufs, pa.binary())).append_column(
            "errors", pa.array(errs, pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# frame-extraction policies (reference utils/decoder_utils.py:70-112)
_POLICIES = ("first", "middle", "last", "sequence")


def _downsample_block_mean(px: np.ndarray, target_res: tuple[int, int]) -> np.ndarray:
    """Integer-factor block-mean downsample (documented deviation: the
    reference resizes via decord/cv2 bilinear; block mean collapses the
    same region to one value — same detector semantics as motion_scores)."""
    th, tw = target_res
    if th <= 0 or tw <= 0:
        return px
    h, w = px.shape[:2]
    fh, fw = max(h // th, 1), max(w // tw, 1)
    ch, cw = (h // fh) * fh, (w // fw) * fw
    return (
        px[:ch, :cw]
        .reshape(ch // fh, fh, cw // fw, fw, px.shape[2])
        .mean(axis=(1, 3))
        .round()
        .astype(np.uint8)
    )


class ClipFrameExtraction:
    """Actor-pool map_batches: decode each clip's MJPEG buffer and emit one
    row per (clip, extraction_policy, target_fps) with the sampled frames
    as raw RGB bytes (reference ``ClipFrameExtractionStage``,
    ``clipping/clip_frame_extraction.py:34-140``; policy/signature
    semantics from ``utils/decoder_utils.py:70-112``).

    Parity points: the signature string is the reference's
    ``FrameExtractionSignature.to_str()`` (``FrameExtractionPolicy.<p>-<fps*1000>``);
    multiple integer target fps decode ONCE at their LCM and stride-slice
    per fps (the reference's decode-cost optimization); ``first/middle/last``
    pick the single frame the reference's policies name; empty buffers get
    the ``buffer: empty`` error row. Non-MJPEG codecs are decoder-bound
    (decord/DALI in the reference) and raise at setup — the gate for this
    sandbox, same policy as PyAV/vLLM.

    Output columns: ``frame_signature``, ``frames`` (large_list<large_binary>,
    one h*w*3 RGB buffer per sampled frame), ``frame_height``, ``frame_width``,
    ``frame_count``, ``errors``. Frames stay raw bytes (not nested lists) so
    a 10^12-row run moves them zero-copy; batch_size stays small because
    each row fans out to frames x pixels.
    """

    def __init__(
        self,
        extraction_policies: tuple[str, ...] = ("sequence",),
        target_fps: tuple[float, ...] = (2.0,),
        target_res: tuple[int, int] = (-1, -1),
        buffer_field: str = "clip_buffer",
    ):
        for p in extraction_policies:
            if p not in _POLICIES:
                raise ValueError(f"unknown extraction policy {p!r}; options {_POLICIES}")
        self.policies = extraction_policies
        self.target_fps = tuple(float(f) for f in target_fps)
        self.target_res = target_res
        self.buffer_field = buffer_field
        self.use_lcm = len(self.target_fps) > 1 and all(
            f.is_integer() for f in self.target_fps
        )

    def _decode(self, buf: bytes, sample_fps: float) -> tuple[list[np.ndarray], float]:
        info = mp4_info(buf)
        if info.video_codec != "jpeg":
            raise NotImplementedError(
                f"codec {info.video_codec!r} needs a decoder (decord/DALI in the "
                "reference); in-sandbox frame extraction supports MJPEG tracks"
            )
        from ..functions.jpeg import decode_jpeg

        ranges = mp4_sample_ranges(buf)
        fps = info.framerate or 30.0
        step = max(1, int(round(fps / sample_fps)))
        frames = []
        for off, sz in ranges[::step]:
            px = decode_jpeg(buf[off : off + sz])
            frames.append(_downsample_block_mean(px, self.target_res))
        return frames, fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = [n for n in batch.schema.names if n not in (self.buffer_field, "errors")]
        rows_idx: list[int] = []
        sig_col: list[str] = []
        frames_col: list[list[bytes] | None] = []
        fh_col: list[int] = []
        fw_col: list[int] = []
        fc_col: list[int] = []
        err_col: list[str | None] = []

        def emit(i: int, sig: str, frames: list[np.ndarray] | None, err: str | None):
            rows_idx.append(i)
            sig_col.append(sig)
            if frames is None:
                frames_col.append(None)
                fh_col.append(0)
                fw_col.append(0)
                fc_col.append(0)
            else:
                frames_col.append([f.tobytes() for f in frames])
                fh_col.append(frames[0].shape[0] if frames else 0)
                fw_col.append(frames[0].shape[1] if frames else 0)
                fc_col.append(len(frames))
            err_col.append(err)

        prior_errs = (
            batch.column("errors").to_pylist() if "errors" in batch.schema.names else None
        )
        for i, blob in enumerate(batch.column(self.buffer_field)):
            buf = blob.as_py()
            if not buf:
                # keep the remux stage's failure label (codec/metadata/
                # no_frames) instead of flattening every null buffer to
                # "empty" — the reference's per-clip error dict fidelity
                err0 = (prior_errs[i] if prior_errs else None) or "empty"
                for policy in self.policies:
                    for fps in self.target_fps:
                        emit(i, f"FrameExtractionPolicy.{policy}-{int(fps * 1000)}", None, err0)
                continue
            mark = len(rows_idx)  # rollback point if decode fails mid-row
            try:
                for policy in self.policies:
                    if policy == "sequence" and self.use_lcm:
                        import math

                        # decode ONCE at the fps LCM, stride-slice per target —
                        # the reference's decode-cost optimization, including
                        # its artifact: when the LCM does not divide the track
                        # fps the sampled indices differ from the per-fps path
                        # (clip_frame_extraction.py:86-108 slices the same way)
                        lcm = float(math.lcm(*[int(f) for f in self.target_fps]))
                        frames, _ = self._decode(buf, lcm)
                        for fps in self.target_fps:
                            emit(
                                i,
                                f"FrameExtractionPolicy.{policy}-{int(fps * 1000)}",
                                frames[:: int(lcm / fps)],
                                None,
                            )
                        continue
                    for fps in self.target_fps:
                        frames, _ = self._decode(buf, fps)
                        if policy == "first":
                            frames = frames[:1]
                        elif policy == "middle":
                            frames = frames[len(frames) // 2 : len(frames) // 2 + 1]
                        elif policy == "last":
                            frames = frames[-1:]
                        emit(i, f"FrameExtractionPolicy.{policy}-{int(fps * 1000)}", frames, None)
            except (ValueError, OSError, RuntimeError):
                # undecodable buffer -> error rows, batch survives (reference
                # clip_frame_extraction.py:124-129; NotImplementedError — the
                # non-MJPEG codec gate — still raises: that is a config error)
                for col in (rows_idx, sig_col, frames_col, fh_col, fw_col, fc_col, err_col):
                    del col[mark:]
                for policy in self.policies:
                    for fps in self.target_fps:
                        emit(
                            i,
                            f"FrameExtractionPolicy.{policy}-{int(fps * 1000)}",
                            None,
                            "video_decode_failed",
                        )

        idx = pa.array(rows_idx, pa.int64())
        out = batch.select(keep).take(idx)
        return (
            out.append_column("frame_signature", pa.array(sig_col, pa.string()))
            .append_column(
                "frames", pa.array(frames_col, pa.large_list(pa.large_binary()))
            )
            .append_column("frame_height", pa.array(fh_col, pa.int32()))
            .append_column("frame_width", pa.array(fw_col, pa.int32()))
            .append_column("frame_count", pa.array(fc_col, pa.int32()))
            .append_column("errors", pa.array(err_col, pa.string()))
        )


def clip_frame_extraction_stage(
    ds,
    extraction_policies: tuple[str, ...] = ("sequence",),
    target_fps: tuple[float, ...] = (2.0,),
    target_res: tuple[int, int] = (-1, -1),
    buffer_field: str = "clip_buffer",
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 32,
):
    return ds.map_batches(
        ClipFrameExtraction,
        fn_constructor_kwargs={
            "extraction_policies": extraction_policies,
            "target_fps": target_fps,
            "target_res": target_res,
            "buffer_field": buffer_field,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ---------------------------------------------------------------- motion

_BLOCK_OPTIONS = ((8, 8), (16, 16), (16, 8), (8, 16))  # motion_vector_backend.py:110


def paint_flowfield(mv: np.ndarray, h: int, w: int, flow: np.ndarray) -> None:
    """Paint per-block motion deltas into a (h, w, 2) flow image
    (numpy re-expression of ``motion_vectors_to_flowfield``,
    ``motion_vector_backend.py:81-163``): for each vector, the block rect
    centered at its destination is *assigned* ``-motion / motion_scale``
    (last write wins, block-size groups painted in the reference's order);
    out-of-range coordinates clamp to the frame like the reference's
    bounds handling."""
    if mv.size == 0:
        return
    bw, bh = mv[:, 0], mv[:, 1]
    dst = mv[:, 4:6]
    scale = np.where(mv[:, 9] == 0, 1.0, mv[:, 9])
    delta = -mv[:, 7:9] / scale[:, None]
    for opt_w, opt_h in _BLOCK_OPTIONS:
        sel = (bw == opt_w) & (bh == opt_h)
        if not sel.any():
            continue
        ox = np.arange(-opt_w // 2, opt_w // 2)
        oy = np.arange(-opt_h // 2, opt_h // 2)
        gx, gy = np.meshgrid(ox, oy, indexing="xy")
        xs = dst[sel, 0].astype(np.int64)[:, None] + gx.ravel()[None, :]
        ys = dst[sel, 1].astype(np.int64)[:, None] + gy.ravel()[None, :]
        np.clip(xs, 0, w - 1, out=xs)
        np.clip(ys, 0, h - 1, out=ys)
        d = np.repeat(delta[sel], gx.size, axis=0)
        flow[ys.ravel(), xs.ravel()] = d


def motion_scores(
    mv_frames: list[np.ndarray], h: int, w: int
) -> tuple[float, float]:
    """(global_mean, per_patch_min_256) over a clip's motion-vector frames
    (reference ``check_if_small_motion``, ``motion_vector_backend.py:
    248-306``): flow magnitude normalized by (h + w), averaged over all
    pixels x frames; the per-patch value is the minimum of the per-pixel
    time-average downsampled by 256x (block mean here vs the reference's
    bilinear ``cv2.resize`` — same detector semantics: both collapse a
    256x256 region to one value; documented deviation)."""
    if h < _MIN_SIDE_RESOLUTION or w < _MIN_SIDE_RESOLUTION:
        raise ValueError(f"min resolution {_MIN_SIDE_RESOLUTION}, got {(h, w)}")
    per_pixel_sum = np.zeros((h, w))
    global_sum = 0.0
    flow = np.zeros((h, w, 2))
    for mv in mv_frames:
        flow[:] = 0.0
        paint_flowfield(mv, h, w, flow)
        mag = np.hypot(flow[..., 0], flow[..., 1]) / (h + w)
        global_sum += float(mag.sum())
        per_pixel_sum += mag
    n = max(len(mv_frames), 1)
    global_mean = global_sum / (n * h * w)
    per_pixel_avg = per_pixel_sum / n
    th, tw = max(h // 256, 1), max(w // 256, 1)
    patch = per_pixel_avg[: th * 256, : tw * 256].reshape(th, 256, tw, 256).mean(axis=(1, 3))
    return global_mean, float(patch.min())


class MotionScoreStage:
    """Actor-pool map_batches: nested mv column -> motion score columns."""

    def __init__(self, mv_field: str = "mv_frames", height_field: str = "height", width_field: str = "width"):
        self.mv_field = mv_field
        self.height_field = height_field
        self.width_field = width_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        gm = np.zeros(len(batch))
        pm = np.zeros(len(batch))
        hs = batch.column(self.height_field).to_numpy(zero_copy_only=False)
        ws = batch.column(self.width_field).to_numpy(zero_copy_only=False)
        for i, frames in enumerate(batch.column(self.mv_field)):
            mv_frames = [
                np.asarray(f, dtype=np.float64).reshape(-1, 10) for f in frames.as_py()
            ]
            gm[i], pm[i] = motion_scores(mv_frames, int(hs[i]), int(ws[i]))
        return batch.append_column(
            "motion_score_global_mean", pa.array(gm, pa.float64())
        ).append_column("motion_score_per_patch_min_256", pa.array(pm, pa.float64()))


def motion_score_stage(ds, concurrency: tuple[int, int] = (1, 8), **kwargs):
    return ds.map_batches(
        MotionScoreStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks: an outer batch_size re-serializes the mp4 binary
        # column's full block buffer per slice (see image.decode_stage /
        # PERF.md round 5); per-task decoded-frame memory is bounded inside
        # the stage per row, and block size is bounded at the reader
    )


def motion_filter_stage(
    ds,
    global_mean_threshold: float = 0.00098,
    per_patch_min_256_threshold: float = 0.000001,
):
    """Drop small-motion clips (reference ``MotionFilterStage`` defaults,
    ``motion_filter.py:99-131``: small iff global mean OR per-patch min
    falls below its threshold)."""

    def fn(batch: pa.Table) -> pa.Table:
        small = pc.or_(
            pc.less(batch.column("motion_score_global_mean"), pa.scalar(global_mean_threshold)),
            pc.less(
                batch.column("motion_score_per_patch_min_256"),
                pa.scalar(per_patch_min_256_threshold),
            ),
        )
        return batch.filter(pc.invert(small))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def decode_motion_vectors(
    video_bytes: bytes,
    target_fps: float = 2.0,
    target_duration_ratio: float = 0.5,
) -> list[np.ndarray]:
    """Decode per-frame motion vectors from codec side data via PyAV's
    EXPORT_MVS flag (reference ``motion_vector_backend.py:165-245``):
    sample frames at ``target_fps`` over ``target_duration_ratio`` of the
    stream, returning one (n_vectors, 10) float array per sampled frame in
    the layout :func:`paint_flowfield` consumes. Gated on the ``av``
    package (absent in this sandbox, like Lance/vLLM); the in-sandbox path
    supplies ``mv_frames`` columns directly (see derive_motion_corpus)."""
    try:
        import av
    except ImportError as exc:
        raise ImportError(
            "PyAV is not installed in this environment; motion vectors must "
            "arrive as an 'mv_frames' column (see derive_motion_corpus), or "
            "install av in deployment for in-engine decode."
        ) from exc
    import io as _io

    out: list[np.ndarray] = []
    with av.open(_io.BytesIO(video_bytes), metadata_errors="ignore") as container:
        stream = container.streams.video[0]
        ctx = stream.codec_context
        ctx.flags2 |= av.codec.context.Flags2.EXPORT_MVS
        fps = float(stream.average_rate or stream.base_rate or 30)
        dur = float(stream.duration * stream.time_base) if stream.duration else 30.0
        max_frames = max(10, round(target_fps * dur * target_duration_ratio))
        step = max(1, round(fps / target_fps))
        for i, frame in enumerate(container.decode(video=0)):
            if i % step:
                continue
            if frame.height < _MIN_SIDE_RESOLUTION or frame.width < _MIN_SIDE_RESOLUTION:
                raise ValueError(
                    f"min resolution {_MIN_SIDE_RESOLUTION}, got {(frame.height, frame.width)}"
                )
            for sd in frame.side_data:
                if sd.type == av.sidedata.sidedata.Type.MOTION_VECTORS:
                    mv = np.asarray(sd.to_ndarray().tolist(), dtype=np.float64)
                    out.append(mv[:, 1:])  # drop the 'source' field -> 10 cols
                    break
            if len(out) >= max_frames:
                break
    return out


# ---------------------------------------------------------------- synthetic


def derive_video_table(
    ds,
    text_field: str = "text",
    id_field: str = "doc_id",
    framerate: float = 30.0,
):
    """Deterministic video-manifest table from a text corpus: per document
    a real (codec-payload-free) MP4 whose frame count follows the
    SQL-expressible rule ``(len(collapsed_text) % 240) + 30`` at 30 fps —
    metadata parsing and clipping run on genuine container bytes while an
    oracle recomputes every downstream value from the text length."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_field)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.fill_null("") if texts.null_count else texts
        collapsed = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(texts, r"\s+", " ")
        )
        lens = pc.utf8_length(collapsed).to_numpy(zero_copy_only=False)
        blobs = [
            write_minimal_mp4(int(ln) % 240 + 30, framerate, 640, 360) for ln in lens
        ]
        return pa.table(
            {
                "video_id": batch.column(id_field).cast(pa.string()),
                "video": pa.array(blobs, pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def planted_frame_color(seed: int, frame_idx: int) -> tuple[int, int, int]:
    """The synthetic corpus's per-frame RGB rule — one closed form shared by
    the generator and the verdict check so frame content is independently
    recomputable from (video seed, frame index) alone."""
    return (
        (seed + 37 * frame_idx) % 256,
        (seed * 3 + 11 * frame_idx) % 256,
        (seed * 7 + 5 * frame_idx) % 256,
    )


def derive_mjpeg_video_table(
    ds,
    text_field: str = "text",
    id_field: str = "doc_id",
    framerate: float = 30.0,
    frame_hw: tuple[int, int] = (64, 64),
):
    """Deterministic MJPEG videos from a text corpus: per document,
    ``(len(collapsed_text) % 12) + 4`` solid-color 64x64 frames whose RGB
    follows :func:`planted_frame_color` with the document's murmur seed —
    real muxed container bytes (every downstream stage exercises the true
    demux + JPEG decode path) with pixel truth recomputable off-pipeline.
    Solid frames decode losslessly through the T.81 codec (DC-only blocks),
    so the PSNR>=40 per-row invariant is checkable exactly."""
    from .ids import hash_ids_from_strings
    from ..functions.jpeg import encode_jpeg

    h, w = frame_hw

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_field)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.fill_null("") if texts.null_count else texts
        collapsed = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(texts, r"\s+", " ")
        )
        lens = pc.utf8_length(collapsed).to_numpy(zero_copy_only=False)
        ids = batch.column(id_field).cast(pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        seeds = hash_ids_from_strings(ids).view(np.uint64) % 251
        blobs = []
        for ln, seed in zip(lens, seeds):
            n = int(ln) % 12 + 4
            frames = []
            px = np.empty((h, w, 3), np.uint8)
            for fi in range(n):
                px[:] = planted_frame_color(int(seed), fi)
                frames.append(encode_jpeg(px, quality=90))
            blobs.append(write_mjpeg_mp4(frames, framerate, w, h))
        return pa.table(
            {
                "video_id": ids,
                "video": pa.array(blobs, pa.binary()),
                "seed": pa.array(seeds.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def derive_motion_corpus(ds, id_field: str = "doc_id", h: int = 256, w: int = 256):
    """Synthesize per-clip motion-vector frames: rows alternate between
    uniform translation (16x16 blocks covering the frame, |motion| seeded
    per row) and near-zero motion, so the motion filter separates them
    deterministically. Analytic expectation: full-coverage uniform motion
    gives ``global_mean = |delta| / (h + w)`` exactly."""
    from .ids import hash_ids_from_strings

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_field).cast(pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        seeds = hash_ids_from_strings(ids).view(np.uint64)
        gx, gy = np.meshgrid(
            np.arange(8, w, 16, dtype=np.float64), np.arange(8, h, 16, dtype=np.float64)
        )
        centers = np.stack([gx.ravel(), gy.ravel()], axis=1)
        nb = len(centers)
        frames_col, static_col, mx_col, my_col = [], [], [], []
        for seed in seeds:
            rng = np.random.default_rng(int(seed))
            static = bool(int(seed) % 2)
            mx, my = (0.0, 0.0) if static else (float(rng.integers(1, 8)), float(rng.integers(1, 8)))
            mv = np.zeros((nb, 10))
            mv[:, 0] = 16  # block w
            mv[:, 1] = 16  # block h
            mv[:, 4:6] = centers
            mv[:, 7] = -mx  # motion_x (delta = -motion/scale)
            mv[:, 8] = -my
            mv[:, 9] = 1.0  # motion_scale
            frames = [mv.ravel(), mv.ravel()]  # two identical frames
            frames_col.append(frames)
            static_col.append(static)
            mx_col.append(mx)
            my_col.append(my)
        return pa.table(
            {
                "clip_id": ids,
                "height": pa.array([h] * len(batch), pa.int32()),
                "width": pa.array([w] * len(batch), pa.int32()),
                "mv_frames": pa.array(
                    frames_col, pa.large_list(pa.large_list(pa.float64()))
                ),
                "static": pa.array(static_col, pa.bool_()),
                "mx": pa.array(mx_col, pa.float64()),
                "my": pa.array(my_col, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
