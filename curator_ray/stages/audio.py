"""Audio curation stages: duration, WER/CER metrics, bandwidth, ASR, filters.

Ray-Data-native re-expression of the reference audio stack's CPU-computable
core (``reference/nemo_curator/stages/audio/``):

- ``GetAudioDurationStage`` (``common.py:44-76``: ``soundfile.info(path)``)
  -> :func:`audio_duration_stage` parses RIFF headers from the ``binary``
  audio column (header-only, no sample decode) via ``functions/wav.py``;
- ``ComputeWERStage`` / ``GetPairwiseWerStage`` (``metrics/wer.py:29-355``)
  -> :func:`wer_stage` / :func:`pairwise_wer_stage` over hyp/ref string
  columns, backed by the from-scratch edit-distance DP in
  ``functions/editdist.py`` (NeMo/editdistance absent in sandbox). The NeMo
  text Normalizer (numbers->words) is an external model pipeline and is
  gated; the character-level ``clean_text`` tables are implemented;
- ``BandwidthEstimationStage`` (``metrics/bandwidth.py:29-146``)
  -> :func:`bandwidth_stage`: Welch mean power spectrum with a 4-term
  Blackman-Harris window + dB threshold scan, pure numpy (librosa absent);
- ``PreserveByValueStage`` (``common.py:78-132``)
  -> :func:`preserve_by_value_stage` as a vectorized Arrow filter;
- ``InferenceAsrNemoStage`` (``inference/asr/asr_nemo.py:29-127``)
  -> :func:`asr_inference_stage`: actor-pool ``map_batches`` class; the real
  NeMo model path is gated (torch/nemo absent); the in-sandbox model is
  :class:`ToneAsrModel`, a real DSP decoder for the deterministic tone codec
  used by the synthetic corpus (energy segmentation + FFT argmax), so the
  pipeline ASR -> WER -> filter is end-to-end meaningful and testable;
- ``AudioToDocumentStage`` (``io/convert.py:38-90``)
  -> :func:`audio_to_documents`: drop payload columns (projection);
- ``ManifestReader/Writer`` (``common.py:135-310``) -> the engine's existing
  ``sources/io.py read_jsonl / write_jsonl`` already cover JSONL manifests.

Data model: one audio row = ``(audio_id, audio:binary, text, pred_text,
duration, ...)`` — opaque payload bytes beside typed metadata, the same
multimodal-column discipline as images (FIXTURES.md F1). Segment-level
processing is row-level here: the reference's ``segments`` list-of-dicts
becomes exploded segment rows (one per utterance), the same columnar move
the translation family makes for line segments.

Scale: duration reads ~44 bytes/row; WER/bandwidth are inherently per-row
kernels (documented; they run inside ``map_batches`` so blocks stream), and
the wide ops remain zero — this family is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.editdist import char_distance_batch, error_rate_detail
from ..functions.wav import decode_wav, encode_wav, wav_info

# --------------------------------------------------------------------------
# duration
# --------------------------------------------------------------------------


def audio_duration_stage(ds, audio_field: str = "audio", duration_field: str = "duration"):
    """Add ``duration`` (seconds, float64) parsed from WAV container headers.

    Unparseable payloads get ``-1.0`` like the reference's failure path
    (``common.py:33-41`` returns -1.0 on soundfile errors).
    """

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch.column(audio_field)
        out = np.full(len(batch), -1.0, dtype=np.float64)
        for i, blob in enumerate(blobs):
            b = blob.as_py()
            if b is None:
                continue
            try:
                out[i] = wav_info(b).duration
            except Exception:
                out[i] = -1.0
        return batch.append_column(duration_field, pa.array(out, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# text cleaning (reference wer.py clean_text, sans the gated NeMo Normalizer)
# --------------------------------------------------------------------------

_PNC_CHARS = "،؟.、？¿!,?।"  # reference wer.py:61 pnc_chars
_INVALID_CHARS = '/*":=_-{|}~¨«·»¡¿…‧‹›≪≫!:;ː→'  # reference wer.py:154
_APOS_CHARS = "‘’ʻ"


def _clean_table(retain_pncs: bool) -> dict[int, str | None]:
    t: dict[int, str | None] = {}
    for c in _INVALID_CHARS + ("" if retain_pncs else _PNC_CHARS):
        t[ord(c)] = " "
    for c in '`¨´“”"':
        t[ord(c)] = None
    if not retain_pncs:
        t[ord("-")] = None
    # The reference's replace_with_blank pass runs BEFORE its apostrophe pass,
    # so in the no-punct variant all of ‘’ʻ are effectively deleted; in the
    # retain-punct variant only ’ survives to be mapped to ' (wer.py:155-169).
    for c in _APOS_CHARS:
        t[ord(c)] = None
    if retain_pncs:
        t[ord("’")] = "'"
    return t


_TABLE_PNC = _clean_table(True)
_TABLE_NOPNC = _clean_table(False)


def clean_text(text: str, retain_pncs: bool = False) -> str:
    """Character-level cleanup matching the reference's ``clean_text``
    (``metrics/wer.py:152-175``): invalid chars -> space, quote-likes
    dropped, apostrophe variants unified, whitespace collapsed; the
    no-punctuation variant also lowercases."""
    if not retain_pncs:
        text = text.lower()
    text = text.translate(_TABLE_PNC if retain_pncs else _TABLE_NOPNC)
    return " ".join(text.split())


# --------------------------------------------------------------------------
# WER / CER metrics
# --------------------------------------------------------------------------


def wer_stage(
    ds,
    hypothesis_field: str = "pred_text",
    reference_field: str = "text",
    duration_field: str | None = None,
    edge_length: int = 12,
    clean: bool = True,
):
    """Add flat metric columns: ``wer``, ``cer``, ``cer_dist`` (raw char
    edit distance), ``start_cer`` / ``end_cer`` (first/last ``edge_length``
    chars, reference ``metrics/wer.py:236-262``), ins/del/sub rates, and —
    when ``duration_field`` is given — ``char_rate`` / ``word_rate``
    (reference ``:180-189``). ``clean=False`` skips the character cleanup
    (used by the SQL-oracle query, where the cleanup would have to be
    re-expressed in SQL)."""

    def fn(batch: pa.Table) -> pa.Table:
        hyp = batch.column(hypothesis_field).to_pylist()
        ref = batch.column(reference_field).to_pylist()
        hyp = ["" if h is None else h for h in hyp]
        ref = ["" if r is None else r for r in ref]
        if clean:
            hyp = [clean_text(h) for h in hyp]
            ref = [clean_text(r) for r in ref]
        w = error_rate_detail(hyp, ref, use_cer=False)
        c = error_rate_detail(hyp, ref, use_cer=True)
        e_start = error_rate_detail(
            [h[:edge_length] for h in hyp], [r[:edge_length] for r in ref], use_cer=True
        )
        e_end = error_rate_detail(
            [h[-edge_length:] for h in hyp], [r[-edge_length:] for r in ref], use_cer=True
        )
        cer_dist = char_distance_batch(hyp, ref)
        out = batch
        for name, arr in (
            ("wer", w["rate"]),
            ("wer_ins_rate", w["ins_rate"]),
            ("wer_del_rate", w["del_rate"]),
            ("wer_sub_rate", w["sub_rate"]),
            ("cer", c["rate"]),
            ("start_cer", e_start["rate"]),
            ("end_cer", e_end["rate"]),
        ):
            out = out.append_column(name, pa.array(arr, pa.float64()))
        out = out.append_column("cer_dist", pa.array(cer_dist, pa.int64()))
        out = out.append_column("ref_tokens", pa.array(w["tokens"], pa.int64()))
        if duration_field is not None:
            dur = batch.column(duration_field).to_numpy(zero_copy_only=False)
            n_chars = np.array([len(h.replace(" ", "")) for h in hyp], dtype=np.float64)
            n_words = np.array([len(h.split()) for h in hyp], dtype=np.float64)
            safe = np.where(dur > 0, dur, np.inf)
            out = out.append_column(
                "char_rate", pa.array(np.round(n_chars / safe, 2), pa.float64())
            )
            out = out.append_column(
                "word_rate", pa.array(np.round(n_words / safe, 2), pa.float64())
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pairwise_wer_stage(
    ds,
    text_field: str = "text",
    pred_text_field: str = "pred_text",
    wer_field: str = "wer_pct",
):
    """WER as a percentage between two text columns (reference
    ``GetPairwiseWerStage``, ``metrics/wer.py:318-355`` — no cleaning)."""

    def fn(batch: pa.Table) -> pa.Table:
        hyp = ["" if h is None else h for h in batch.column(pred_text_field).to_pylist()]
        ref = ["" if r is None else r for r in batch.column(text_field).to_pylist()]
        w = error_rate_detail(hyp, ref, use_cer=False)
        pct = np.round(w["rate"] * 100.0, 4)
        return batch.append_column(wer_field, pa.array(pct, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# bandwidth estimation
# --------------------------------------------------------------------------


def _blackmanharris(n: int) -> np.ndarray:
    # 4-term Blackman-Harris (the window the reference passes to librosa.stft)
    a0, a1, a2, a3 = 0.35875, 0.48829, 0.14128, 0.01168
    x = 2.0 * np.pi * np.arange(n) / (n - 1) if n > 1 else np.zeros(1)
    return a0 - a1 * np.cos(x) + a2 * np.cos(2 * x) - a3 * np.cos(3 * x)


def estimate_bandwidth(
    audio: np.ndarray,
    sample_rate: int,
    n_fft: int = 512,
    stride_seconds: float = 0.01,
    top_db: float = 100.0,
    frequency_threshold: float = -50.0,
) -> int:
    """Highest frequency whose mean power is within ``frequency_threshold``
    dB of the spectral peak (reference ``metrics/bandwidth.py:78-97``):
    windowed mean power spectrum -> dB (ref=n_fft, clipped to peak-top_db)
    -> scan from Nyquist down."""
    hop = max(1, int(sample_rate * stride_seconds))
    if len(audio) < n_fft:
        audio = np.pad(audio, (0, n_fft - len(audio)))
    n_frames = 1 + (len(audio) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = audio[idx] * _blackmanharris(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mean_power = power.mean(axis=0)
    db = 10.0 * np.log10(np.maximum(mean_power, 1e-10) / n_fft)
    db = np.maximum(db, db.max() - top_db)
    peak = db.max()
    freq_width = sample_rate / n_fft
    above = np.nonzero(db - peak > frequency_threshold)[0]
    return int(above[-1] * freq_width) if len(above) else 0


class BandwidthEstimator:
    """Actor-pool map_batches: decode WAV payload, estimate bandwidth."""

    def __init__(self, audio_field: str = "audio", **kwargs):
        self.audio_field = audio_field
        self.kwargs = kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.int64)
        for i, blob in enumerate(batch.column(self.audio_field)):
            b = blob.as_py()
            if not b:
                continue
            try:
                audio, rate = decode_wav(b)
            except ValueError:
                continue
            out[i] = estimate_bandwidth(audio, rate, **self.kwargs)
        return batch.append_column("bandwidth", pa.array(out, pa.int64()))


def bandwidth_stage(ds, audio_field: str = "audio", concurrency: tuple[int, int] = (1, 8), **kwargs):
    return ds.map_batches(
        BandwidthEstimator,
        fn_constructor_kwargs={"audio_field": audio_field, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks: slicing a block with a binary payload column
        # re-serializes its full backing buffer per slice (see
        # image.decode_stage / PERF.md round 5); bound memory at the reader
    )


# --------------------------------------------------------------------------
# band-energy features + band filter
# --------------------------------------------------------------------------

# reference band_filter_module/features.py:28-53 — 24 fixed 1 kHz bands
BAND_DEFINITIONS = {
    **{f"low{i}": ((i - 1) * 1000, i * 1000) for i in (1, 2, 3)},
    **{f"mid{i}": ((i + 2) * 1000, (i + 3) * 1000) for i in range(1, 11)},
    "high": (13000, 14000),
    **{f"high{i}": ((i + 13) * 1000, (i + 14) * 1000) for i in range(1, 11)},
}
_HIGH_FREQ_CUTOFF = 10000.0  # reference band_filter_module/features.py:23


def band_energy_features(audio: np.ndarray, rate: int, n_fft: int = 4096) -> dict[str, float]:
    """Per-band mean power in dB relative to the global spectral peak, with
    the reference's high-frequency attenuation ramp
    (``band_filter_module/features.py:67-119``). The reference first
    LUFS-normalizes the waveform (pyloudnorm); because every feature is a
    power RATIO against the global max, uniform amplitude scaling cancels
    exactly, so the normalization is a mathematical no-op for this feature
    set and is omitted here (pyloudnorm absent; equivalence by scale
    invariance, covered in tests)."""
    if len(audio) < n_fft:
        audio = np.pad(audio, (0, n_fft - len(audio)))
    hop = n_fft // 4
    n = 1 + (len(audio) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    win = np.hanning(n_fft)
    power = np.abs(np.fft.rfft(audio[idx] * win[None, :], axis=1)) ** 2
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    global_max = max(float(power.max()), 1e-10)
    out = {}
    for band, (f_min, f_max) in BAND_DEFINITIONS.items():
        mask = (freqs >= f_min) & (freqs < f_max)
        if mask.any():
            mean_power = float(power[:, mask].mean())
            db = 10.0 * np.log10(max(mean_power, 1e-12) / global_max)
            if f_min >= _HIGH_FREQ_CUTOFF:
                db -= (f_min - _HIGH_FREQ_CUTOFF) / 14000.0 * 12.0
            out[f"band_energy_{band}"] = db
        else:  # band above Nyquist for this sample rate
            out[f"band_energy_{band}"] = -120.0
    return out


class BandPredictor:
    """Band label (full_band / narrow_band) from the band-energy profile
    (reference ``band_filter_module/predict.py:26-120``). The reference's
    joblib classifier is model-bound and gated; the in-sandbox predictor is
    a rule on the same features: audio whose >= 8 kHz bands hold energy
    within ``wideband_threshold_db`` of the spectral peak is full-band."""

    def __init__(self, model_path: str | None = None, wideband_threshold_db: float = -45.0):
        self.threshold = wideband_threshold_db
        self.model = None
        if model_path:
            try:
                import joblib
            except ImportError as exc:  # pragma: no cover - sandbox path
                raise ImportError(
                    "joblib is not installed in this environment; omit "
                    "model_path to use the rule-based band predictor, or "
                    "install joblib + the trained model in deployment."
                ) from exc
            self.model = joblib.load(model_path)  # pragma: no cover

    def predict(self, audio: np.ndarray, rate: int) -> str:
        feats = band_energy_features(audio, rate)
        if self.model is not None:  # pragma: no cover - needs model file
            vec = np.array([feats[k] for k in sorted(feats)])[None, :]
            return str(self.model.predict(vec)[0])
        high = [v for k, v in feats.items() if "high" in k or k in ("mid6", "mid7", "mid8", "mid9", "mid10")]
        return "full_band" if max(high) > self.threshold else "narrow_band"


def band_filter_stage(
    ds,
    audio_field: str = "audio",
    keep_label: str = "full_band",
    model_path: str | None = None,
    concurrency: tuple[int, int] = (1, 8),
):
    """Keep rows whose audio classifies as ``keep_label`` (reference
    ``BandFilterStage``, ``filtering/band.py:53-170``); adds the
    ``band_label`` column."""

    class _Stage:
        def __init__(self):
            self.pred = BandPredictor(model_path)

        def __call__(self, batch: pa.Table) -> pa.Table:
            labels = []
            for blob in batch.column(audio_field):
                b = blob.as_py()
                if not b:
                    labels.append("invalid")
                    continue
                try:
                    audio, rate = decode_wav(b)
                    labels.append(self.pred.predict(audio, rate))
                except ValueError:
                    labels.append("invalid")
            out = batch.append_column("band_label", pa.array(labels, pa.string()))
            return out.filter(pc.equal(out.column("band_label"), keep_label))

    return ds.map_batches(
        _Stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks — see bandwidth_stage note on slice re-serialization
    )


# --------------------------------------------------------------------------
# value filter
# --------------------------------------------------------------------------

_OPS = {
    "lt": pc.less,
    "le": pc.less_equal,
    "eq": pc.equal,
    "ne": pc.not_equal,
    "ge": pc.greater_equal,
    "gt": pc.greater,
}


def preserve_by_value_stage(ds, field: str, target, operator: str = "eq"):
    """Keep rows where ``field <op> target`` (reference
    ``PreserveByValueStage``, ``common.py:78-132``), as one vectorized
    Arrow filter instead of a per-task Python comparison loop."""
    if operator not in _OPS:
        raise ValueError(f"operator must be one of {sorted(_OPS)}")
    op = _OPS[operator]

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(op(batch.column(field), pa.scalar(target)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# tone codec + ASR inference
# --------------------------------------------------------------------------

# 64-word vocabulary for the deterministic tone codec. Each word is emitted
# as a fixed-length pure tone; word index i <-> frequency 400 + 50*i Hz
# (all bins distinct and below Nyquist at 16 kHz for i < 64).
TONE_VOCAB = [f"tok{i:02d}" for i in range(64)]
_TONE_RATE = 16000
_TONE_WORD_S = 0.08
_TONE_GAP_S = 0.02


def synth_speech(word_indices: np.ndarray, rate: int = _TONE_RATE) -> bytes:
    """Encode a word-index sequence as WAV bytes: one tone per word with
    silence gaps. The deterministic stand-in for real speech in tests and
    synthetic corpora (no audio data ships with the sandbox)."""
    wlen = int(rate * _TONE_WORD_S)
    glen = int(rate * _TONE_GAP_S)
    t = np.arange(wlen) / rate
    chunks = []
    for wi in word_indices:
        f = 400.0 + 50.0 * int(wi)
        tone = 0.6 * np.sin(2.0 * np.pi * f * t)
        # short fade to kill clicks (5 ms)
        ramp = min(int(0.005 * rate), wlen // 2)
        env = np.ones(wlen)
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
        chunks.append(tone * env)
        chunks.append(np.zeros(glen))
    samples = np.concatenate(chunks) if chunks else np.zeros(0)
    return encode_wav(samples, rate)


class ToneAsrModel:
    """Deterministic in-sandbox ASR model: energy-gap segmentation + FFT
    argmax per segment -> vocabulary word. Real DSP on the tone codec above;
    a drop-in NeMo model replaces it via ``asr_inference_stage(model_name=)``
    without changing the stage contract (reference ``asr_nemo.py:95-106``
    ``transcribe(files) -> list[str]``)."""

    def transcribe_array(self, audio: np.ndarray, rate: int) -> str:
        if len(audio) == 0:
            return ""
        wlen = int(rate * _TONE_WORD_S)
        # frame-level energy gate at 10 ms resolution
        hop = max(1, int(0.01 * rate))
        n = len(audio) // hop
        if n == 0:
            return ""
        frames = audio[: n * hop].reshape(n, hop)
        active = (frames**2).mean(axis=1) > 1e-4
        # segment = run of active frames
        edges = np.diff(active.astype(np.int8), prepend=0, append=0)
        starts = np.nonzero(edges == 1)[0] * hop
        ends = np.nonzero(edges == -1)[0] * hop
        words = []
        for s, e in zip(starts, ends):
            seg = audio[s : min(e, s + wlen)]
            if len(seg) < 32:
                continue
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            f = np.argmax(spec) * rate / len(seg)
            idx = int(round((f - 400.0) / 50.0))
            if 0 <= idx < len(TONE_VOCAB):
                words.append(TONE_VOCAB[idx])
        return " ".join(words)


class AsrInference:
    """Actor-pool map_batches class: model loaded once per worker in
    ``__init__`` (reference ``asr_nemo.py:77-87`` setup), batch transcribe
    in ``__call__``."""

    def __init__(self, model_name: str | None = None, audio_field: str = "audio"):
        self.audio_field = audio_field
        if model_name:
            try:
                import nemo.collections.asr as nemo_asr  # noqa: F401
            except ImportError as exc:  # pragma: no cover - sandbox path
                raise ImportError(
                    "NeMo ASR is not installed in this environment; "
                    "omit model_name to use the deterministic ToneAsrModel, "
                    "or install nemo_toolkit[asr] in deployment."
                ) from exc
            self.model = nemo_asr.models.ASRModel.from_pretrained(model_name=model_name)
            self._real = True
        else:
            self.model = ToneAsrModel()
            self._real = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = []
        for blob in batch.column(self.audio_field):
            b = blob.as_py()
            if not b:
                texts.append("")
                continue
            try:
                audio, rate = decode_wav(b)
            except ValueError:
                texts.append("")
                continue
            if self._real:  # pragma: no cover - needs NeMo
                texts.append(self.model.transcribe([audio])[0])
            else:
                texts.append(self.model.transcribe_array(audio, rate))
        return batch.append_column("pred_text", pa.array(texts, pa.string()))


def asr_inference_stage(
    ds,
    model_name: str | None = None,
    audio_field: str = "audio",
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int | None = None,
):
    return ds.map_batches(
        AsrInference,
        fn_constructor_kwargs={"model_name": model_name, "audio_field": audio_field},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks unless the caller bounds batches explicitly —
        # slicing a block with a binary payload column re-serializes its
        # full backing buffer per slice (PERF.md round 5)
        **({} if batch_size is None else {"batch_size": batch_size}),
    )


# --------------------------------------------------------------------------
# VAD segmentation (fan-out: one row per speech segment)
# --------------------------------------------------------------------------


def energy_vad_intervals(
    audio: np.ndarray,
    rate: int,
    frame_ms: int = 10,
    energy_threshold: float = 1e-4,
    min_silence_ms: int = 100,
    min_duration_s: float = 0.0,
    max_duration_s: float = 30.0,
    speech_pad_ms: int = 0,
) -> np.ndarray:
    """(n, 2) array of (start_ms, end_ms) speech intervals from frame-energy
    voice activity detection — the classic DSP baseline standing in for the
    reference's Silero model (``segmentation/vad_segmentation.py:60-240``;
    the model itself is torch-bound and gated). Semantics mirror the
    reference's post-processing: silences shorter than ``min_silence_ms``
    merge adjacent speech, segments get ``speech_pad_ms`` padding, run
    longer than ``max_duration_s`` split, shorter than ``min_duration_s``
    drop."""
    hop = max(1, int(rate * frame_ms / 1000))
    n = len(audio) // hop
    if n == 0:
        return np.zeros((0, 2), dtype=np.int64)
    frames = audio[: n * hop].reshape(n, hop)
    active = (frames**2).mean(axis=1) > energy_threshold
    edges = np.diff(active.astype(np.int8), prepend=0, append=0)
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    if len(starts) == 0:
        return np.zeros((0, 2), dtype=np.int64)
    # merge runs separated by silence < min_silence_ms
    min_gap = max(1, min_silence_ms // frame_ms)
    keep_gap = (starts[1:] - ends[:-1]) >= min_gap
    seg_starts = starts[np.concatenate([[True], keep_gap])]
    seg_ends = ends[np.concatenate([keep_gap, [True]])]
    s_ms = np.maximum(seg_starts * frame_ms - speech_pad_ms, 0)
    e_ms = np.minimum(seg_ends * frame_ms + speech_pad_ms, int(len(audio) / rate * 1000))
    out = []
    max_ms = int(max_duration_s * 1000)
    min_ms = int(min_duration_s * 1000)
    for a, b in zip(s_ms, e_ms):
        while b - a > max_ms:  # split oversized runs at max_duration
            out.append((a, a + max_ms))
            a += max_ms
        if b - a >= max(min_ms, 1):
            out.append((a, b))
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


class VadSegmentation:
    """Actor-pool map_batches: fan each audio row out to one row per speech
    segment (reference ``VADSegmentationStage`` non-nested mode), columns
    ``(…passthrough, segment_num, start_ms, end_ms, duration, audio)`` where
    ``audio`` holds the re-encoded PCM16 slice. ``model_name`` selects the
    Silero path (torch-bound, gated); default is the energy VAD above."""

    def __init__(self, audio_field: str = "audio", model_name: str | None = None, **vad_kwargs):
        self.audio_field = audio_field
        self.vad_kwargs = vad_kwargs
        if model_name:
            try:
                import silero_vad  # noqa: F401
            except ImportError as exc:  # pragma: no cover - sandbox path
                raise ImportError(
                    "silero-vad is not installed in this environment; omit "
                    "model_name to use the energy-threshold VAD, or install "
                    "silero-vad + torch in deployment."
                ) from exc

    def __call__(self, batch: pa.Table) -> pa.Table:
        passthrough = [c for c in batch.schema.names if c != self.audio_field]
        cols: dict[str, list] = {c: [] for c in passthrough}
        seg_num, s_ms, e_ms, dur, blobs = [], [], [], [], []
        for i, blob in enumerate(batch.column(self.audio_field)):
            b = blob.as_py()
            if not b:
                continue
            try:
                audio, rate = decode_wav(b)
            except ValueError:
                continue
            ivals = energy_vad_intervals(audio, rate, **self.vad_kwargs)
            for k, (a, e) in enumerate(ivals):
                for c in passthrough:
                    cols[c].append(batch.column(c)[i].as_py())
                seg_num.append(k)
                s_ms.append(int(a))
                e_ms.append(int(e))
                dur.append((int(e) - int(a)) / 1000.0)
                sl = audio[int(a * rate / 1000) : int(e * rate / 1000)]
                blobs.append(encode_wav(sl, rate))
        # Build passthrough arrays with the ORIGINAL column types so that
        # zero-segment (or all-None) batches agree on schema with
        # segment-bearing blocks downstream.
        out = {
            c: pa.array(cols[c], type=batch.schema.field(c).type) for c in passthrough
        }
        out["segment_num"] = pa.array(seg_num, pa.int64())
        out["start_ms"] = pa.array(s_ms, pa.int64())
        out["end_ms"] = pa.array(e_ms, pa.int64())
        out["duration"] = pa.array(dur, pa.float64())
        out["audio"] = pa.array(blobs, pa.binary())
        return pa.table(out)


def vad_segmentation_stage(
    ds,
    audio_field: str = "audio",
    model_name: str | None = None,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int | None = None,
    **vad_kwargs,
):
    return ds.map_batches(
        VadSegmentation,
        fn_constructor_kwargs={"audio_field": audio_field, "model_name": model_name, **vad_kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks unless the caller bounds batches explicitly —
        # slicing a block with a binary payload column re-serializes its
        # full backing buffer per slice (PERF.md round 5)
        **({} if batch_size is None else {"batch_size": batch_size}),
    )


# --------------------------------------------------------------------------
# ALM training-window builder
# --------------------------------------------------------------------------

_MIN_SEGMENTS_PER_WINDOW = 2  # reference alm_data_builder.py:32


def build_alm_windows(
    segments: list[dict],
    sample_rate: int,
    target_window_duration: float = 120.0,
    tolerance: float = 0.1,
    min_bandwidth: int = 8000,
    min_sample_rate: int = 16000,
    min_speakers: int = 2,
    max_speakers: int = 5,
) -> list[dict]:
    """Greedy ALM training-window extraction over one utterance's segment
    list (reference ``ALMDataBuilderStage._process_single_entry``,
    ``alm/alm_data_builder.py:183-291``): from each qualifying start
    segment, extend while the window stays under ``max_duration`` with at
    most ``max_speakers`` labeled speakers and no ``no-speaker`` region;
    accept windows whose duration lands in the +/-``tolerance`` band with
    >= 2 segments and >= ``min_speakers``. Speaker durations are the top-5
    descending, zero-padded. The reference's word-level truncation branch
    needs word timestamps; segments without a ``words`` list use the
    ``truncation=False`` behavior (stop at the boundary) — documented
    deviation."""
    tol = target_window_duration * tolerance
    min_dur, max_dur = target_window_duration - tol, target_window_duration + tol
    if sample_rate < min_sample_rate or not segments:
        return []

    def bw(s):
        return int(s.get("bandwidth", s.get("metrics", {}).get("bandwidth", 0)))

    def spk_durs(segs):
        d: dict = {}
        for s in segs:
            spk = s.get("speaker")
            if spk:
                d[spk] = d.get(spk, 0.0) + (s["end"] - s["start"])
        return d

    windows = []
    for start_idx, seg in enumerate(segments):
        if bw(seg) < min_bandwidth:
            continue
        window_segs: list[dict] = []
        window_start = seg["start"]
        window_end = seg["end"]
        for curr in segments[start_idx:]:
            if bw(curr) < min_bandwidth:
                break
            if curr["end"] - window_start > max_dur:
                words = [w for w in curr.get("words", []) if w["end"] <= window_start + max_dur]
                if words:  # word-level truncation (reference :74-89)
                    part = dict(curr)
                    part["end"] = words[-1]["end"]
                    part["text"] = " ".join(w.get("word", "") for w in words if w.get("word"))
                    d = spk_durs([*window_segs, part])
                    if len(d) > max_speakers or "no-speaker" in d:
                        break
                    window_segs.append(part)
                    window_end = part["end"]
                break
            d = spk_durs([*window_segs, curr])
            if len(d) > max_speakers or "no-speaker" in d:
                break
            window_end = curr["end"]
            window_segs.append(curr)
        dur = window_end - window_start
        if not min_dur <= dur <= max_dur:
            continue
        if len(window_segs) < _MIN_SEGMENTS_PER_WINDOW or any(bw(s) < min_bandwidth for s in window_segs):
            continue
        d = spk_durs(window_segs)
        if not min_speakers <= len(d) <= max_speakers or "no-speaker" in d:
            continue
        durs = sorted(d.values(), reverse=True)[:5]
        durs += [0.0] * (5 - len(durs))
        windows.append(
            {
                "window_start": window_start,
                "window_end": window_end,
                "n_segments": len(window_segs),
                "speaker_durations": durs,
                "text": " ".join(s.get("text", "") for s in window_segs),
            }
        )
    return windows


def alm_window_stage(ds, segments_field: str = "segments", sample_rate_field: str = "sample_rate", **kwargs):
    """Fan each utterance row out to one row per valid ALM training window.
    ``segments`` is a nested list<struct> column (start, end, speaker,
    bandwidth, text, optional words)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        segs_col = batch.column(segments_field).to_pylist()
        rates = batch.column(sample_rate_field).to_numpy(zero_copy_only=False)
        out = {
            "audio_id": [], "window_num": [], "window_start": [], "window_end": [],
            "n_segments": [], "speaker_durations": [], "text": [],
        }
        for aid, segs, rate in zip(ids, segs_col, rates):
            for k, w in enumerate(build_alm_windows(segs or [], int(rate), **kwargs)):
                out["audio_id"].append(aid)
                out["window_num"].append(k)
                out["window_start"].append(w["window_start"])
                out["window_end"].append(w["window_end"])
                out["n_segments"].append(w["n_segments"])
                out["speaker_durations"].append(w["speaker_durations"])
                out["text"].append(w["text"])
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "window_num": pa.array(out["window_num"], pa.int64()),
                "window_start": pa.array(out["window_start"], pa.float64()),
                "window_end": pa.array(out["window_end"], pa.float64()),
                "n_segments": pa.array(out["n_segments"], pa.int64()),
                "speaker_durations": pa.array(out["speaker_durations"], pa.list_(pa.float64(), 5)),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# model-gated quality scoring + speaker diarization
#
# The reference's SIGMOS / UTMOS / TorchSQUIM / Sortformer stages are
# torch/onnx/NeMo-model-bound (filtering/sigmos.py, filtering/utmos.py,
# metrics/squim.py, inference/speaker_diarization/sortformer.py). The
# CPU-real parts — threshold gating, column plumbing, actor lifecycle — are
# implemented here for real; the model forward pass is gated exactly like
# vLLM/Silero/NeMo elsewhere in this repo, with a ``scores_fn`` /
# ``segments_fn`` injection seam so the full stage path stays testable and
# a weights-in-hand deployment swaps the real model in without touching
# the stage contract.
# --------------------------------------------------------------------------

# the seven SIGMOS MOS dimensions (sigmos.py:103-145 threshold fields)
SIGMOS_KEYS = ("noise", "ovrl", "sig", "col", "disc", "loud", "reverb")


def check_sigmos_thresholds(
    scores: dict[str, float], thresholds: dict[str, float | None]
) -> tuple[bool, list[str]]:
    """Keep/drop verdict + fail reasons (reference ``_check_thresholds``,
    ``filtering/sigmos.py:264-280``: a ``None`` threshold disables its
    check; any enabled dimension below threshold fails the item)."""
    fails: list[str] = []
    for key in SIGMOS_KEYS:
        thr = thresholds.get(key)
        if thr is not None and scores[key] < thr:
            fails.append(f"{key.upper()} {scores[key]:.3f} < {thr}")
    return (not fails), fails


def _decode_audio_cell(blob) -> tuple[np.ndarray, int] | None:
    b = blob.as_py()
    if not b:
        return None
    try:
        return decode_wav(b)
    except ValueError:
        return None


class SigmosFilter:
    """Actor-pool map_batches: score each row on the seven SIGMOS
    dimensions, append ``sigmos_<key>`` columns, and keep rows passing
    every enabled threshold (reference ``SIGMOSFilterStage``,
    ``filtering/sigmos.py:103-330``; reference defaults noise>=4.0,
    ovrl>=3.5, other five disabled).

    The ONNX model is gated: the reference auto-downloads Microsoft's
    SIG-Challenge checkpoint, this sandbox has no network or onnxruntime,
    so a real deployment passes ``model_path`` (with onnxruntime
    installed) and tests inject ``scores_fn(audio, rate) -> dict``."""

    def __init__(
        self,
        audio_field: str = "audio",
        model_path: str | None = None,
        scores_fn=None,
        noise_threshold: float | None = 4.0,
        ovrl_threshold: float | None = 3.5,
        sig_threshold: float | None = None,
        col_threshold: float | None = None,
        disc_threshold: float | None = None,
        loud_threshold: float | None = None,
        reverb_threshold: float | None = None,
    ):
        self.audio_field = audio_field
        self.thresholds = {
            "noise": noise_threshold,
            "ovrl": ovrl_threshold,
            "sig": sig_threshold,
            "col": col_threshold,
            "disc": disc_threshold,
            "loud": loud_threshold,
            "reverb": reverb_threshold,
        }
        if scores_fn is not None:
            self._score = scores_fn
            return
        try:
            import onnxruntime  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "onnxruntime is not installed in this environment; SIGMOS "
                "scoring needs the SIG-Challenge ONNX model (pass model_path "
                "with onnxruntime installed in deployment) or inject "
                "scores_fn for a custom scorer."
            ) from exc
        if model_path is None:  # pragma: no cover - needs onnxruntime
            raise ValueError(
                "this environment has no network access: pass model_path to "
                "a pre-downloaded SIGMOS ONNX checkpoint"
            )
        self._session = onnxruntime.InferenceSession(model_path)  # pragma: no cover
        self._score = self._score_onnx  # pragma: no cover

    def _score_onnx(self, audio: np.ndarray, rate: int) -> dict[str, float]:  # pragma: no cover
        raise NotImplementedError(
            "SIGMOS ONNX forward pass requires the reference STFT feature "
            "pipeline (third_party/sigmos); supply scores_fn in-sandbox"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {k: np.full(n, np.nan) for k in SIGMOS_KEYS}
        keep = np.zeros(n, bool)
        reasons: list[str | None] = [None] * n
        for i, blob in enumerate(batch.column(self.audio_field)):
            dec = _decode_audio_cell(blob)
            if dec is None:
                reasons[i] = "audio load failed"
                continue
            scores = self._score(*dec)
            for k in SIGMOS_KEYS:
                cols[k][i] = scores[k]
            ok, fails = check_sigmos_thresholds(scores, self.thresholds)
            keep[i] = ok
            if fails:
                reasons[i] = "; ".join(fails)
        for k in SIGMOS_KEYS:
            batch = batch.append_column(f"sigmos_{k}", pa.array(cols[k], pa.float64()))
        batch = batch.append_column("sigmos_fail_reasons", pa.array(reasons, pa.string()))
        return batch.filter(pa.array(keep))


def sigmos_filter_stage(
    ds,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int | None = None,
    **kwargs,
):
    return ds.map_batches(
        SigmosFilter,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks unless the caller bounds batches explicitly —
        # slicing a block with a binary payload column re-serializes its
        # full backing buffer per slice (PERF.md round 5)
        **({} if batch_size is None else {"batch_size": batch_size}),
    )


class UtmosFilter:
    """UTMOSv2 naturalness-MOS filter (reference ``UTMOSFilterStage``,
    ``filtering/utmos.py:92-247``: keep iff ``mos >= mos_threshold``,
    default 3.5; score appended as ``utmos_mos``). Model gated on torch +
    the utmosv2 checkpoint; ``scores_fn(audio, rate) -> float`` injects a
    scorer in-sandbox."""

    def __init__(
        self,
        audio_field: str = "audio",
        mos_threshold: float | None = 3.5,
        model_path: str | None = None,
        scores_fn=None,
    ):
        self.audio_field = audio_field
        self.mos_threshold = mos_threshold
        if scores_fn is not None:
            self._score = scores_fn
            return
        try:
            import torch  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "torch is not installed in this environment; UTMOS scoring "
                "needs the utmosv2 checkpoint (pass model_path with torch "
                "installed in deployment) or inject scores_fn."
            ) from exc
        raise NotImplementedError(  # pragma: no cover - needs torch
            "load utmosv2 from model_path here in deployment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        mos = np.full(n, np.nan)
        keep = np.zeros(n, bool)
        for i, blob in enumerate(batch.column(self.audio_field)):
            dec = _decode_audio_cell(blob)
            if dec is None:
                continue
            mos[i] = float(self._score(*dec))
            keep[i] = self.mos_threshold is None or mos[i] >= self.mos_threshold
        return batch.append_column("utmos_mos", pa.array(mos, pa.float64())).filter(
            pa.array(keep)
        )


def utmos_filter_stage(
    ds,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int | None = None,
    **kwargs,
):
    return ds.map_batches(
        UtmosFilter,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks unless the caller bounds batches explicitly —
        # slicing a block with a binary payload column re-serializes its
        # full backing buffer per slice (PERF.md round 5)
        **({} if batch_size is None else {"batch_size": batch_size}),
    )


class SquimMetrics:
    """TorchSQUIM objective-quality metrics: appends ``pesq_squim``,
    ``stoi_squim``, ``sisdr_squim`` rounded to 3 decimals (reference
    ``TorchSquimQualityMetricsStage``, ``metrics/squim.py:35-235`` — a
    metrics stage, not a filter). Gated on torchaudio; tests inject
    ``scores_fn(audio, rate) -> (pesq, stoi, sisdr)``."""

    def __init__(self, audio_field: str = "audio", scores_fn=None):
        self.audio_field = audio_field
        if scores_fn is not None:
            self._score = scores_fn
            return
        try:
            import torchaudio  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "torchaudio is not installed in this environment; SQUIM "
                "metrics need torchaudio.pipelines.SQUIM_OBJECTIVE in "
                "deployment, or inject scores_fn."
            ) from exc
        raise NotImplementedError(  # pragma: no cover - needs torchaudio
            "load SQUIM_OBJECTIVE.get_model() here in deployment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        out = {k: np.full(n, np.nan) for k in ("pesq", "stoi", "sisdr")}
        for i, blob in enumerate(batch.column(self.audio_field)):
            dec = _decode_audio_cell(blob)
            if dec is None:
                continue
            pesq, stoi, sisdr = self._score(*dec)
            out["pesq"][i] = round(float(pesq), 3)
            out["stoi"][i] = round(float(stoi), 3)
            out["sisdr"][i] = round(float(sisdr), 3)
        for k in ("pesq", "stoi", "sisdr"):
            batch = batch.append_column(f"{k}_squim", pa.array(out[k], pa.float64()))
        return batch


def squim_metrics_stage(
    ds,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int | None = None,
    **kwargs,
):
    return ds.map_batches(
        SquimMetrics,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks unless the caller bounds batches explicitly —
        # slicing a block with a binary payload column re-serializes its
        # full backing buffer per slice (PERF.md round 5)
        **({} if batch_size is None else {"batch_size": batch_size}),
    )


class SpeakerDiarization:
    """Sortformer speaker diarization (reference
    ``InferenceSortformerStage``, ``speaker_diarization/sortformer.py:
    85-240``): per row, a list of ``{start, end, speaker}`` segments in a
    nested ``diar_segments`` column. The NeMo model (default
    ``nvidia/diar_streaming_sortformer_4spk-v2.1``) is gated like the ASR
    path; ``segments_fn(audio, rate) -> list[dict]`` injects an in-sandbox
    segmenter (e.g. the energy VAD labelled single-speaker)."""

    SEGMENT_TYPE = pa.list_(
        pa.struct(
            [("start", pa.float64()), ("end", pa.float64()), ("speaker", pa.string())]
        )
    )

    def __init__(
        self,
        audio_field: str = "audio",
        model_name: str = "nvidia/diar_streaming_sortformer_4spk-v2.1",
        model_path: str | None = None,
        segments_fn=None,
    ):
        self.audio_field = audio_field
        if segments_fn is not None:
            self._segments = segments_fn
            return
        try:
            import nemo.collections.asr  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "NeMo is not installed in this environment; Sortformer "
                f"diarization ({model_name}) needs nemo_toolkit[asr] in "
                "deployment (model_path for a local .nemo checkpoint), or "
                "inject segments_fn."
            ) from exc
        raise NotImplementedError(  # pragma: no cover - needs NeMo
            "SortformerEncLabelModel.restore_from(model_path) here in deployment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        segs: list[list[dict] | None] = []
        for blob in batch.column(self.audio_field):
            dec = _decode_audio_cell(blob)
            segs.append(None if dec is None else self._segments(*dec))
        return batch.append_column("diar_segments", pa.array(segs, self.SEGMENT_TYPE))


def diarization_stage(
    ds,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int | None = None,
    **kwargs,
):
    return ds.map_batches(
        SpeakerDiarization,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # whole blocks unless the caller bounds batches explicitly —
        # slicing a block with a binary payload column re-serializes its
        # full backing buffer per slice (PERF.md round 5)
        **({} if batch_size is None else {"batch_size": batch_size}),
    )


def parse_diar_segments(raw_segments: list) -> list[dict]:
    """Normalize diarizer output to ``{start, end, speaker}`` dicts
    (reference ``_parse_sortformer_segments``, ``sortformer.py:33-68``:
    accepts ``"start end speaker"`` strings, objects with attributes, or
    dicts)."""
    out: list[dict] = []
    for seg in raw_segments:
        if isinstance(seg, str):
            parts = seg.strip().split()
            if len(parts) < 2:  # malformed diarizer line: skip, don't crash
                continue
            out.append(
                {
                    "start": float(parts[0]),
                    "end": float(parts[1]),
                    "speaker": parts[2] if len(parts) > 2 else "unknown",
                }
            )
        elif isinstance(seg, dict):
            out.append(
                {
                    "start": float(seg["start"]),
                    "end": float(seg["end"]),
                    "speaker": str(seg.get("speaker", "unknown")),
                }
            )
        elif hasattr(seg, "start") and hasattr(seg, "end"):
            out.append(
                {
                    "start": float(seg.start),
                    "end": float(seg.end),
                    "speaker": str(getattr(seg, "speaker", "unknown")),
                }
            )
    return out


def rttm_from_segments(segments: list[dict], session_name: str) -> str:
    """NIST RTTM text for one session's diarization segments (reference
    ``_write_rttm``, ``sortformer.py:71-81``: one SPEAKER line per positive-
    duration segment, 3-decimal start/duration, <NA> placeholder fields;
    degenerate segments skipped). Returned as a string column value — the
    engine's writers persist it, keeping IO out of the transform."""
    lines = []
    for seg in segments:
        duration = seg["end"] - seg["start"]
        if duration <= 0:
            continue
        lines.append(
            f"SPEAKER {session_name} 1 {seg['start']:.3f} {duration:.3f} "
            f"<NA> <NA> {seg['speaker']} <NA> <NA>"
        )
    return "\n".join(lines) + ("\n" if lines else "")


def rttm_stage(
    ds,
    segments_field: str = "diar_segments",
    id_field: str = "audio_id",
    rttm_field: str = "rttm",
):
    """Append an ``rttm`` string column rendered from the nested segment
    column — the columnar analogue of the reference's per-session
    ``{sess_name}.rttm`` side files."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_field).cast(pa.string()).to_pylist()
        segs = batch.column(segments_field).to_pylist()
        vals = [
            None if s is None else rttm_from_segments(s, sid)
            for sid, s in zip(ids, segs)
        ]
        return batch.append_column(rttm_field, pa.array(vals, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def align_words_to_segments(
    alignment: list[dict], segments: list[dict]
) -> list[dict]:
    """Assign time-aligned words to diarization segments (reference
    ``MergeAlignmentDiarizationStage.align_words_to_segments``,
    ``tagging/merge_alignment_diarization.py:65-180`` semantics): a single
    forward pass over start-sorted words per start-sorted segment —

    - a word fully inside the segment joins it;
    - a boundary-straddling word joins whichever of (this segment, the next
      segment) it overlaps more, ties to the current one;
    - a word overlapping neither (a diarization gap) is skipped.

    Returns NEW segment dicts with ``text`` (space-joined words) and
    ``words`` added; inputs are not mutated (the reference mutates its task
    dicts in place — columnar rows are immutable, so this engine rebuilds).
    """
    alignment = sorted(alignment or [], key=lambda x: x.get("start", 0))
    segments = sorted(segments or [], key=lambda x: x.get("start", 0))
    out = [dict(s) for s in segments]
    last = 0
    if alignment and out:
        for i, seg in enumerate(out):
            words: list[dict] = []
            s0, s1 = seg.get("start", 0), seg.get("end", 0)
            while last < len(alignment):
                word = alignment[last]
                w0, w1 = word.get("start", 0), word.get("end", 0)
                if w0 >= s1:
                    break
                if w0 >= s0 and w1 <= s1:
                    words.append(word)
                    last += 1
                else:
                    cur = max(0, min(w1, s1) - max(w0, s0))
                    if i < len(out) - 1:
                        n0, n1 = out[i + 1].get("start", 0), out[i + 1].get("end", 0)
                        nxt = max(0, min(w1, n1) - max(w0, n0))
                    else:
                        nxt = 0
                    if cur >= nxt and cur > 0:
                        words.append(word)
                        last += 1
                    elif nxt > cur:
                        break
                    else:
                        last += 1  # falls in a gap between segments: skip
            seg["text"] = " ".join(x.get("word", "") for x in words)
            seg["words"] = words
    else:
        for seg in out:
            seg["text"] = ""
            seg["words"] = []
    return out


def merge_alignment_diarization_stage(
    ds,
    alignment_field: str = "alignment",
    segments_field: str = "diar_segments",
):
    """Merge word alignments into diarization segments per row (reference
    ``MergeAlignmentDiarizationStage``, ``tagging/merge_alignment_
    diarization.py:29``): the nested ``segments_field`` column is replaced
    by segments carrying ``text`` + ``words``. Pure per-row transform —
    plain task-pool ``map_batches``, no state, no shuffle."""

    merged_type = pa.list_(
        pa.struct(
            [
                ("start", pa.float64()),
                ("end", pa.float64()),
                ("speaker", pa.string()),
                ("text", pa.string()),
                (
                    "words",
                    pa.list_(
                        pa.struct(
                            [
                                ("word", pa.string()),
                                ("start", pa.float64()),
                                ("end", pa.float64()),
                            ]
                        )
                    ),
                ),
            ]
        )
    )

    def fn(batch: pa.Table) -> pa.Table:
        aligns = batch.column(alignment_field).to_pylist()
        segs = batch.column(segments_field).to_pylist()
        merged = [
            None if s is None else align_words_to_segments(a or [], s)
            for a, s in zip(aligns, segs)
        ]
        idx = batch.schema.get_field_index(segments_field)
        return batch.set_column(idx, segments_field, pa.array(merged, merged_type))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# conversion + synthetic derivation
# --------------------------------------------------------------------------

_PAYLOAD_COLUMNS = ("audio", "waveform", "audio_data", "audio_array", "segments")


def audio_to_documents(ds):
    """Drop payload columns so downstream text stages see a document table
    (reference ``AudioToDocumentStage``, ``io/convert.py:38-90`` — its
    ``_NON_SERIALIZABLE_KEYS`` strip becomes a column projection)."""
    keep = [c for c in ds.schema().names if c not in _PAYLOAD_COLUMNS]
    return ds.select_columns(keep)


def derive_audio_table(
    ds,
    text_field: str = "text",
    id_field: str = "doc_id",
    with_audio: bool = False,
    ref_chars: int = 80,
):
    """Deterministically derive an audio-manifest table from a text corpus
    for tests/benchmarks (the sandbox ships no audio; same pattern as
    ``omni.derive_ocr_table``). Per document:

    - ``text``     = first ``ref_chars`` chars of the whitespace-collapsed,
      lowercased document text (the transcript);
    - ``pred_text``= the transcript with every ``e`` removed (a fixed,
      SQL-expressible "ASR corruption" so CER/WER are nonzero);
    - ``audio``    = (``with_audio``) a PCM16 WAV whose frame count is the
      SQL-expressible rule ``((len(text) % 50) + 10) * 16`` at 16 kHz —
      tiny payloads whose *parsed* duration an oracle can recompute.
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_field)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.fill_null("") if texts.null_count else texts
        collapsed = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(texts), r"\s+", " ")
        )
        ref = pc.utf8_slice_codeunits(collapsed, 0, ref_chars)
        hyp = pc.replace_substring(ref, "e", "")
        cols = {
            "audio_id": batch.column(id_field).cast(pa.string()),
            "text": ref.cast(pa.string()),
            "pred_text": hyp.cast(pa.string()),
        }
        if with_audio:
            lens = pc.utf8_length(ref).to_numpy(zero_copy_only=False)
            blobs = []
            for ln in lens:
                frames = (int(ln) % 50 + 10) * 16
                # deterministic low-cost ramp payload (content irrelevant to
                # the duration rule; the header math is what's under test)
                samples = ((np.arange(frames) % 256) - 128).astype(np.int16) * 64
                blobs.append(encode_wav(samples, _TONE_RATE))
            cols["audio"] = pa.array(blobs, pa.binary())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def derive_asr_corpus(
    ds,
    id_field: str = "doc_id",
    words_per_utt: int = 8,
    drop_every: int = 5,
):
    """Derive a tone-codec speech corpus: per document a seeded sequence of
    ``words_per_utt`` vocabulary words becomes the reference transcript and
    its synthesized waveform. Every ``drop_every``-th row's audio drops the
    third word (a deterministic corruption), so downstream ASR -> WER shows
    exactly ``1/words_per_utt`` error on those rows and 0 elsewhere."""
    from .ids import hash_ids_from_strings

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_field).cast(pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        seeds = hash_ids_from_strings(ids).view(np.uint64)
        texts, blobs, corrupted = [], [], []
        for i, seed in enumerate(seeds):
            rng = np.random.default_rng(int(seed))
            widx = rng.integers(0, len(TONE_VOCAB), size=words_per_utt)
            texts.append(" ".join(TONE_VOCAB[w] for w in widx))
            drop = int(seed) % drop_every == 0
            corrupted.append(drop)
            emit = np.delete(widx, 2) if drop else widx
            blobs.append(synth_speech(emit))
        return pa.table(
            {
                "audio_id": ids,
                "text": pa.array(texts, pa.string()),
                "audio": pa.array(blobs, pa.binary()),
                "corrupted": pa.array(corrupted, pa.bool_()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
