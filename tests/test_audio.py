"""Audio family: WAV codec, edit-distance/WER, bandwidth, tone ASR, filters."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.functions.editdist import (
    char_distance_batch,
    edit_ops,
    error_rate_detail,
    levenshtein,
)
from curator_ray.functions.wav import decode_wav, encode_wav, wav_info
from curator_ray.stages.audio import (
    TONE_VOCAB,
    ToneAsrModel,
    clean_text,
    estimate_bandwidth,
    synth_speech,
)


# ---------------------------------------------------------------- WAV codec


def test_wav_roundtrip_pcm16():
    rate = 16000
    x = (np.sin(2 * np.pi * 440 * np.arange(rate) / rate) * 0.5).astype(np.float64)
    b = encode_wav(x, rate)
    info = wav_info(b)
    assert (info.sample_rate, info.frames, info.channels, info.bits) == (rate, rate, 1, 16)
    assert info.duration == pytest.approx(1.0)
    y, r = decode_wav(b)
    assert r == rate
    assert np.max(np.abs(y - x)) < 1.0 / 32000  # PCM16 quantization bound


def test_wav_info_header_only_and_stdlib_parity():
    import io
    import wave

    rate, n = 8000, 1234
    samples = (np.arange(n) % 100).astype(np.int16)
    b = encode_wav(samples, rate)
    with wave.open(io.BytesIO(b)) as w:  # CPython's reader accepts our writer
        assert w.getframerate() == rate and w.getnframes() == n
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
    assert wav_info(b).frames == n


def test_wav_float32_and_stereo():
    import struct

    # hand-build a float32 stereo file: fmt tag 3, 2 channels
    rate, n = 22050, 100
    left = np.linspace(-1, 1, n, dtype=np.float32)
    right = -left
    inter = np.empty(2 * n, dtype=np.float32)
    inter[0::2], inter[1::2] = left, right
    data = inter.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 3, 2, rate, rate * 8, 8, 32,
        b"data", len(data),
    )
    info = wav_info(hdr + data)
    assert (info.fmt, info.channels, info.frames) == (3, 2, n)
    mono, r = decode_wav(hdr + data)
    assert r == rate and np.allclose(mono, 0.0, atol=1e-7)  # L+R cancel


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        wav_info(b"not a wav at all")


# ---------------------------------------------------------- edit distance


def test_levenshtein_matches_bruteforce():
    import itertools

    def brute(a, b):
        d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            d[i][0] = i
        for j in range(len(b) + 1):
            d[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    rng = np.random.default_rng(7)
    for _ in range(60):
        a = "".join(rng.choice(list("abcd"), size=rng.integers(0, 9)))
        b = "".join(rng.choice(list("abcd"), size=rng.integers(0, 9)))
        got = levenshtein(np.array(list(a), dtype=object), np.array(list(b), dtype=object))
        assert got == brute(a, b), (a, b)
    # duckdb parity on a few text pairs (the oracle the query rides on)
    import duckdb

    pairs = [("kitten", "sitting"), ("hello world", "hllo world"), ("", "abc")]
    for h, r in pairs:
        (want,) = duckdb.sql(f"select levenshtein('{h}', '{r}')").fetchone()
        assert char_distance_batch([h], [r])[0] == want


def test_edit_ops_decomposition():
    dist, ins, dele, subs = edit_ops(list("sitting"), list("kitten"))
    assert (dist, ins + dele + subs) == (3, 3)
    assert subs == 2 and ins == 1  # classic kitten->sitting alignment
    # pure insertion / deletion cases
    assert edit_ops(list("abcd"), list("ad"))[1] == 2  # hyp has 2 extra
    assert edit_ops(list("ad"), list("abcd"))[2] == 2  # ref has 2 missing


def test_error_rate_detail_wer():
    out = error_rate_detail(["the cat sat"], ["the black cat sat"], use_cer=False)
    assert out["tokens"][0] == 4
    assert out["rate"][0] == pytest.approx(0.25)  # one deletion / 4 ref words
    assert out["del_rate"][0] == pytest.approx(0.25)
    assert out["ins_rate"][0] == 0 and out["sub_rate"][0] == 0
    # empty-reference convention
    e = error_rate_detail(["x", ""], ["", ""], use_cer=False)
    assert np.isinf(e["rate"][0]) and e["rate"][1] == 0.0


def test_clean_text_matches_reference_rules():
    assert clean_text("Hello—World: A_B/C") == "hello—world a b c"
    assert clean_text('He said "YES"', retain_pncs=True) == "He said YES"
    # the reference's replace_with_blank pass runs before its apostrophe pass,
    # so curly apostrophes are deleted in the no-punct variant …
    assert clean_text("don’t") == "dont"
    assert clean_text("ʻokina ‘quote") == "okina quote"
    # … but retained (as ASCII ') for U+2019 in the punct-retaining variant
    assert clean_text("don’t", retain_pncs=True) == "don't"
    assert clean_text("ʻokina", retain_pncs=True) == "okina"


# ----------------------------------------------------------- bandwidth


def test_bandwidth_sine_tones():
    rate = 16000
    t = np.arange(rate) / rate
    for f0 in (1000.0, 3000.0, 6000.0):
        x = 0.5 * np.sin(2 * np.pi * f0 * t)
        bw = estimate_bandwidth(x, rate)
        # peak bin must sit at f0 (+/- one 31.25 Hz bin); the -50 dB skirt of
        # a windowed sine extends a few bins beyond it
        assert f0 - 62.5 <= bw <= f0 + 500, (f0, bw)


def test_bandwidth_fullband_noise():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.3, size=16000)
    bw = estimate_bandwidth(x, 16000)
    assert bw > 7000  # white noise fills the spectrum to ~Nyquist


# ----------------------------------------------------------- tone ASR


def test_tone_codec_roundtrip():
    words = np.array([0, 5, 63, 17], dtype=np.int64)
    b = synth_speech(words)
    audio, rate = decode_wav(b)
    got = ToneAsrModel().transcribe_array(audio, rate)
    assert got == " ".join(TONE_VOCAB[w] for w in words)


# -------------------------------------------------------- Ray pipelines


@pytest.mark.usefixtures("ray_session")
def test_duration_wer_filter_pipeline():
    import ray

    from curator_ray.stages.audio import (
        audio_duration_stage,
        audio_to_documents,
        preserve_by_value_stage,
        wer_stage,
    )
    from curator_ray.functions.wav import encode_wav

    rows = pa.table(
        {
            "audio_id": ["a", "b", "c"],
            "audio": [
                encode_wav(np.zeros(16000, dtype=np.int16), 16000),  # 1.0 s
                encode_wav(np.zeros(4000, dtype=np.int16), 16000),  # 0.25 s
                b"broken",
            ],
            "text": ["the cat sat", "hello world", "x"],
            "pred_text": ["the cat sat", "hallo world", "x"],
        }
    )
    ds = audio_duration_stage(ray.data.from_arrow(rows))
    ds = wer_stage(ds, duration_field="duration", clean=False)
    out = ds.to_pandas().set_index("audio_id")
    assert out.loc["a", "duration"] == pytest.approx(1.0)
    assert out.loc["b", "duration"] == pytest.approx(0.25)
    assert out.loc["c", "duration"] == -1.0
    assert out.loc["a", "wer"] == 0.0
    assert out.loc["b", "wer"] == pytest.approx(0.5)  # 1 sub / 2 words
    assert out.loc["b", "cer_dist"] == 1
    assert out.loc["a", "char_rate"] == pytest.approx(9 / 1.0)
    kept = preserve_by_value_stage(
        audio_duration_stage(ray.data.from_arrow(rows)), "duration", 0.5, "ge"
    )
    assert sorted(r["audio_id"] for r in kept.take_all()) == ["a"]
    docs = audio_to_documents(ds)
    assert "audio" not in docs.schema().names


@pytest.mark.usefixtures("ray_session")
def test_asr_to_wer_end_to_end():
    import ray

    from curator_ray.stages.audio import (
        asr_inference_stage,
        derive_asr_corpus,
        pairwise_wer_stage,
    )

    docs = pa.table({"doc_id": [f"d{i}" for i in range(40)]})
    corpus = derive_asr_corpus(ray.data.from_arrow(docs), words_per_utt=8, drop_every=5)
    out = pairwise_wer_stage(asr_inference_stage(corpus)).to_pandas()
    clean = out[~out.corrupted]
    dirty = out[out.corrupted]
    assert len(dirty) > 0 and len(clean) > 0
    assert (clean.wer_pct == 0.0).all()  # tone decode is exact on clean audio
    assert (dirty.wer_pct == 12.5).all()  # 1 dropped of 8 words, exactly


@pytest.mark.usefixtures("ray_session")
def test_bandwidth_stage_over_table():
    import ray

    from curator_ray.stages.audio import bandwidth_stage

    rate = 16000
    t = np.arange(rate // 2) / rate

    def tone(f):
        return encode_wav(0.5 * np.sin(2 * np.pi * f * t), rate)

    rows = pa.table(
        {"audio_id": ["lo", "hi"], "audio": [tone(1000.0), tone(5000.0)]}
    )
    out = (
        bandwidth_stage(ray.data.from_arrow(rows), concurrency=(1, 2))
        .to_pandas()
        .set_index("audio_id")
    )
    assert out.loc["lo", "bandwidth"] < out.loc["hi", "bandwidth"]
    assert 900 <= out.loc["lo", "bandwidth"] <= 1600


@pytest.mark.usefixtures("ray_session")
def test_derive_audio_table_duration_rule():
    import ray

    from curator_ray.stages.audio import audio_duration_stage, derive_audio_table

    docs = pa.table(
        {
            "doc_id": ["p", "q"],
            "text": ["  Some   MIXED case TEXT here  ", "Z" * 500],
        }
    )
    tbl = derive_audio_table(ray.data.from_arrow(docs), with_audio=True)
    out = audio_duration_stage(tbl).to_pandas().set_index("audio_id")
    ref_p = "some mixed case text here"
    assert out.loc["p", "text"] == ref_p
    assert out.loc["p", "pred_text"] == ref_p.replace("e", "")
    want = ((len(ref_p) % 50) + 10) * 16 / 16000.0
    assert out.loc["p", "duration"] == pytest.approx(want)
    assert out.loc["q", "text"] == "z" * 80  # ref_chars cap


# ----------------------------------------------------------- VAD segmentation


def test_energy_vad_intervals_tone_words():
    from curator_ray.stages.audio import energy_vad_intervals

    words = np.array([3, 10, 40], dtype=np.int64)
    audio, rate = decode_wav(synth_speech(words))
    ivals = energy_vad_intervals(audio, rate, min_silence_ms=10)
    assert len(ivals) == 3  # 20 ms gaps >= 10 ms silence -> one per word
    durs = (ivals[:, 1] - ivals[:, 0]) / 1000.0
    assert np.all(np.abs(durs - 0.08) < 0.03)
    merged = energy_vad_intervals(audio, rate, min_silence_ms=50)
    assert len(merged) == 1  # 20 ms gaps < 50 ms -> all merged
    # max-duration split of the merged run
    split = energy_vad_intervals(audio, rate, min_silence_ms=50, max_duration_s=0.1)
    assert len(split) >= 2
    assert len(energy_vad_intervals(np.zeros(16000), 16000)) == 0  # silence


@pytest.mark.usefixtures("ray_session")
def test_vad_to_asr_per_segment():
    import ray

    from curator_ray.stages.audio import (
        asr_inference_stage,
        vad_segmentation_stage,
    )

    words = np.array([5, 17, 60], dtype=np.int64)
    rows = pa.table({"audio_id": ["u1"], "audio": [synth_speech(words)]})
    segs = vad_segmentation_stage(
        ray.data.from_arrow(rows), min_silence_ms=10, concurrency=(1, 2)
    )
    out = asr_inference_stage(segs, concurrency=(1, 2)).to_pandas().sort_values("segment_num")
    assert len(out) == 3
    assert (out.end_ms > out.start_ms).all()
    # each segment decodes to exactly its word
    assert list(out.pred_text) == [TONE_VOCAB[w] for w in words]


def test_vad_model_path_gated():
    from curator_ray.stages.audio import VadSegmentation

    with pytest.raises(ImportError, match="energy-threshold"):
        VadSegmentation(model_name="silero_vad")


# ----------------------------------------------------------- band filter


def test_band_energy_features_scale_invariant_and_shape():
    from curator_ray.stages.audio import BAND_DEFINITIONS, band_energy_features

    assert len(BAND_DEFINITIONS) == 24  # reference band table
    rate = 48000
    rng = np.random.default_rng(5)
    noise = rng.normal(0, 0.3, rate)
    f1 = band_energy_features(noise, rate)
    f2 = band_energy_features(noise * 7.3, rate)  # LUFS-normalization no-op
    assert all(abs(f1[k] - f2[k]) < 1e-9 for k in f1)
    tone = 0.5 * np.sin(2 * np.pi * 1500 * np.arange(rate) / rate)
    ft = band_energy_features(tone, rate)
    assert ft["band_energy_low2"] > -30  # the tone's band is near the peak
    assert ft["band_energy_high3"] < -100  # far bands are empty
    # bands above Nyquist at 16 kHz input collapse to the floor
    f16 = band_energy_features(tone[:16000], 16000)
    assert f16["band_energy_high10"] == -120.0


@pytest.mark.usefixtures("ray_session")
def test_band_filter_stage_separates():
    import ray

    from curator_ray.stages.audio import band_filter_stage

    rate = 48000
    rng = np.random.default_rng(9)
    rows = pa.table(
        {
            "audio_id": ["wide", "narrow", "bad"],
            "audio": [
                encode_wav(rng.normal(0, 0.3, rate), rate),
                encode_wav(0.5 * np.sin(2 * np.pi * 800 * np.arange(rate) / rate), rate),
                b"junk",
            ],
        }
    )
    kept = band_filter_stage(ray.data.from_arrow(rows), concurrency=(1, 2)).to_pandas()
    assert list(kept.audio_id) == ["wide"]
    assert list(kept.band_label) == ["full_band"]


def test_band_predictor_model_path_gated():
    from curator_ray.stages.audio import BandPredictor

    try:
        import joblib  # noqa: F401

        pytest.skip("joblib present: gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="rule-based"):
        BandPredictor(model_path="/tmp/nonexistent.joblib")


# ----------------------------------------------------------- ALM windows


def _seg(s, e, spk, bw=16000, text="t"):
    return {"start": s, "end": e, "speaker": spk, "bandwidth": bw, "text": text}


def test_build_alm_windows_basic():
    from curator_ray.stages.audio import build_alm_windows

    # two speakers alternating 30 s segments: window from segment 0 spans
    # 4 segments = 120 s exactly
    segs = [_seg(i * 30.0, (i + 1) * 30.0, f"spk{i % 2}") for i in range(8)]
    wins = build_alm_windows(segs, 16000)
    assert len(wins) > 0
    w = wins[0]
    assert w["window_start"] == 0.0
    assert 108.0 <= w["window_end"] - w["window_start"] <= 132.0
    assert w["n_segments"] >= 2
    assert len(w["speaker_durations"]) == 5
    assert w["speaker_durations"][2] == 0.0  # only 2 speakers -> padded

    # low sample rate rejects everything (reference lost_sr path)
    assert build_alm_windows(segs, 8000) == []
    # single-speaker windows fail min_speakers
    mono = [_seg(i * 30.0, (i + 1) * 30.0, "only") for i in range(8)]
    assert build_alm_windows(mono, 16000) == []
    # low-bandwidth segments break the window chain
    bad_bw = [_seg(i * 30.0, (i + 1) * 30.0, f"spk{i % 2}", bw=4000) for i in range(8)]
    assert build_alm_windows(bad_bw, 16000) == []
    # a no-speaker region blocks windows that would span it (the reference
    # marks unlabeled regions with the literal "no-speaker" speaker value)
    with_gap = [
        _seg(0.0, 50.0, "a"), _seg(50.0, 100.0, "no-speaker"), _seg(100.0, 130.0, "b"),
    ]
    assert build_alm_windows(with_gap, 16000) == []


def test_build_alm_windows_word_truncation():
    from curator_ray.stages.audio import build_alm_windows

    words = [{"word": f"w{i}", "end": 100.0 + i * 5.0} for i in range(1, 7)]
    segs = [
        _seg(0.0, 60.0, "a"),
        _seg(60.0, 100.0, "b"),
        {**_seg(100.0, 160.0, "a", text="long tail"), "words": words},
    ]
    wins = build_alm_windows(segs, 16000, target_window_duration=120.0)
    assert len(wins) == 1
    w = wins[0]
    # truncated at the last word ending <= 132 (tolerance band upper edge):
    # w6 ends at 130 <= 132 so all six words survive, window ends there
    assert w["window_end"] == 130.0
    assert w["text"].endswith("w6")
    assert w["n_segments"] == 3


@pytest.mark.usefixtures("ray_session")
def test_alm_window_stage_fanout():
    import ray

    from curator_ray.stages.audio import alm_window_stage

    seg_type = pa.list_(
        pa.struct(
            [("start", pa.float64()), ("end", pa.float64()), ("speaker", pa.string()),
             ("bandwidth", pa.int64()), ("text", pa.string())]
        )
    )
    good = [
        {"start": i * 30.0, "end": (i + 1) * 30.0, "speaker": f"s{i % 3}",
         "bandwidth": 16000, "text": f"seg{i}"}
        for i in range(8)
    ]
    rows = pa.table(
        {
            "audio_id": ["u1", "u2"],
            "sample_rate": pa.array([16000, 8000], pa.int64()),
            "segments": pa.array([good, good], seg_type),
        }
    )
    out = alm_window_stage(ray.data.from_arrow(rows)).to_pandas()
    assert set(out.audio_id) == {"u1"}  # u2 fails the sample-rate gate
    assert (out.n_segments >= 2).all()
    assert all(len(d) == 5 for d in out.speaker_durations)


# ----------------------------------------- model-gated quality + diarization


def test_sigmos_threshold_logic_matches_reference():
    from curator_ray.stages.audio import SIGMOS_KEYS, check_sigmos_thresholds

    scores = dict.fromkeys(SIGMOS_KEYS, 4.2)
    thr = {"noise": 4.0, "ovrl": 3.5, "sig": None, "col": None, "disc": None,
           "loud": None, "reverb": None}
    ok, fails = check_sigmos_thresholds(scores, thr)
    assert ok and fails == []
    scores["noise"] = 3.9
    scores["ovrl"] = 3.4
    ok, fails = check_sigmos_thresholds(scores, thr)
    assert not ok
    assert fails == ["NOISE 3.900 < 4.0", "OVRL 3.400 < 3.5"]
    # None disables a check even for terrible scores (sigmos.py:276-279)
    scores["sig"] = 0.0
    assert check_sigmos_thresholds(scores, {**thr, "noise": None, "ovrl": None})[0]


def test_quality_gates_raise_informative_importerrors():
    from curator_ray.stages.audio import (
        SigmosFilter,
        SpeakerDiarization,
        SquimMetrics,
        UtmosFilter,
    )

    with pytest.raises(ImportError, match="scores_fn"):
        SigmosFilter()
    with pytest.raises(ImportError, match="scores_fn"):
        UtmosFilter()
    with pytest.raises(ImportError, match="scores_fn"):
        SquimMetrics()
    with pytest.raises(ImportError, match="segments_fn"):
        SpeakerDiarization()


@pytest.mark.usefixtures("ray_session")
def test_sigmos_utmos_squim_diarization_stages():
    import ray

    from curator_ray.stages.audio import (
        diarization_stage,
        energy_vad_intervals,
        sigmos_filter_stage,
        squim_metrics_stage,
        utmos_filter_stage,
    )
    from curator_ray.functions.wav import encode_wav

    rate = 16000
    t = np.arange(rate) / rate
    loud = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), rate)
    quiet = encode_wav(0.01 * np.sin(2 * np.pi * 440 * t), rate)
    rows = pa.table(
        {"audio_id": ["loud", "quiet", "bad"],
         "audio": pa.array([loud, quiet, b"junk"], pa.binary())}
    )

    def _rms_mos(audio, rate):
        # deterministic injected scorer: louder -> higher MOS on every axis
        # (defined inside the test so cloudpickle ships it by value — Ray
        # workers cannot import the pytest-rewritten test module)
        from curator_ray.stages.audio import SIGMOS_KEYS

        rms = float(np.sqrt((audio**2).mean()))
        return dict.fromkeys(SIGMOS_KEYS, round(1.0 + 4.0 * min(rms * 4.0, 1.0), 3))

    kept = sigmos_filter_stage(
        ray.data.from_arrow(rows), scores_fn=_rms_mos, concurrency=(1, 1)
    ).to_pandas()
    # loud scores ~4.9 on every axis -> passes noise>=4.0/ovrl>=3.5;
    # quiet ~1.2 fails; undecodable row drops with a load-failure reason
    assert list(kept.audio_id) == ["loud"]
    assert kept.iloc[0].sigmos_noise >= 4.0
    assert kept.iloc[0].sigmos_fail_reasons is None

    mos = utmos_filter_stage(
        ray.data.from_arrow(rows),
        scores_fn=lambda a, r: 1.0 + 4.0 * min(float(np.sqrt((a**2).mean())) * 4.0, 1.0),
        concurrency=(1, 1),
    ).to_pandas()
    assert list(mos.audio_id) == ["loud"]
    assert mos.iloc[0].utmos_mos >= 3.5

    sq = squim_metrics_stage(
        ray.data.from_arrow(rows),
        scores_fn=lambda a, r: (4.1234, 0.98765, 20.5),
        concurrency=(1, 1),
    ).to_pandas().set_index("audio_id")
    # metrics stage keeps every row; values round to 3 decimals (squim.py:122)
    assert len(sq) == 3
    assert sq.loc["loud", "pesq_squim"] == 4.123
    assert sq.loc["loud", "stoi_squim"] == 0.988
    assert np.isnan(sq.loc["bad", "pesq_squim"])

    def vad_segments(audio, rate):
        return [
            {"start": s, "end": e, "speaker": "speaker_0"}
            for s, e in energy_vad_intervals(audio, rate)
        ]

    # nested list<struct> column: collect rows (to_pandas would try a
    # tensor-extension cast on the ragged column)
    di = {
        r["audio_id"]: r["diar_segments"]
        for r in diarization_stage(
            ray.data.from_arrow(rows), segments_fn=vad_segments, concurrency=(1, 1)
        ).take_all()
    }
    assert len(di) == 3
    segs = di["loud"]
    assert len(segs) >= 1 and segs[0]["speaker"] == "speaker_0"
    assert di["bad"] is None


def test_align_words_to_segments_reference_semantics():
    from curator_ray.stages.audio import align_words_to_segments

    def w(word, s, e):
        return {"word": word, "start": s, "end": e}

    segments = [
        {"speaker": "sp0", "start": 0.0, "end": 3.0},
        {"speaker": "sp1", "start": 3.0, "end": 6.0},
    ]
    alignment = [
        w("inside", 0.5, 1.0),           # fully inside seg0
        w("straddle-cur", 2.5, 3.4),     # overlaps seg0 by .5, seg1 by .4 -> seg0
        w("straddle-next", 2.9, 3.8),    # overlaps seg0 by .1, seg1 by .8 -> seg1
        w("in-next", 4.0, 5.0),
        w("after-all", 7.0, 8.0),        # past the last segment: gap, skipped
    ]
    merged = align_words_to_segments(alignment, segments)
    assert merged[0]["text"] == "inside straddle-cur"
    assert merged[1]["text"] == "straddle-next in-next"
    assert [x["word"] for x in merged[1]["words"]] == ["straddle-next", "in-next"]
    # inputs not mutated (columnar rows are immutable)
    assert "text" not in segments[0]

    # tie goes to the current segment (cur >= nxt)
    tie = align_words_to_segments([w("tie", 2.8, 3.2)], segments)
    assert tie[0]["text"] == "tie" and tie[1]["text"] == ""

    # gap word between segments is skipped
    gapped = align_words_to_segments(
        [w("gap", 3.2, 3.4)],
        [{"speaker": "a", "start": 0.0, "end": 3.0},
         {"speaker": "b", "start": 4.0, "end": 6.0}],
    )
    assert gapped[0]["text"] == "" and gapped[1]["text"] == ""

    # empty alignment -> empty text fields on every segment
    empty = align_words_to_segments([], segments)
    assert all(s["text"] == "" and s["words"] == [] for s in empty)


@pytest.mark.usefixtures("ray_session")
def test_merge_alignment_diarization_stage():
    import ray

    from curator_ray.stages.audio import merge_alignment_diarization_stage

    rows = pa.table(
        {
            "audio_id": ["u1", "u2"],
            "alignment": [
                [{"word": "hi", "start": 0.2, "end": 0.6},
                 {"word": "there", "start": 0.7, "end": 1.1}],
                [],
            ],
            "diar_segments": [
                [{"start": 0.0, "end": 1.5, "speaker": "speaker_0"}],
                [{"start": 0.0, "end": 2.0, "speaker": "speaker_1"}],
            ],
        }
    )
    out = {
        r["audio_id"]: r["diar_segments"]
        for r in merge_alignment_diarization_stage(ray.data.from_arrow(rows)).take_all()
    }
    assert out["u1"][0]["text"] == "hi there"
    assert [x["word"] for x in out["u1"][0]["words"]] == ["hi", "there"]
    assert out["u1"][0]["speaker"] == "speaker_0"
    assert out["u2"][0]["text"] == "" and out["u2"][0]["words"] == []


def test_parse_diar_segments_and_rttm():
    from curator_ray.stages.audio import parse_diar_segments, rttm_from_segments

    class Obj:
        start, end, speaker = 1.0, 2.0, "sp3"

    segs = parse_diar_segments(
        ["0.0 1.5 speaker_0", "1.5 2.0", {"start": 2, "end": 3, "speaker": "sp2"}, Obj()]
    )
    assert segs[0] == {"start": 0.0, "end": 1.5, "speaker": "speaker_0"}
    assert segs[1]["speaker"] == "unknown"
    assert segs[2] == {"start": 2.0, "end": 3.0, "speaker": "sp2"}
    assert segs[3] == {"start": 1.0, "end": 2.0, "speaker": "sp3"}

    rttm = rttm_from_segments(
        [{"start": 0.0, "end": 1.5, "speaker": "speaker_0"},
         {"start": 2.0, "end": 2.0, "speaker": "degenerate"},  # skipped
         {"start": 2.25, "end": 3.0, "speaker": "speaker_1"}],
        "sess1",
    )
    assert rttm == (
        "SPEAKER sess1 1 0.000 1.500 <NA> <NA> speaker_0 <NA> <NA>\n"
        "SPEAKER sess1 1 2.250 0.750 <NA> <NA> speaker_1 <NA> <NA>\n"
    )
    assert rttm_from_segments([], "x") == ""


@pytest.mark.usefixtures("ray_session")
def test_rttm_stage():
    import ray

    from curator_ray.stages.audio import rttm_stage

    rows = pa.table(
        {
            "audio_id": ["u1"],
            "diar_segments": [[{"start": 0.0, "end": 1.0, "speaker": "speaker_0"}]],
        }
    )
    out = rttm_stage(ray.data.from_arrow(rows)).take_all()
    assert out[0]["rttm"] == "SPEAKER u1 1 0.000 1.000 <NA> <NA> speaker_0 <NA> <NA>\n"
