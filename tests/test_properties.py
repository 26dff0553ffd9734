"""Hypothesis property tests over the pure kernel layer.

The reference's test strategy (SURVEY.md §5) leans on parametrized sweeps;
this module adds generative coverage for the invariants the distributed
stages rely on: the winnowing guarantee (any shared substring of length
>= L + w - 1 shares a fingerprint — stages/substring.py's correctness
contract), suffix-array/LCP correctness (stages/suffix_global.py's kernel),
codec roundtrips (the PSNR>=40 per-row invariant from BASELINE input_hint),
edit-distance metric axioms (audio WER/CER), key-packing order preservation
(removal broadcast lookups), and minhash monotonicity (LSH banding).

No Ray: every test here is a pure-function property, so the whole module
runs in milliseconds-per-example and keeps the suite's Ray session untouched.
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from curator_ray.functions.editdist import char_distance_batch, edit_ops, levenshtein
from curator_ray.functions.jpeg import decode_jpeg, encode_jpeg
from curator_ray.functions.minhash_kernel import generate_seeds, minhash_signatures
from curator_ray.functions.packkeys import lookup_sorted, pack_u128
from curator_ray.functions.phash import hamming64, popcount64
from curator_ray.functions.png import decode_png, encode_png, psnr
from curator_ray.functions.suffix_array import cross_doc_repeated_spans, lcp_array, suffix_array
from curator_ray.functions.wav import decode_wav, encode_wav
from curator_ray.functions.winnow import batch_fingerprints, doc_fingerprints, window_hashes

# Shared example budget: enough to explore, small enough that the module
# stays a sub-minute add to the suite.
FAST = settings(max_examples=60, deadline=None)
SLOW = settings(max_examples=20, deadline=None)

ascii_text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80)


# ---------------------------------------------------------------- winnowing


@FAST
@given(
    pattern=st.binary(min_size=16, max_size=40),
    pre_a=st.binary(max_size=60),
    post_a=st.binary(max_size=60),
    pre_b=st.binary(max_size=60),
    post_b=st.binary(max_size=60),
)
def test_winnow_guarantee(pattern, pre_a, post_a, pre_b, post_b):
    """Two docs sharing a substring of length >= fp_len + w - 1 MUST share a
    winnowed fingerprint (Schleimer et al. guarantee; fp_len=8, w=8 needs a
    16-byte shared span — `pattern` provides at least that)."""
    a = pre_a + pattern + post_a
    b = pre_b + pattern + post_b
    # latin-1 is a byte-transparent decode, so the planted span survives
    # the utf-8 re-encode inside doc_fingerprints byte-for-byte.
    fa = doc_fingerprints(a.decode("latin-1"), 8, winnow_window=8)
    fb = doc_fingerprints(b.decode("latin-1"), 8, winnow_window=8)
    assert len(np.intersect1d(fa, fb)) > 0


@FAST
@given(pattern=st.binary(min_size=8, max_size=24), gap=st.binary(min_size=1, max_size=40))
def test_window_hash_position_invariance(pattern, gap):
    """Equal L-byte windows hash equally regardless of position (the rolling
    hash depends only on window content)."""
    data = np.frombuffer(pattern + gap + pattern, dtype=np.uint8)
    L = len(pattern)
    h = window_hashes(data, L)
    assert h[0] == h[len(pattern) + len(gap)]


@FAST
@given(texts=st.lists(ascii_text, max_size=6), fp_len=st.integers(4, 12))
def test_batch_fingerprints_matches_per_doc(texts, fp_len):
    """batch_fingerprints' single global scan selects exactly what per-doc
    doc_fingerprints selects (the claim its docstring makes)."""
    fps, doc_idx = batch_fingerprints(texts, fp_len, winnow_window=4)
    for d, t in enumerate(texts):
        got = np.sort(fps[doc_idx == d])
        want = np.sort(doc_fingerprints(t, fp_len, winnow_window=4))
        np.testing.assert_array_equal(got, want)


# ------------------------------------------------------------ edit distance


def _oracle_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@FAST
@given(a=ascii_text, b=ascii_text)
def test_levenshtein_oracle_and_axioms(a, b):
    xa = np.array(list(a), dtype=object)
    xb = np.array(list(b), dtype=object)
    d = levenshtein(xa, xb)
    assert d == _oracle_lev(a, b)
    assert d == levenshtein(xb, xa)  # symmetry
    assert (d == 0) == (a == b)  # identity of indiscernibles
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))  # bounds


@FAST
@given(a=ascii_text, b=ascii_text, c=ascii_text)
def test_levenshtein_triangle(a, b, c):
    xa, xb, xc = (np.array(list(s), dtype=object) for s in (a, b, c))
    assert levenshtein(xa, xc) <= levenshtein(xa, xb) + levenshtein(xb, xc)


@FAST
@given(a=st.lists(st.sampled_from("ab cd".split()), max_size=12), b=st.lists(st.sampled_from("ab cd ef".split()), max_size=12))
def test_edit_ops_decomposition(a, b):
    """The backtrace decomposition satisfies S + D + I = distance and the
    length identity len(hyp) - len(ref) = I - D."""
    d, ins, dele, sub = edit_ops(a, b)
    assert d == levenshtein(np.array(a, dtype=object), np.array(b, dtype=object))
    assert sub + dele + ins == d
    assert len(a) - len(b) == ins - dele


@SLOW
@given(pairs=st.lists(st.tuples(ascii_text, ascii_text), max_size=8))
def test_char_distance_batch_matches_scalar(pairs):
    hyps = [h for h, _ in pairs]
    refs = [r for _, r in pairs]
    out = char_distance_batch(hyps, refs)
    for k, (h, r) in enumerate(pairs):
        assert out[k] == _oracle_lev(h, r)


# ----------------------------------------------------------------- codecs


@FAST
@given(
    n=st.integers(1, 400),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_int16_roundtrip_exact(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n, dtype=np.int16)
    decoded, sr = decode_wav(encode_wav(samples, rate))
    assert sr == rate
    np.testing.assert_array_equal((decoded * 32768.0).astype(np.int16), samples)


@FAST
@given(n=st.integers(1, 400), seed=st.integers(0, 2**32 - 1))
def test_wav_float_roundtrip_quantized(n, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1.0, 1.0, n)
    decoded, _ = decode_wav(encode_wav(samples, 16000))
    # encode quantizes by round(x*32767), decode scales by 1/32768 (the
    # librosa convention), so the roundtrip carries a |x|/32768 scale bias on
    # top of the half-step quantization error
    assert np.abs(decoded - samples).max() <= 1.5 / 32768.0


@SLOW
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**32 - 1))
def test_png_roundtrip_exact(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(px)), px)


@SLOW
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_smooth_image_psnr(h, w, seed):
    """Odd/non-multiple-of-8 shapes survive, and smooth content at q=90
    clears the BASELINE per-row invariant bar (PSNR >= 40 for lossy)."""
    rng = np.random.default_rng(seed)
    # low-frequency content: outer product of ramps + per-channel offset
    ramp = np.outer(np.linspace(0, 1, h), np.linspace(0, 1, w))
    px = np.stack([ramp * rng.uniform(80, 160) + rng.uniform(40, 90) for _ in range(3)], axis=-1)
    px = np.clip(px, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == px.shape
    assert psnr(out, px) >= 40.0


@SLOW
@given(h=st.integers(1, 20), w=st.integers(1, 20), seed=st.integers(0, 2**32 - 1))
def test_jpeg_noise_shape_preserved(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(px, quality=50)).shape == px.shape


# ----------------------------------------------------------- suffix arrays


@FAST
@given(data=st.lists(st.integers(0, 3), max_size=48))
def test_suffix_array_sorts_all_suffixes(data):
    arr = np.array(data, dtype=np.int64)
    sa = suffix_array(arr)
    suffixes = sorted(range(len(arr)), key=lambda i: tuple(arr[i:]))
    np.testing.assert_array_equal(sa, np.array(suffixes, dtype=np.int64))


@FAST
@given(data=st.lists(st.integers(0, 2), max_size=40))
def test_lcp_array_matches_naive(data):
    arr = np.array(data, dtype=np.int64)
    sa = suffix_array(arr)
    lcp = lcp_array(arr, sa)
    for r in range(1, len(sa)):
        i, j = int(sa[r]), int(sa[r - 1])
        k = 0
        while i + k < len(arr) and j + k < len(arr) and arr[i + k] == arr[j + k]:
            k += 1
        assert lcp[r] == k
    if len(sa):
        assert lcp[0] == 0


@SLOW
@given(
    texts=st.lists(st.text(alphabet="abc", max_size=30), max_size=5),
    min_len=st.integers(3, 8),
)
def test_cross_doc_spans_oracle(texts, min_len):
    got = cross_doc_repeated_spans(texts, min_len)
    want = set()
    for i in range(len(texts)):
        subs = {texts[i][k : k + min_len] for k in range(len(texts[i]) - min_len + 1)}
        for j in range(i + 1, len(texts)):
            if any(s in texts[j] for s in subs):
                want.add((i, j))
    assert got == want


# ------------------------------------------------------------- key packing


@FAST
@given(n=st.integers(0, 64), seed=st.integers(0, 2**32 - 1))
def test_pack_u128_preserves_order(n, seed):
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 2**64, n, dtype=np.uint64)
    lo = rng.integers(0, 2**64, n, dtype=np.uint64)
    packed = pack_u128(hi, lo)
    np.testing.assert_array_equal(np.argsort(packed, kind="stable"), np.lexsort((lo, hi)))


@FAST
@given(n_keys=st.integers(0, 32), n_probe=st.integers(0, 32), seed=st.integers(0, 2**32 - 1))
def test_lookup_sorted_membership(n_keys, n_probe, seed):
    rng = np.random.default_rng(seed)
    # small hi-space forces probe/key collisions so both branches exercise
    hi = rng.integers(0, 4, n_keys, dtype=np.uint64)
    lo = rng.integers(0, 4, n_keys, dtype=np.uint64)
    keys = pack_u128(hi, lo)
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    vals = np.arange(n_keys, dtype=np.int64)[order]
    ph = rng.integers(0, 4, n_probe, dtype=np.uint64)
    pl = rng.integers(0, 4, n_probe, dtype=np.uint64)
    probe = pack_u128(ph, pl)
    found, got = lookup_sorted(skeys, vals, probe)
    kv = {}
    for k, v in zip(skeys, vals):
        kv.setdefault(k.tobytes(), v)
    for t in range(n_probe):
        b = probe[t].tobytes()
        assert found[t] == (b in kv)
        if found[t]:
            # any matching key's value is acceptable under duplicates as long
            # as it maps back to an equal key
            assert skeys[np.searchsorted(skeys, probe[t])].tobytes() == b


# ------------------------------------------------------------------ hashes


@FAST
@given(n=st.integers(0, 64), seed=st.integers(0, 2**32 - 1))
def test_popcount_and_hamming_oracle(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(-(2**63), 2**63, n, dtype=np.int64)
    b = rng.integers(-(2**63), 2**63, n, dtype=np.int64)
    pc = popcount64(a.view(np.uint64))
    hd = hamming64(a, b)
    for k in range(n):
        assert pc[k] == bin(int(a[k].view(np.uint64))).count("1")
        assert hd[k] == bin(int(a[k].view(np.uint64)) ^ int(b[k].view(np.uint64))).count("1")


_SEEDS = generate_seeds(16, seed=42)


@FAST
@given(s=st.text(alphabet="abcdefg ", min_size=5, max_size=40), t=st.text(alphabet="abcdefg ", min_size=0, max_size=40))
def test_minhash_monotone_under_append(s, t):
    """shingles(s) ⊆ shingles(s + t) when len(s) >= k, so every signature
    slot can only decrease when text is appended — the property LSH banding
    relies on for containment-ish recall."""
    sig_s = minhash_signatures([s], _SEEDS, char_ngram=5)[0]
    sig_st = minhash_signatures([s + t], _SEEDS, char_ngram=5)[0]
    assert (sig_st <= sig_s).all()


@FAST
@given(texts=st.lists(st.text(alphabet="abcdefg ", max_size=30), min_size=1, max_size=6))
def test_minhash_batch_invariance(texts):
    """Signatures are per-row: computing one batch equals computing each row
    alone (the partition-invariance contract every dedup stage assumes)."""
    whole = minhash_signatures(texts, _SEEDS, char_ngram=5)
    for k, t in enumerate(texts):
        np.testing.assert_array_equal(whole[k], minhash_signatures([t], _SEEDS, char_ngram=5)[0])


# ---------------------------------------------------------------- MP4 muxer


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(1, 12),
    fps_milli=st.integers(500, 60000),  # 0.5 .. 60 fps at millihertz precision
    w=st.integers(1, 4096),
    h=st.integers(1, 4096),
    sizes=st.lists(st.integers(1, 300), min_size=12, max_size=12),
)
def test_mp4_mux_demux_roundtrip(n_frames, fps_milli, w, h, sizes):
    """write_mjpeg_mp4 -> (mp4_info, mp4_sample_ranges) recovers the frame
    count, dimensions, millihertz-exact framerate, and the exact bytes of
    every sample for arbitrary payload sizes."""
    from curator_ray.functions.mp4 import mp4_info, mp4_sample_ranges, write_mjpeg_mp4

    rng = np.random.default_rng(sum(sizes) + n_frames)
    frames = [rng.integers(0, 256, sizes[i], dtype=np.uint8).tobytes() for i in range(n_frames)]
    fps = fps_milli / 1000.0
    b = write_mjpeg_mp4(frames, fps, w, h)
    info = mp4_info(b)
    assert info.num_frames == n_frames
    assert (info.width, info.height) == (w, h)
    assert abs(info.framerate - fps) < 5e-4  # millihertz-exact media timescale
    ranges = mp4_sample_ranges(b)
    assert [b[o : o + s] for o, s in ranges] == frames


@settings(max_examples=30, deadline=None)
@given(
    n_frames=st.integers(1, 10),
    cut=st.integers(1, 200),
    flip_at=st.integers(0, 10_000),
    flip_to=st.integers(0, 255),
)
def test_mp4_parser_total_on_mutations(n_frames, cut, flip_at, flip_to):
    """Truncation or a single-byte flip anywhere in a valid file either
    parses or raises ValueError — never struct.error, KeyError, or an
    unbounded allocation."""
    from curator_ray.functions.mp4 import mp4_info, mp4_sample_ranges, write_mjpeg_mp4

    frames = [bytes([i] * (20 + i)) for i in range(n_frames)]
    good = write_mjpeg_mp4(frames, 24.0, 64, 64)
    mutants = [good[: max(8, len(good) - cut)]]
    if flip_at < len(good):
        m = bytearray(good)
        m[flip_at] = flip_to
        mutants.append(bytes(m))
    for m in mutants:
        for fn in (mp4_info, mp4_sample_ranges):
            try:
                fn(m)
            except ValueError:
                pass


# ------------------------------------------------- distributed SA simulation


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    n_docs=st.integers(2, 14),
    k=st.sampled_from([8, 12, 20]),
    bs=st.sampled_from([1, 3, 1000]),
)
def test_distributed_sa_simulation_matches_oracle(data, n_docs, k, bs):
    """The pure block-function simulation of stages/suffix_global.py (every
    kernel the Ray stage runs, at arbitrary block sizes including bs=1) must
    reproduce the brute-force concatenated-SA oracle on hypothesis-generated
    corpora — including planted shared spans, repeats, and empty docs."""
    from test_suffix_global import sa_oracle_pairs, simulate

    alphabet = st.sampled_from("ab x")
    texts = [
        data.draw(st.text(alphabet, min_size=0, max_size=40), label=f"doc{i}")
        for i in range(n_docs)
    ]
    # plant one shared span in two docs so the non-empty case is exercised
    span = data.draw(st.text(alphabet, min_size=k, max_size=k + 5), label="span")
    if n_docs >= 2:
        texts[0] += span
        texts[-1] = span + texts[-1]
    ids = list(range(101, 101 + n_docs))
    assert simulate(texts, ids, k, bs, "pairs") == sa_oracle_pairs(texts, ids, k)


# -- sorted star-scan decomposition (stages/sortagg.py) ----------------------
# The block scan + driver boundary merge must reconstruct EXACTLY the edge
# set of a global per-key star, for ANY contiguous partitioning of the
# sorted rows into blocks — the invariant the whole sortscan family
# (LSH / simhash / exact / substring global stages) rests on.


@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=200),
    seed=st.integers(0, 2**31 - 1),
    nblocks=st.integers(1, 8),
)
@settings(max_examples=200, deadline=None)
def test_star_scan_block_split_invariance(keys, seed, nblocks):
    import pyarrow as pa

    from curator_ray.stages.sortagg import _merge_star_boundary, _scan_star_block

    rng = np.random.RandomState(seed)
    k = np.array(keys, dtype=np.int64)
    rep = rng.permutation(len(k)).astype(np.int64)  # unique reps
    order = np.lexsort((rep, k))
    sk, sr = k[order], rep[order]

    # random contiguous split of the sorted rows into non-empty blocks
    nblocks = min(nblocks, len(sk))
    cuts = np.sort(rng.choice(np.arange(1, len(sk)), size=nblocks - 1, replace=False)) if nblocks > 1 else np.array([], np.int64)
    bounds = np.concatenate([[0], cuts, [len(sk)]])

    edges, btbl_parts = set(), []
    for s, e in zip(bounds[:-1], bounds[1:]):
        t = pa.table({"k": pa.array(sk[s:e], pa.int64()), "rep": pa.array(sr[s:e], pa.int64())})
        out = _scan_star_block(t, key_cols=["k"], rep_col="rep")
        ev = out.filter(pa.compute.is_valid(out.column("src")))
        edges.update(zip(ev.column("src").to_pylist(), ev.column("dst").to_pylist()))
        bv = out.filter(pa.compute.is_valid(out.column("k")))
        btbl_parts.append(bv.select(["k", "rep"]))
    btbl = pa.concat_tables(btbl_parts)
    merged = _merge_star_boundary(btbl, ["k"], "rep")
    edges.update(zip(merged.column("src").to_pylist(), merged.column("dst").to_pylist()))

    groups: dict[int, list[int]] = {}
    for kk, rr in zip(k.tolist(), rep.tolist()):
        groups.setdefault(kk, []).append(rr)
    want = set()
    for members in groups.values():
        m = min(members)
        want.update((m, r) for r in members if r != m)
    assert edges == want
