"""PNG codec roundtrip, pHash locality, and synth-table determinism (F1/F6)."""

import numpy as np
import pyarrow as pa

from curator_ray.functions.phash import hamming64, phash64
from curator_ray.functions.png import decode_png, encode_png, psnr
from curator_ray.sources.synth import generate_rows, golden_table


def test_png_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(data)
    np.testing.assert_array_equal(img, out)
    assert psnr(img, out) == float("inf")


def test_phash_brightness_locality():
    # F6: +2 brightness perturbation keeps Hamming distance small
    rows = generate_rows(np.arange(0, 20))
    base = decode_png(rows.column("bytes")[0].as_py())
    bright = np.clip(base.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    d = hamming64(np.array([phash64(base)]), np.array([phash64(bright)]))[0]
    assert d <= 4
    # unrelated images are far apart
    other = decode_png(rows.column("bytes")[10].as_py())
    d2 = hamming64(np.array([phash64(base)]), np.array([phash64(other)]))[0]
    assert d2 > 10


def test_synth_determinism_and_dup_structure():
    a = generate_rows(np.arange(0, 30))
    b = generate_rows(np.arange(0, 30))
    assert a.equals(b)
    # regeneration of a slice matches the full table (pure per-row function)
    c = generate_rows(np.arange(7, 9))
    assert c.column("caption")[0].as_py() == a.column("caption")[7].as_py()

    # role 7: exact dup of anchor
    assert a.column("bytes")[7].as_py() == a.column("bytes")[0].as_py()
    assert a.column("caption")[7].as_py() == a.column("caption")[0].as_py()
    # role 8: near-dup image, same caption, phash hamming <= 4
    assert a.column("caption")[8].as_py() == a.column("caption")[0].as_py()
    d = hamming64(
        np.array([a.column("phash")[8].as_py()]), np.array([a.column("phash")[0].as_py()])
    )[0]
    assert d <= 4
    assert a.column("bytes")[8].as_py() != a.column("bytes")[0].as_py()
    # role 9: near-dup caption (one word swapped)
    cap0 = a.column("caption")[0].as_py().split()
    cap9 = a.column("caption")[9].as_py().split()
    assert len(cap0) == len(cap9)
    assert sum(x != y for x, y in zip(cap0, cap9)) <= 1


def test_golden_table():
    t = golden_table()
    assert t.num_rows == 5
    assert t.column("doc_id").to_pylist() == [1, 2, 300, 4, -1]
    assert t.column("caption")[0].as_py() == "A test string"
    assert pa.types.is_binary(t.schema.field("bytes").type)
