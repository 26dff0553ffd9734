"""Deterministic synthetic Lance/parquet image+caption table generator.

Produces the canonical input table of this engine (BASELINE.json input_hint):

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Generation is a pure function of ``(seed, row_index)`` so the driver-side and
the Ray-parallel path produce byte-identical tables, and any row can be
regenerated independently (FIXTURES.md F1 contract).

Duplicate structure per decade of rows (anchor = i - i % 10):
  role 0-6: unique rows
  role 7:   exact duplicate of the anchor (identical bytes + caption)
  role 8:   near-duplicate image (brightness +2) with the anchor's caption
  role 9:   near-duplicate caption (one word swapped) with a unique image

So each decade whose anchor exists contributes one duplicate cluster
{anchor, 7, 8, 9} under the full (fuzzy caption + image) pipeline.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.phash import phash64
from ..functions.png import encode_png

# bump when generated content changes (consumers key caches on it; v2 =
# 8x8 coarse grid, de-quadratic pHash collision mass; v3 = 240-word caption
# vocabulary, de-quadratic shared->=50-char-span mass: with 60 words, TRUE
# long caption spans recur across random pairs at birthday rates, putting a
# c*N^2 term in the substring builder's duplicate count at rehearsal scale)
SYNTH_VERSION = 3

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_WORDS = (
    "river mountain harbor lantern orchard meadow castle bridge garden forest "
    "sunset morning autumn winter crimson golden silver quiet distant ancient "
    "painting photograph sketch close-up aerial panoramic portrait landscape "
    "dog cat fox horse falcon otter heron rabbit deer whale child sailor "
    "walking resting flying drifting glowing standing watching running "
    "beside beneath above across through against during within under over "
    "valley glacier lagoon prairie tundra canyon plateau estuary dune cliff "
    "marsh fjord reef atoll delta ridge summit basin grove thicket "
    "dawn dusk twilight noon midnight spring summer equinox solstice eclipse "
    "amber azure scarlet violet indigo emerald turquoise ochre sepia ivory "
    "mural fresco etching woodcut collage daguerreotype tintype charcoal pastel watercolor "
    "wolf lynx badger weasel marten osprey kestrel plover curlew sandpiper "
    "salmon trout sturgeon pelican cormorant gull tern albatross puffin gannet "
    "farmer fisher weaver potter smith shepherd miller baker carpenter mason "
    "climbing paddling rowing sailing gliding soaring wading grazing foraging nesting "
    "leaping crouching perching basking prowling stalking bounding trotting ambling pacing "
    "toward behind beyond amid betwixt alongside underneath atop outside inside "
    "storm breeze drizzle downpour blizzard fog mist frost thaw hail "
    "harvest orchid lupine aster bramble fern moss lichen sedge reed "
    "cobblestone rampart turret spire cloister archway portico colonnade belfry parapet "
    "lighthouse windmill watermill granary stable barn silo wharf jetty pier "
    "canoe skiff ketch schooner barge ferry trawler dinghy catamaran sloop "
    "violet-hued sunlit moonlit starlit lamplit rainswept windswept snowbound mistveiled dew-laden "
    "weathered gnarled mossy lichened crumbling gleaming shimmering rippling swaying rustling"
).split()


def _base_pixels(rng: np.random.RandomState, size: int) -> np.ndarray:
    """Low-frequency procedural RGB so small perturbations keep pHash close.

    The coarse grid is 8x8 — the same extent as the pHash 8x8 DCT block — so
    every AC coefficient the hash thresholds is driven by independent random
    values and per-image hash entropy is ~full 63 bits. The earlier 4x4 grid
    left most of the block near zero (~16 effective coefficients), which at
    Hamming<=4 produced O(N^2) birthday near-dup pairs among UNRELATED images
    at the 10M-row rehearsal scale (PERF.md round-4 fit c=4.7e-9) — a
    generator artifact real corpora don't show, masking planted-recall
    accounting. Duplicate-role perturbations (brightness +2) are unaffected:
    they move only the DC term, which pHash excludes."""
    g = 8
    coarse = rng.randint(0, 256, size=(g, g, 3)).astype(np.float64)
    # bilinear upsample g x g -> size x size per channel
    idx = np.linspace(0, g - 1, size)
    i0 = np.floor(idx).astype(int)
    i1 = np.minimum(i0 + 1, g - 1)
    frac = idx - i0
    out = np.empty((size, size, 3))
    for c in range(3):
        rows = coarse[i0, :, c] * (1 - frac)[:, None] + coarse[i1, :, c] * frac[:, None]
        out[..., c] = rows[:, i0] * (1 - frac)[None, :] + rows[:, i1] * frac[None, :]
    noise = rng.randint(-6, 7, size=(size, size, 3))
    return np.clip(out + noise, 0, 255).astype(np.uint8)


def _caption(rng: np.random.RandomState) -> str:
    n = rng.randint(10, 16)
    return " ".join(_WORDS[j] for j in rng.randint(0, len(_WORDS), size=n))


def _anchor_content(seed: int, anchor: int, size: int) -> tuple[np.ndarray, str]:
    rng = np.random.RandomState((seed * 1_000_003 + anchor) % (2**31 - 1))
    return _base_pixels(rng, size), _caption(rng)


def generate_rows(indices: np.ndarray, seed: int = 42, size: int = 32, with_pixels: bool = True) -> pa.Table:
    """Generate table rows for the given global row indices (pure function)."""
    ids, blobs, caps, hashes = [], [], [], []
    for i in (int(x) for x in indices):
        anchor = i - i % 10
        role = i % 10
        pixels, caption = _anchor_content(seed, anchor if role in (7, 8, 9) else i, size)
        if role == 8:
            pixels = np.clip(pixels.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        elif role == 9:
            rng = np.random.RandomState((seed * 7_000_003 + i) % (2**31 - 1))
            pixels = _base_pixels(rng, size)
            words = caption.split()
            words[rng.randint(0, len(words))] = _WORDS[rng.randint(0, len(_WORDS))]
            caption = " ".join(words)
        ids.append(f"img_{i:09d}")
        blobs.append(encode_png(pixels) if with_pixels else None)
        caps.append(caption)
        hashes.append(phash64(pixels))
    n = len(ids)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([size] * n, pa.int32()),
            "h": pa.array([size] * n, pa.int32()),
            "fmt": pa.array(["png"] * n, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        },
        schema=SCHEMA,
    )


def golden_table() -> pa.Table:
    """The reference fuzzy-workflow golden corpus (FIXTURES.md F2 /
    reference tests/stages/deduplication/fuzzy/test_fuzzy_workflow.py:74-94)
    re-hosted on the image+caption schema, original int ids in ``doc_id``."""
    captions = [
        "A test string",
        "A different test string",
        "A different object",
        "The quick brown fox jumps over the lazy dog",
        "The quick black cat jumps over the lazy dog",
    ]
    doc_ids = [1, 2, 300, 4, -1]
    base = generate_rows(np.arange(len(captions)), seed=7)
    return base.set_column(5, "caption", pa.array(captions)).append_column("doc_id", pa.array(doc_ids, pa.int64()))


def write_synth_dataset(
    path: str,
    n_rows: int,
    seed: int = 42,
    size: int = 32,
    with_pixels: bool = True,
    rows_per_file: int = 10_000,
    use_ray: bool = False,
) -> str:
    """Write the synthetic table as a directory of parquet files.

    ``use_ray=True`` fans generation out with Ray Data ``map_batches`` (the
    content is identical either way — generation is per-row deterministic).
    """
    os.makedirs(path, exist_ok=True)
    if use_ray:
        import ray

        def gen(batch: pa.Table) -> pa.Table:
            return generate_rows(batch.column("id").to_numpy(), seed=seed, size=size, with_pixels=with_pixels)

        (
            ray.data.range(n_rows)
            .map_batches(gen, batch_format="pyarrow", batch_size=rows_per_file)
            .write_parquet(path)
        )
    else:
        for start in range(0, n_rows, rows_per_file):
            stop = min(start + rows_per_file, n_rows)
            tbl = generate_rows(np.arange(start, stop), seed=seed, size=size, with_pixels=with_pixels)
            pq.write_table(tbl, os.path.join(path, f"part-{start:012d}.parquet"))
    return path
