"""Image pipeline stages: decode, resize, embed, score, filter, remove.

Reference counterparts:
- ``ImageReaderStage`` (DALI tar reader, ``stages/image/io/image_reader.py:31-156``)
  -> here the table IS the source (``bytes`` column); decode happens lazily
  inside ``map_batches``;
- ``ImageEmbeddingStage`` (CLIP, ``stages/image/embedders/clip_embedder.py:29-116``),
  ``ImageAestheticFilterStage`` / ``ImageNSFWFilterStage``
  (``stages/image/filters/*.py``) -> actor-pool ``map_batches`` classes whose
  ``__init__`` loads the model once per worker. The real CLIP/MLP weights are
  unavailable in this sandbox (no torch, no network), so the *models* are
  deterministic stubs — but the Ray plumbing (actor pool signature, batch
  shapes, schema, micro-batching) is real and tested;
- ``ImageDuplicatesRemovalStage`` (``stages/image/deduplication/removal.py:28-104``)
  -> broadcast anti-join on ``image_id`` strings, aggregating removal-id
  parquet files exactly like the reference's ``setup()``.

PNG decoding is real (curator_ray.functions.png); JPEG decoding is real too
(curator_ray.functions.jpeg — pure-numpy baseline sequential codec).
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.phash import phash64
from ..functions.png import decode_png, encode_png


def decode_image(blob: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(blob)
    if fmt in ("jpeg", "jpg"):
        # pure-numpy baseline JPEG (functions/jpeg.py); a GPU deployment
        # swaps in DALI/nvJPEG here without changing the stage contract
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(blob)
    raise ValueError(f"unknown image format: {fmt}")


class DecodeStage:
    """Actor-pool map_batches: bytes -> decoded pixel tensors (+ recomputed
    pHash when ``verify_phash``). Emits pixels as a flat uint8 list column to
    stay Arrow-native; downstream stages reshape via (h, w, 3)."""

    def __init__(self, verify_phash: bool = False):
        self.verify_phash = verify_phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        pixels, ph = [], []
        for blob, fmt in zip(blobs, fmts):
            arr = decode_image(blob, fmt)
            pixels.append(arr.ravel())
            ph.append(phash64(arr) if self.verify_phash else 0)
        # one flat uint8 buffer + offsets -> ListArray: no Python-int boxing
        # of pixels (a .tolist() here costs ~28 bytes/pixel and dominates)
        flat = np.concatenate(pixels) if pixels else np.zeros(0, np.uint8)
        offsets = np.zeros(len(pixels) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pixels], out=offsets[1:])
        col = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), pa.array(flat, pa.uint8()))
        out = batch.append_column("pixels", col)
        if self.verify_phash:
            out = out.append_column("phash_recomputed", pa.array(ph, pa.int64()))
        return out


def decode_stage(
    ds,
    concurrency: tuple[int, int] = (1, 8),
    verify_phash: bool = False,
    batch_size: int | None = None,
):
    """batch_size defaults to None (whole blocks): slicing a block with a
    binary/LargeList payload column re-serializes the block's full backing
    buffer PER SLICE (measured ~30x traffic amplification at batch_size=64
    on 2000-row blocks — PERF.md round 5). Bound per-task pixel memory by
    sizing the UPSTREAM blocks (images_per_tar / target_max_block_size)
    instead; pass an explicit batch_size only when decoded rows are so
    large (e.g. 4K frames) that even one block overflows a worker heap."""
    kw = {} if batch_size is None else {"batch_size": batch_size}
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"verify_phash": verify_phash},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        **kw,
    )


class ResizeStage:
    """Deterministic bilinear resize of decoded rows, re-encoded to PNG."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.phash import _resize_bilinear

        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_blobs, ws, hs = [], [], []
        for blob, fmt in zip(blobs, fmts):
            arr = decode_image(blob, fmt)
            resized = np.stack(
                [_resize_bilinear(arr[..., c], self.out_h, self.out_w) for c in range(3)], axis=2
            )
            out_blobs.append(encode_png(np.clip(resized, 0, 255).astype(np.uint8)))
            ws.append(self.out_w)
            hs.append(self.out_h)
        names = batch.column_names
        out = batch.set_column(names.index("bytes"), "bytes", pa.array(out_blobs, pa.binary()))
        out = out.set_column(names.index("w"), "w", pa.array(ws, pa.int32()))
        return out.set_column(names.index("h"), "h", pa.array(hs, pa.int32()))


def resize_stage(
    ds,
    out_w: int,
    out_h: int,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int | None = None,
):
    # whole blocks by default — see decode_stage on slice re-serialization
    kw = {} if batch_size is None else {"batch_size": batch_size}
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        **kw,
    )


class FakeClipEmbedder:
    """Deterministic stand-in for the CLIP embedder actor
    (``clip_embedder.py:29-116``): 'weights' are a seeded random projection
    built once per worker in ``__init__`` (the real stage loads CLIP there);
    features are pixel block-means, micro-batched like the reference's
    ``model_inference_batch_size``."""

    def __init__(self, dim: int = 64, seed: int = 42, inference_batch_size: int = 128):
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(48, dim)).astype(np.float32)  # 4x4x3 block means
        self.dim = dim
        self.inference_batch_size = inference_batch_size

    def _features(self, arr: np.ndarray) -> np.ndarray:
        h, w, _ = arr.shape
        bh, bw = h // 4, w // 4
        blocks = arr[: bh * 4, : bw * 4].reshape(4, bh, 4, bw, 3).mean(axis=(1, 3))
        return (blocks.reshape(-1) / 255.0).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "pixels" in batch.column_names:
            # decode-once composition: an upstream DecodeStage already paid
            # the codec; reshape its flat uint8 rows instead of re-decoding
            col = batch.column("pixels")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ws = batch.column("w").to_numpy()
            hs = batch.column("h").to_numpy()
            arrs = [
                np.asarray(col[i].values).reshape(int(hs[i]), int(ws[i]), 3)
                for i in range(len(col))
            ]
            feats = np.stack([self._features(a) for a in arrs]) if arrs else np.zeros((0, 48), np.float32)
        else:
            blobs = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            feats = np.stack([self._features(decode_image(b, f)) for b, f in zip(blobs, fmts)]) if blobs else np.zeros((0, 48), np.float32)
        # fixed-shape GEMM chunks (zero-padded tail): float32 matmul results
        # can differ in the last ulp when the chunk SHAPE differs (BLAS picks
        # blocking by M), and a different Ray block layout would then produce
        # different embeddings -> flipped k-means near-ties downstream. With
        # every chunk exactly (inference_batch_size, 48) the per-row results
        # are layout-independent.
        ibs = self.inference_batch_size
        out = np.empty((len(feats), self.dim), np.float32)
        buf = np.zeros((ibs, feats.shape[1] if len(feats) else 48), np.float32)
        for s in range(0, len(feats), ibs):
            m = min(ibs, len(feats) - s)
            buf[:m] = feats[s : s + m]
            buf[m:] = 0.0
            out[s : s + m] = (buf @ self.proj)[:m]
        norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        out = out / norms
        flat = pa.array(out.ravel(), pa.float32())
        return batch.append_column("embedding", pa.FixedSizeListArray.from_arrays(flat, self.dim))


def embed_stage(ds, dim: int = 64, concurrency: tuple[int, int] = (1, 8), batch_size: int | None = None):
    """batch_size defaults to None (whole blocks): activation memory is
    bounded INSIDE the embedder by ``inference_batch_size``, and an outer
    batch_size forces Ray to re-slice blocks — with a pixels LargeList
    column each slice re-serializes the full backing buffer, measured 17x
    slower (27.3 s vs 1.6 s front half at 100k rows, PERF.md round 5)."""
    kw = {} if batch_size is None else {"batch_size": batch_size}
    return ds.map_batches(
        FakeClipEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        **kw,
    )


class FakeAestheticScorer:
    """Deterministic stand-in for the aesthetic-MLP actor
    (``aesthetic_filter.py:28-107``): scores an embedding row in [0, 10]."""

    def __init__(self, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.w = rng.normal(size=64).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = col.type.list_size
        emb = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), dim)
        score = 5.0 + 5.0 * np.tanh(emb @ self.w[:dim])
        return batch.append_column("aesthetic_score", pa.array(score.astype(np.float64), pa.float64()))


def aesthetic_filter_stage(ds, threshold: float = 5.0, concurrency: tuple[int, int] = (1, 8)):
    import pyarrow.compute as pc

    scored = ds.map_batches(
        FakeAestheticScorer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return scored.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("aesthetic_score"), threshold)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class FakeNsfwScorer:
    """Deterministic stand-in for the NSFW-MLP actor
    (``stages/image/filters/nsfw_filter.py:28-96``): scores an embedding row
    in [0, 1]; higher = more likely NSFW. Same actor-pool shape as the
    aesthetic scorer (model built once per worker in ``__init__``)."""

    def __init__(self, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.w = rng.normal(size=64).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = col.type.list_size
        emb = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), dim)
        score = 1.0 / (1.0 + np.exp(-(emb @ self.w[:dim])))
        return batch.append_column("nsfw_score", pa.array(score.astype(np.float64), pa.float64()))


def nsfw_filter_stage(ds, threshold: float = 0.5, concurrency: tuple[int, int] = (1, 8)):
    """Score + drop rows with nsfw_score above ``threshold`` — the reference
    keeps images with scores BELOW the threshold (``nsfw_filter.py:82-96``)."""
    import pyarrow.compute as pc

    scored = ds.map_batches(
        FakeNsfwScorer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return scored.map_batches(
        lambda b: b.filter(pc.less(b.column("nsfw_score"), threshold)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class ImageDuplicatesRemoval:
    """Anti-filter on image_id strings from a removal-parquet directory —
    reference ``ImageDuplicatesRemovalStage`` semantics incl. multi-file
    aggregation and the no-parquet error (``removal.py:60-98``)."""

    def __init__(self, removal_parquet_dir: str, id_column: str = "id"):
        import pyarrow.parquet as pq

        files = sorted(_glob.glob(os.path.join(removal_parquet_dir, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet files under {removal_parquet_dir}")
        tables = [pq.read_table(f, columns=[id_column]) for f in files]
        col = pa.concat_tables(tables).column(id_column)
        self.ids = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("image_id"), value_set=self.ids))
        return batch.filter(mask)


def image_removal_stage(ds, removal_parquet_dir: str, id_column: str = "id", concurrency: tuple[int, int] = (1, 8)):
    # fail fast on the driver (actor construction is lazy, so the missing-dir
    # error would otherwise only surface mid-execution)
    if not _glob.glob(os.path.join(removal_parquet_dir, "*.parquet")):
        raise FileNotFoundError(f"no parquet files under {removal_parquet_dir}")
    return ds.map_batches(
        ImageDuplicatesRemoval,
        fn_constructor_kwargs={"removal_parquet_dir": removal_parquet_dir, "id_column": id_column},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
