"""Text embedding creator + FastText model-file stages.

Ray-Data-native counterparts of two reference components:

- ``EmbeddingCreatorStage`` (reference
  ``nemo_curator/stages/text/embedders/base.py:177-236``): a composite of
  TokenizerStage -> EmbeddingModelStage where the model stage mean-pools
  token embeddings (``base.py:100-106``) or takes the last token
  (``base.py:108-117``), L2-normalizes, and appends an ``embeddings``
  list<float> column.  Torch / sentence-transformers are absent in this
  sandbox, so the model is a deterministic seeded embedding table +
  mean-pool — but the distributed plumbing (actor-pool ``map_batches``
  setup-once-per-worker, length-sorted micro-batches, seq_order
  restoration, ragged list<float32> output built zero-copy from one flat
  buffer) is real, tested, and is exactly what a GPU model would slot into.
  The vLLM-backed variant (``embedders/vllm.py``) requires the absent
  ``vllm`` package and is gated the same way Lance IO is.

- ``FastTextQualityFilter`` / ``FastTextLangId`` (reference
  ``nemo_curator/stages/text/filters/fasttext/fasttext_filters.py:23-90``):
  filters whose ``load_model`` reads a fastText ``.bin`` from a local path
  once per worker.  The ``fasttext`` package is absent, so a tiny
  deterministic model-file format (``FTSTUB1``: json header + float32
  weight blobs) stands in; ``train_fasttext_stub_model`` writes one, and
  ``FastTextScoreStage`` demonstrates the full model-file actor path: the
  path ships to every worker, ``__init__`` loads + validates it once, and
  ``__call__`` scores micro-batches vectorized.  Scoring semantics mirror
  the reference exactly: quality score = P(top label) if top==target else
  1 - P (``fasttext_filters.py:42-52``), keep via Pareto(alpha) sampling
  (``:54-55``; made deterministic per-doc via inverse-CDF on a
  doc-id-derived uniform so results are order- and partitioning-
  independent); lang-id keeps P(top) >= min_langid_score and emits the
  ``[score, lang]`` pair column (``:76-90``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .classifier import INPUT_ID_FIELD, SEQ_ORDER_FIELD, TOKEN_LENGTH_FIELD, TokenizerStage

# ---------------------------------------------------------------------------
# Embedding creator
# ---------------------------------------------------------------------------


class EmbeddingModelStage:
    """Actor-pool embedding head (reference embedders/base.py:33-117).

    ``__init__`` builds the (stub) model weights once per worker; ``__call__``
    runs micro-batches, mean-pools (or last-token-pools) token embeddings,
    L2-normalizes and appends ``embedding_field`` as list<float32>.
    """

    def __init__(
        self,
        vocab_size: int = 1 << 16,
        dim: int = 32,
        embedding_field: str = "embeddings",
        pooling: str = "mean_pooling",
        model_inference_batch_size: int = 1024,
        has_seq_order: bool = True,
        keep_tokens: bool = False,
        seed: int = 11,
    ):
        if pooling not in ("mean_pooling", "last_token"):
            raise ValueError(f"unknown pooling {pooling!r}")
        rng = np.random.RandomState(seed)
        self.emb = rng.normal(scale=0.5, size=(vocab_size, dim)).astype(np.float32)
        self.dim = dim
        self.embedding_field = embedding_field
        self.pooling = pooling
        self.batch_size = model_inference_batch_size
        self.has_seq_order = has_seq_order
        self.keep_tokens = keep_tokens

    def _pool(self, flat_ids: np.ndarray, counts: np.ndarray) -> np.ndarray:
        from ..functions.tokens import mean_pool

        if self.pooling == "mean_pooling":
            out = mean_pool(self.emb, flat_ids, counts)
        else:  # last_token (base.py:108-117)
            n = len(counts)
            out = np.zeros((n, self.dim), dtype=np.float32)
            if len(flat_ids):
                offsets = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(counts, out=offsets[1:])
                valid = counts > 0
                out[valid] = self.emb[flat_ids[offsets[1:][valid] - 1]]
        # F.normalize(dim=1) parity (base.py: embeddings are L2-normalized)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_col = batch.column(INPUT_ID_FIELD)
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        counts = pc.list_value_length(ids_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = ids_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        embs = np.zeros((n, self.dim), dtype=np.float32)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        for s in range(0, n, self.batch_size):  # micro-batched inference
            e = min(n, s + self.batch_size)
            embs[s:e] = self._pool(flat[offsets[s] : offsets[e]], counts[s:e])
        # one flat buffer -> FixedSizeList, no per-row Python boxing
        col = pa.FixedSizeListArray.from_arrays(pa.array(embs.reshape(-1)), self.dim)
        out = batch.append_column(self.embedding_field, col)
        if not self.keep_tokens:
            out = out.drop_columns([INPUT_ID_FIELD, TOKEN_LENGTH_FIELD])
        if self.has_seq_order and SEQ_ORDER_FIELD in out.column_names:
            order = np.argsort(out.column(SEQ_ORDER_FIELD).to_numpy(), kind="stable")
            out = out.take(order).drop_columns([SEQ_ORDER_FIELD])
        return out


def embedding_creator_stage(
    ds,
    text_field: str = "text",
    embedding_field: str = "embeddings",
    dim: int = 32,
    pooling: str = "mean_pooling",
    max_seq_length: int | None = 512,
    model_inference_batch_size: int = 1024,
    sort_by_length: bool = True,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 1024,
):
    """EmbeddingCreatorStage composite (embedders/base.py:177-236):
    tokenizer actor pool -> length-sorted micro-batched embedding pool."""
    tokenized = ds.map_batches(
        TokenizerStage,
        fn_constructor_kwargs={
            "text_field": text_field,
            "max_seq_length": max_seq_length,
            "sort_by_length": sort_by_length,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    return tokenized.map_batches(
        EmbeddingModelStage,
        fn_constructor_kwargs={
            "dim": dim,
            "embedding_field": embedding_field,
            "pooling": pooling,
            "model_inference_batch_size": model_inference_batch_size,
            "has_seq_order": sort_by_length,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# FastText model-file path
# ---------------------------------------------------------------------------

_FT_MAGIC = b"FTSTUB1\n"


def train_fasttext_stub_model(
    path: str,
    labels: list[str],
    vocab_size: int = 1 << 14,
    dim: int = 16,
    seed: int = 13,
) -> str:
    """Write a deterministic stand-in for a fastText ``.bin`` supervised model.

    Format: magic + json header line + float32 blobs (emb, w, b). The real
    format is replaced because the ``fasttext`` package is absent; everything
    downstream (file distribution, per-worker load, predict API) is real.
    """
    rng = np.random.RandomState(seed)
    emb = rng.normal(scale=0.5, size=(vocab_size, dim)).astype(np.float32)
    w = rng.normal(size=(dim, len(labels))).astype(np.float32)
    b = rng.normal(size=len(labels)).astype(np.float32)
    header = json.dumps({"labels": list(labels), "vocab_size": vocab_size, "dim": dim, "seed": seed})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_FT_MAGIC)
        f.write((header + "\n").encode())
        f.write(emb.tobytes())
        f.write(w.tobytes())
        f.write(b.tobytes())
    os.replace(tmp, path)
    return path


class _FastTextStubModel:
    """Loaded model with a fasttext-like ``predict`` (labels, probs)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            if f.read(len(_FT_MAGIC)) != _FT_MAGIC:
                raise ValueError(f"{path}: not an FTSTUB1 model file")
            header = json.loads(f.readline().decode())
            self.labels = header["labels"]
            vs, dim = header["vocab_size"], header["dim"]
            self.emb = np.frombuffer(f.read(vs * dim * 4), dtype=np.float32).reshape(vs, dim)
            self.w = np.frombuffer(f.read(dim * len(self.labels) * 4), dtype=np.float32).reshape(
                dim, len(self.labels)
            )
            self.b = np.frombuffer(f.read(len(self.labels) * 4), dtype=np.float32)
        self.seed = header["seed"]

    def predict_batch(self, texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(top_label_idx, top_prob) for every doc, fully vectorized."""
        from ..functions.tokens import mean_pool, softmax, whitespace_token_ids

        # fasttext_filters.py:46 newline -> space happens implicitly: the
        # whitespace split treats \n like any separator
        ids, wc = whitespace_token_ids(texts, self.emb.shape[0], self.seed)
        feats = mean_pool(self.emb, ids, wc)
        # linear head as an explicit fixed-order sum over dim, NOT `feats @ w`:
        # BLAS picks blocking/FMA kernels by matrix shape, so a gemm's per-row
        # result can differ in the last ulp between batch layouts — which
        # breaks the partition-invariance contract this scorer is held to
        # (identical scores under any repartitioning)
        logits = np.broadcast_to(self.b.astype(np.float64), (len(wc), len(self.labels))).copy()
        for k in range(self.emb.shape[1]):
            logits += feats[:, k, None].astype(np.float64) * self.w[k].astype(np.float64)
        probs = softmax(logits)
        top = probs.argmax(axis=1)
        return top, probs[np.arange(len(wc)), top]


def load_fasttext_model(model_path: str):
    """Per-worker model load (fasttext_filters.py:39-40 load_model); raises
    FileNotFoundError like model_check_or_download (:34-37)."""
    if not os.path.exists(model_path):
        raise FileNotFoundError(f"Model file {model_path} not found")
    try:  # prefer the real package when it exists outside this sandbox
        import fasttext  # noqa: F401

        with open(model_path, "rb") as f:
            if f.read(len(_FT_MAGIC)) == _FT_MAGIC:
                return _FastTextStubModel(model_path)
        return fasttext.load_model(model_path)
    except ImportError:
        return _FastTextStubModel(model_path)


class FastTextScoreStage:
    """Actor-pool scorer: loads the model file once per worker in __init__."""

    def __init__(
        self,
        model_path: str,
        mode: str = "quality",  # or "langid"
        text_field: str = "text",
        label: str = "__label__hq",
        alpha: float = 3.0,
        min_langid_score: float = 0.3,
        seed: int = 42,
        filter_rows: bool = True,
    ):
        self.model = load_fasttext_model(model_path)
        self.mode = mode
        self.text_field = text_field
        self.label = label
        self.alpha = alpha
        self.cutoff = min_langid_score
        self.seed = seed
        self.filter_rows = filter_rows

    def _keep_quality(self, scores: np.ndarray, texts: pa.Array) -> np.ndarray:
        """keep_document (fasttext_filters.py:54-55): pareto(alpha) > 1-score,
        made deterministic/order-independent: the Pareto draw comes from a
        per-doc uniform derived by hashing the text with ``seed``."""
        from ..functions.murmur import hash_bytes_grouped
        from ..functions.shingles import _string_array_buffers

        data, offsets = _string_array_buffers(texts)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        h = hash_bytes_grouped(data, offsets[:-1], lengths, seed=self.seed, bits=64)
        u = (h.astype(np.float64) + 0.5) / 2.0**64  # uniform in (0, 1)
        pareto = np.power(1.0 - u, -1.0 / self.alpha) - 1.0  # inverse CDF
        return pareto > (1.0 - scores)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.fill_null("")
        top, probs = self.model.predict_batch(col)
        if self.mode == "quality":
            target = self.model.labels.index(self.label) if self.label in self.model.labels else -1
            scores = np.where(top == target, probs, 1.0 - probs)
            out = batch.append_column("fasttext_quality_score", pa.array(scores, pa.float64()))
            if self.filter_rows:
                out = out.filter(pa.array(self._keep_quality(scores, col)))
            return out
        # langid (fasttext_filters.py:76-90): emit [score, lang] pair + keep
        langs = [self.model.labels[i].replace("__label__", "").upper() for i in top]
        out = batch.append_column("fasttext_lang", pa.array(langs, pa.string()))
        out = out.append_column("fasttext_lang_score", pa.array(probs, pa.float64()))
        if self.filter_rows:
            out = out.filter(pa.array(probs >= self.cutoff))
        return out


def fasttext_quality_filter(
    ds,
    model_path: str,
    text_field: str = "text",
    label: str = "__label__hq",
    alpha: float = 3.0,
    seed: int = 42,
    filter_rows: bool = True,
    concurrency: tuple[int, int] = (1, 8),
):
    """FastTextQualityFilter (fasttext_filters.py:23-55) as an actor pool."""
    return ds.map_batches(
        FastTextScoreStage,
        fn_constructor_kwargs={
            "model_path": model_path,
            "mode": "quality",
            "text_field": text_field,
            "label": label,
            "alpha": alpha,
            "seed": seed,
            "filter_rows": filter_rows,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def fasttext_langid(
    ds,
    model_path: str,
    text_field: str = "text",
    min_langid_score: float = 0.3,
    filter_rows: bool = True,
    concurrency: tuple[int, int] = (1, 8),
):
    """FastTextLangId (fasttext_filters.py:58-90) as an actor pool."""
    return ds.map_batches(
        FastTextScoreStage,
        fn_constructor_kwargs={
            "model_path": model_path,
            "mode": "langid",
            "text_field": text_field,
            "min_langid_score": min_langid_score,
            "filter_rows": filter_rows,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
