"""Embedding creator + FastText model-file stages: pooling math, micro-batch
invariance, seq-order restoration, model-file load semantics, and the
reference's quality/lang-id score formulas."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.stages.classifier import TokenizerStage
from curator_ray.stages.embedder import (
    EmbeddingModelStage,
    FastTextScoreStage,
    _FastTextStubModel,
    embedding_creator_stage,
    fasttext_langid,
    fasttext_quality_filter,
    load_fasttext_model,
    train_fasttext_stub_model,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "short",
    "",
    "an entirely different document about databases and query engines",
    "the quick brown fox jumps over the lazy dog",  # dup of row 0
]


def _batch():
    return pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS})


def _embed_local(batch, **kw):
    tok = TokenizerStage()
    return EmbeddingModelStage(**kw)(tok(batch))


class TestEmbeddingModel:
    def test_shape_and_norm(self):
        out = _embed_local(_batch(), dim=32)
        embs = np.array(out.column("embeddings").to_pylist(), dtype=np.float32)
        assert embs.shape == (5, 32)
        norms = np.linalg.norm(embs, axis=1)
        # non-empty docs are unit-norm; the empty doc is the zero vector
        order = out.column("doc_id").to_pylist()
        for doc_id, nrm in zip(order, norms):
            if doc_id == 2:
                assert nrm == 0.0
            else:
                assert nrm == pytest.approx(1.0, abs=1e-5)

    def test_seq_order_restored_and_dups_identical(self):
        out = _embed_local(_batch())
        assert out.column("doc_id").to_pylist() == [0, 1, 2, 3, 4]
        embs = out.column("embeddings").to_pylist()
        assert embs[0] == embs[4]  # identical texts -> identical embeddings
        assert embs[0] != embs[3]

    def test_micro_batch_invariance(self):
        a = _embed_local(_batch(), model_inference_batch_size=1)
        b = _embed_local(_batch(), model_inference_batch_size=1024)
        assert a.column("embeddings").to_pylist() == b.column("embeddings").to_pylist()

    def test_last_token_pooling(self):
        mean = _embed_local(_batch(), pooling="mean_pooling")
        last = _embed_local(_batch(), pooling="last_token")
        # single-word doc: mean == last token
        m = dict(zip(mean.column("doc_id").to_pylist(), mean.column("embeddings").to_pylist()))
        l = dict(zip(last.column("doc_id").to_pylist(), last.column("embeddings").to_pylist()))
        assert m[1] == l[1]
        assert m[0] != l[0]


class TestEmbeddingCreatorDataset:
    def test_end_to_end(self, ray_session):
        import ray

        ds = ray.data.from_arrow(_batch())
        out = embedding_creator_stage(ds, dim=16, concurrency=(1, 2)).take_all()
        assert len(out) == 5
        assert all(len(r["embeddings"]) == 16 for r in out)
        by_id = {r["doc_id"]: r["embeddings"] for r in out}
        assert by_id[0] == by_id[4]


class TestFastTextModelFile:
    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            load_fasttext_model("/tmp/does_not_exist_ft.bin")

    def test_roundtrip_and_predict(self, tmp_path):
        path = train_fasttext_stub_model(
            str(tmp_path / "quality.bin"), ["__label__hq", "__label__lq"]
        )
        model = load_fasttext_model(path)
        assert isinstance(model, _FastTextStubModel)
        top, probs = model.predict_batch(pa.array(TEXTS))
        assert top.shape == (5,) and probs.shape == (5,)
        assert np.all((probs > 0) & (probs <= 1))
        assert top[0] == top[4] and probs[0] == probs[4]  # deterministic

    def test_quality_score_formula(self, tmp_path):
        path = train_fasttext_stub_model(
            str(tmp_path / "quality.bin"), ["__label__hq", "__label__lq"]
        )
        stage = FastTextScoreStage(path, mode="quality", filter_rows=False)
        out = stage(_batch())
        scores = np.array(out.column("fasttext_quality_score").to_pylist())
        model = load_fasttext_model(path)
        top, probs = model.predict_batch(pa.array(TEXTS))
        expect = np.where(top == 0, probs, 1.0 - probs)  # hq is label 0
        assert np.allclose(scores, expect)

    def test_quality_filter_deterministic(self, tmp_path, ray_session):
        import ray

        path = train_fasttext_stub_model(
            str(tmp_path / "quality.bin"), ["__label__hq", "__label__lq"]
        )
        a = sorted(
            r["doc_id"]
            for r in fasttext_quality_filter(
                ray.data.from_arrow(_batch()), path, concurrency=(1, 2)
            ).take_all()
        )
        b = sorted(
            r["doc_id"]
            for r in fasttext_quality_filter(
                ray.data.from_arrow(_batch()).repartition(3), path, concurrency=(1, 2)
            ).take_all()
        )
        assert a == b  # partitioning-independent keep decisions

    def test_langid(self, tmp_path):
        path = train_fasttext_stub_model(
            str(tmp_path / "langid.bin"), ["__label__en", "__label__de", "__label__fr"]
        )
        stage = FastTextScoreStage(path, mode="langid", min_langid_score=0.0, filter_rows=False)
        out = stage(_batch())
        langs = out.column("fasttext_lang").to_pylist()
        assert set(langs) <= {"EN", "DE", "FR"}
        assert langs[0] == langs[4]
        # cutoff=1.01 filters everything
        stage2 = FastTextScoreStage(path, mode="langid", min_langid_score=1.01, filter_rows=True)
        assert len(stage2(_batch())) == 0

    def test_langid_dataset(self, tmp_path, ray_session):
        import ray

        path = train_fasttext_stub_model(
            str(tmp_path / "langid.bin"), ["__label__en", "__label__de"]
        )
        out = fasttext_langid(
            ray.data.from_arrow(_batch()), path, min_langid_score=0.0, concurrency=(1, 2)
        ).take_all()
        assert len(out) == 5
        assert all("fasttext_lang" in r and "fasttext_lang_score" in r for r in out)
