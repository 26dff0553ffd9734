"""Classifier scaffold: tokenizer contract, order restoration, determinism,
micro-batching invariance — porting the shapes of the reference's
tests/stages/text/classifiers suite to the stub model."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from curator_ray.stages.classifier import (
    INPUT_ID_FIELD,
    SEQ_ORDER_FIELD,
    TOKEN_LENGTH_FIELD,
    ClassifierModelStage,
    QUALITY_LABELS,
    TokenizerStage,
    classifier_stage,
    fineweb_edu_scorer,
    quality_classifier,
)

TEXTS = [
    "a short one",
    "this is a much longer document with many more words than the others here",
    "",
    "medium length text goes here now",
    "tiny",
]


def _batch():
    return pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS})


def test_tokenizer_contract():
    tok = TokenizerStage()
    out = tok(_batch())
    assert {INPUT_ID_FIELD, TOKEN_LENGTH_FIELD, SEQ_ORDER_FIELD} <= set(out.column_names)
    lens = out.column(TOKEN_LENGTH_FIELD).to_pylist()
    assert lens == sorted(lens)  # sorted by token length
    # token ids count == word count per doc
    by_id = dict(zip(out.column("doc_id").to_pylist(), lens))
    for i, t in enumerate(TEXTS):
        assert by_id[i] == len(t.split())
    # identical text -> identical ids (deterministic hash vocab)
    two = tok(pa.table({"doc_id": [0, 1], "text": ["same text", "same text"]}))
    ids = two.column(INPUT_ID_FIELD).to_pylist()
    assert ids[0] == ids[1]


def test_tokenizer_truncation():
    tok = TokenizerStage(max_seq_length=3, sort_by_length=False)
    out = tok(_batch())
    assert max(out.column(TOKEN_LENGTH_FIELD).to_pylist()) == 3
    assert max(len(x) for x in out.column(INPUT_ID_FIELD).to_pylist()) == 3


def test_model_restores_order_and_is_batch_invariant():
    tok = TokenizerStage()
    tokenized = tok(_batch())
    m1 = ClassifierModelStage(labels=QUALITY_LABELS, label_field="pred", score_field="prob")
    out1 = m1(tokenized)
    # order restored to the original batch order
    assert out1.column("doc_id").to_pylist() == list(range(len(TEXTS)))
    assert INPUT_ID_FIELD not in out1.column_names
    # micro-batch size must not change predictions
    m2 = ClassifierModelStage(
        labels=QUALITY_LABELS, label_field="pred", score_field="prob", model_inference_batch_size=2
    )
    out2 = m2(tok(_batch()))
    assert out1.column("pred").to_pylist() == out2.column("pred").to_pylist()
    assert np.allclose(out1.column("prob").to_numpy(), out2.column("prob").to_numpy())
    # probabilities are a distribution argmax
    assert all(0.0 < p <= 1.0 for p in out1.column("prob").to_pylist())


def test_classifier_stage_end_to_end(ray_session):
    import ray

    ds = ray.data.from_arrow(_batch())
    out = quality_classifier(ds).take_all()
    assert len(out) == len(TEXTS)
    assert all(r["quality_pred"] in QUALITY_LABELS for r in out)
    # deterministic across runs
    out2 = quality_classifier(ray.data.from_arrow(_batch())).take_all()
    assert [r["quality_pred"] for r in sorted(out, key=lambda r: r["doc_id"])] == [
        r["quality_pred"] for r in sorted(out2, key=lambda r: r["doc_id"])
    ]


def test_filter_by(ray_session):
    import ray

    ds = ray.data.from_arrow(_batch())
    all_rows = quality_classifier(ds).take_all()
    keep = {r["quality_pred"] for r in all_rows}
    label = sorted(keep)[0]
    filtered = quality_classifier(ray.data.from_arrow(_batch()), filter_by=[label]).take_all()
    assert len(filtered) == sum(r["quality_pred"] == label for r in all_rows)
    assert all(r["quality_pred"] == label for r in filtered)


def test_fineweb_edu_scorer(ray_session):
    import ray

    out = fineweb_edu_scorer(ray.data.from_arrow(_batch())).take_all()
    for r in out:
        assert 0.0 <= r["fineweb_edu_score"] <= 5.0
        assert r["fineweb_edu_score_int"] == round(r["fineweb_edu_score"])
