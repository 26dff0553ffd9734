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
        assert 0.0 <= r["fineweb-edu-score-float"] <= 5.0
        assert r["fineweb-edu-score-int"] == round(r["fineweb-edu-score-float"])


def test_content_type_and_multilingual_domain(ray_session):
    import ray

    from curator_ray.stages.classifier import (
        CONTENT_TYPE_LABELS,
        DOMAIN_LABELS,
        content_type_classifier,
        multilingual_domain_classifier,
    )

    out = content_type_classifier(ray.data.from_arrow(_batch())).take_all()
    assert len(out) == len(TEXTS)
    assert all(r["content_pred"] in CONTENT_TYPE_LABELS for r in out)
    out = multilingual_domain_classifier(ray.data.from_arrow(_batch())).take_all()
    assert all(r["multilingual_domain_pred"] in DOMAIN_LABELS for r in out)


def test_instruction_data_guard(ray_session):
    import ray

    from curator_ray.stages.classifier import instruction_data_guard_classifier

    out = instruction_data_guard_classifier(ray.data.from_arrow(_batch())).take_all()
    for r in out:
        assert 0.0 <= r["instruction_data_guard_poisoning_score"] <= 1.0
        assert r["is_poisoned"] == (r["instruction_data_guard_poisoning_score"] > 0.5)


def test_fineweb_variants(ray_session):
    import ray

    from curator_ray.stages.classifier import (
        fineweb_mixtral_edu_scorer,
        fineweb_nemotron_edu_scorer,
    )

    out = fineweb_mixtral_edu_scorer(ray.data.from_arrow(_batch())).take_all()
    for r in out:
        s = r["fineweb-mixtral-edu-score-float"]
        assert 0.0 <= s <= 5.0
        assert r["fineweb-mixtral-edu-score-int"] == round(s)
        assert r["fineweb-mixtral-edu-score-label"] == (
            "high_quality" if s >= 2.5 else "low_quality"
        )
    out = fineweb_nemotron_edu_scorer(ray.data.from_arrow(_batch())).take_all()
    assert all("fineweb-nemotron-edu-score-label" in r for r in out)


def test_prompt_task_complexity(ray_session):
    import ray

    from curator_ray.stages.classifier import (
        PTC_OUTPUT_FIELDS,
        PTC_TASK_TYPES,
        prompt_task_complexity_classifier,
    )

    with pytest.raises(NotImplementedError, match="filter_by not supported"):
        prompt_task_complexity_classifier(None, filter_by=["Code Generation"])

    out = prompt_task_complexity_classifier(ray.data.from_arrow(_batch())).take_all()
    assert len(out) == len(TEXTS)
    by_id = {r["doc_id"]: r for r in out}
    assert sorted(by_id) == list(range(len(TEXTS)))
    for r in out:
        assert all(f in r for f in PTC_OUTPUT_FIELDS)
        assert r["task_type_1"] in PTC_TASK_TYPES
        assert r["task_type_2"] in PTC_TASK_TYPES or r["task_type_2"] == "NA"
        # ensemble formula holds exactly on the emitted component scores
        expect = round(
            0.35 * r["creativity_scope"] + 0.25 * r["reasoning"]
            + 0.15 * r["constraint_ct"] + 0.15 * r["domain_knowledge"]
            + 0.05 * r["contextual_knowledge"] + 0.05 * r["number_of_few_shots"],
            5,
        )
        assert abs(r["prompt_complexity_score"] - expect) < 1e-9
        assert r["number_of_few_shots"] == 0 or r["number_of_few_shots"] >= 0.05
    # micro-batch size must not change outputs
    out2 = prompt_task_complexity_classifier(
        ray.data.from_arrow(_batch()), model_inference_batch_size=2
    ).take_all()
    by_id2 = {r["doc_id"]: r for r in out2}
    for i in by_id:
        assert by_id[i]["task_type_1"] == by_id2[i]["task_type_1"]
        assert by_id[i]["prompt_complexity_score"] == by_id2[i]["prompt_complexity_score"]
