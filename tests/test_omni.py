"""Omni OCR synthetic family: JSON-verdict parsing, bbox gate, QA/conversation
assembly, balanced sampling, and the deterministic OCR-table derivation —
porting the shapes of the reference's omni scoring+QA stage to the stub VLM."""

from __future__ import annotations

import json
import random

import pyarrow as pa

from curator_ray.stages.omni import (
    EchoOCRScoringClient,
    OCRScoringQAStage,
    balanced_sample_qa,
    build_qa_tagged,
    derive_ocr_table,
    ocr_scoring_qa_stage,
    parse_json_object,
)


def _row(words, image_id="img-1"):
    return {
        "image_id": image_id,
        "ocr_dense": [
            {"bbox_2d": [i * 100, 0, i * 100 + 80, 50], "text_content": w}
            for i, w in enumerate(words)
        ],
    }


def _batch(rows):
    return pa.Table.from_pylist(rows)


def test_parse_json_object_robust():
    assert parse_json_object('```json\n{"a": 1}\n```') == {"a": 1}
    assert parse_json_object('noise {"a": {"b": 2}} trailing') == {"a": {"b": 2}}
    assert parse_json_object("no json here") is None
    assert parse_json_object("") is None
    assert parse_json_object("[1, 2]") is None  # array, not object


def test_echo_client_verdict_rules():
    stage = OCRScoringQAStage()
    prompt = stage._prompt(_row(["hello", "item7", "two words"])["ocr_dense"])
    (resp,) = EchoOCRScoringClient().generate([prompt])
    verdict = json.loads(resp)
    assert verdict["ocr_mode"] == "line"  # "two words" has 2 tokens
    by_idx = {v["idx"]: v for v in verdict["text"]}
    assert by_idx[0]["text_errors"] == 0 and by_idx[0]["is_word"]
    assert by_idx[1]["text_errors"] == 1  # contains a digit
    assert by_idx[2]["is_line"] and not by_idx[2]["is_word"]
    assert all(v["bbox_match"] == 10 for v in verdict["text"])
    assert verdict["missing_text"] == []


def test_gate_drops_digit_words_from_qa():
    stage = OCRScoringQAStage(dense_dump_prob=0.0)
    out = stage(_batch([_row(["alpha", "beta9", "gamma"])]))
    r = out.to_pylist()[0]
    assert r["n_bboxes"] == 3
    assert r["n_valid_bboxes"] == 2  # beta9 fails text_errors<=0
    assert r["is_valid"]
    convo = json.loads(r["conversation"])
    assert "beta9" not in r["conversation"]
    # alternating user/assistant, image ref on the first user turn only
    senders = [m["sender"] for m in convo]
    assert senders == ["user", "assistant"] * (len(convo) // 2)
    assert "image" in convo[0] and all("image" not in m for m in convo[1:])


def test_empty_and_unparseable():
    stage = OCRScoringQAStage()
    out = stage(_batch([_row([]), _row(["ok"], image_id="img-2")])).to_pylist()
    empty = next(r for r in out if r["image_id"] == "img-1")
    assert not empty["is_valid"] and "empty ocr_dense" in empty["error"]

    class BadClient(EchoOCRScoringClient):
        def generate(self, prompts, images=None):
            return ["not json at all"] * len(prompts)

    bad = OCRScoringQAStage(client_factory=BadClient)(_batch([_row(["x"])])).to_pylist()[0]
    assert not bad["is_valid"] and "could not parse JSON" in bad["error"]


def test_all_invalid_boxes_marks_image_invalid():
    # every box fails the gate -> image invalid before any conversation is
    # built, even when the dense-dump branch would otherwise fire
    stage = OCRScoringQAStage(dense_dump_prob=1.0)
    r = stage(_batch([_row(["a1", "b2"])])).to_pylist()[0]
    assert r["n_valid_bboxes"] == 0
    assert not r["is_valid"]
    assert "no bboxes passed quality threshold" in r["error"]
    assert r["conversation"] == ""


def test_gate_tolerates_non_numeric_verdict_fields():
    class NullFieldClient(EchoOCRScoringClient):
        def generate(self, prompts, images=None):
            return [json.dumps({
                "ocr_mode": "word",
                "text": [
                    {"idx": 0, "bbox_match": None, "text_errors": 0},
                    {"idx": 1, "bbox_match": 10, "text_errors": "zero"},
                    {"idx": 2, "bbox_match": 10, "text_errors": 0},
                ],
                "missing_text": [],
            })] * len(prompts)

    stage = OCRScoringQAStage(client_factory=NullFieldClient, dense_dump_prob=0.0)
    r = stage(_batch([_row(["aa", "bb", "cc"])])).to_pylist()[0]
    # the two malformed verdicts mark their boxes invalid; batch survives
    assert r["n_valid_bboxes"] == 1
    assert r["is_valid"]
    assert "cc" in r["conversation"]
    assert "aa" not in r["conversation"] and "bb" not in r["conversation"]


def test_dense_dump_and_determinism():
    forced = OCRScoringQAStage(dense_dump_prob=1.0)
    r = forced(_batch([_row(["alpha", "beta"])])).to_pylist()[0]
    convo = json.loads(r["conversation"])
    assert len(convo) == 2  # single-turn dense dump
    assert "alpha: [0, 0, 80, 50]" in convo[1]["text"]
    assert "beta: [100, 0, 180, 50]" in convo[1]["text"]
    # identical input -> identical conversation (per-image_id seeded RNG)
    stage = OCRScoringQAStage(dense_dump_prob=0.0)
    a = stage(_batch([_row(["one", "two", "three"])])).to_pylist()[0]
    b = stage(_batch([_row(["one", "two", "three"])])).to_pylist()[0]
    assert a["conversation"] == b["conversation"]


def test_balanced_sampler_quota():
    tagged = (
        [("t1", f"q{i}", "a") for i in range(10)]
        + [("t2", f"r{i}", "a") for i in range(10)]
    )
    rng = random.Random(0)
    picked = balanced_sample_qa(tagged, 6, rng)
    assert len(picked) == 6
    qs = {q for q, _ in picked}
    assert sum(q.startswith("q") for q in qs) == 3  # equal per-type quota
    assert sum(q.startswith("r") for q in qs) == 3
    # under the cap: everything kept
    assert len(balanced_sample_qa(tagged[:4], 6, random.Random(0))) == 4


def test_build_qa_tagged_disables_locate_on_many_invalids():
    boxes = _row(["a", "b", "c", "d", "e", "f", "g"])["ocr_dense"]
    valid = [True, False, False, False, False, False, True]  # 5 invalid >= threshold
    tagged = build_qa_tagged(boxes, valid, random.Random(1))
    assert tagged  # the two valid words still yield QA
    assert all(t in ("bbox_to_text", "point_to_text") for t, _, _ in tagged)


def test_derive_ocr_table_and_pipeline(ray_session):
    import ray

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [
            "alpha beta  gamma",  # double space: empty tokens dropped
            " ".join(f"w{i}" for i in range(20)),  # truncated to max_words
            "",
        ],
    })
    ocr = derive_ocr_table(ray.data.from_arrow(docs)).take_all()
    by_id = {r["image_id"]: r for r in ocr}
    words1 = [b["text_content"] for b in by_id["1"]["ocr_dense"]]
    assert words1 == ["alpha", "beta", "gamma"]
    assert by_id["1"]["ocr_dense"][0]["bbox_2d"] == [0, 0, 200, 60]
    assert by_id["1"]["ocr_dense"][1]["bbox_2d"] == [250, 0, 450, 60]
    assert len(by_id["2"]["ocr_dense"]) == 12  # max_words cap
    assert by_id["2"]["ocr_dense"][4]["bbox_2d"] == [0, 100, 200, 160]  # row 2
    assert by_id["3"]["ocr_dense"] == []

    out = ocr_scoring_qa_stage(
        derive_ocr_table(ray.data.from_arrow(docs)), dense_dump_prob=0.0
    ).take_all()
    by_id = {r["image_id"]: r for r in out}
    assert by_id["1"]["n_valid_bboxes"] == 3
    assert by_id["2"]["n_valid_bboxes"] == 0  # every wN token has a digit
    assert not by_id["3"]["is_valid"]
