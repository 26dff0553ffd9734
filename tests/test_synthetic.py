"""Synthetic (Nemotron-CC) stages: prompt templating + client plumbing,
DiverseQA postprocess parsing/sampling, knowledge-list normalization —
porting the semantics of reference nemotron_cc.py:36-182 to the stub client."""

from __future__ import annotations

import pyarrow as pa
import pytest

from curator_ray.stages.synthetic import (
    EchoLLMClient,
    SyntheticLLMStage,
    WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE,
    _format_diverse_qa,
    diverse_qa_postprocess,
    knowledge_list_postprocess,
    wikipedia_rephrase,
)


def test_synthetic_stage_templating_and_alignment():
    stage = SyntheticLLMStage(
        prompt=WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE,
        system_prompt="sys",
        input_field="text",
        output_field="rephrased",
    )
    assert stage.client.ready  # setup ran in __init__ (once per actor)
    batch = pa.table({"doc_id": [1, 2], "text": ["alpha beta", "gamma"]})
    out = stage(batch)
    assert out.column("rephrased").to_pylist() == ["alpha beta", "gamma"]
    assert out.column("doc_id").to_pylist() == [1, 2]


def test_format_diverse_qa_parsing():
    gen = (
        "Here are the questions and answers based on the provided text:\n"
        "- Question: What is X?\n"
        "Answer: X is one.\n"
        "- Question: What is Y?\n"
        "- Answer: Y is two.\n"
    )
    out = _format_diverse_qa("doc body", gen, max_num_pairs=10, n_tokens=None, seed=3)
    assert out.startswith("doc body\n\n")
    assert out.count("Question:") >= 1  # sampled 1..max pairs
    assert "Answer:" in out
    # answer lines merge into their question
    assert "Question: What is X?\nAnswer: X is one." in out or "Question: What is Y?\nAnswer: Y is two." in out
    # malformed: answer before any question -> empty
    assert _format_diverse_qa("d", "Answer: orphan", 10, None, 0) == ""
    assert _format_diverse_qa("d", "", 10, None, 0) == ""
    # deterministic for a fixed seed
    assert out == _format_diverse_qa("doc body", gen, 10, None, 3)


@pytest.mark.usefixtures("ray_session")
def test_diverse_qa_postprocess_dataset():
    import ray

    gen = "Question: A?\nAnswer: a.\nQuestion: B?\nAnswer: b."
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["t one", "t two"], "diverse_qa": [gen, "junk"]})
    )
    out = diverse_qa_postprocess(ds).to_pandas().sort_values("doc_id")
    assert out.iloc[0].diverse_qa.startswith("t one\n\nQuestion:")
    assert out.iloc[1].diverse_qa == ""  # unparseable -> empty
    # partition-independent: same rows, different batching -> same output
    out2 = (
        diverse_qa_postprocess(
            ray.data.from_arrow(
                pa.table({"doc_id": [1, 2], "text": ["t one", "t two"], "diverse_qa": [gen, "junk"]})
            ).repartition(2)
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out.diverse_qa) == list(out2.diverse_qa)


@pytest.mark.usefixtures("ray_session")
def test_knowledge_list_postprocess_semantics():
    import ray

    cases = {
        "header then bullets": ("Key facts:\n- one\n- two", "one\ntwo"),
        "leading bullet kept": ("- one\n- two", "one\ntwo"),
        "indented continuation": ("- one\n  cont\nplain", "one\ncont\nplain"),
        "dash no space": ("-x\n- y", "-x\ny"),
        "empty": ("", ""),
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(cases)), pa.int64()),
                "knowledge_list": [v[0] for v in cases.values()],
            }
        )
    )
    out = knowledge_list_postprocess(ds).to_pandas().sort_values("doc_id")
    got = list(out.knowledge_list)
    want = [v[1] for v in cases.values()]
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_wikipedia_rephrase_actor_pool():
    import ray

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(10), pa.int64()), "text": [f"doc {i}" for i in range(10)]})
    )
    out = wikipedia_rephrase(ds).to_pandas().sort_values("doc_id")
    assert list(out.rephrased) == [f"doc {i}" for i in range(10)]


def test_qa_multilingual_generator(ray_session):
    import ray  # noqa: F401

    from curator_ray.stages.synthetic import qa_multilingual_synthetic

    langs = ["English", "Spanish", "Hindi"]
    out = qa_multilingual_synthetic(40, langs).take_all()
    assert len(out) == 40
    assert {r["language"] for r in out} <= set(langs)
    assert len({r["language"] for r in out}) > 1  # seeded pick actually varies
    for r in out:
        assert "*" not in r["text"]  # bold-stripping post-step
        assert r["language"] in r["text"]  # echo client returns the prompt
    # deterministic: same sample_id -> same language/text on a re-run
    out2 = qa_multilingual_synthetic(40, langs).take_all()
    m1 = {r["sample_id"]: (r["language"], r["text"]) for r in out}
    m2 = {r["sample_id"]: (r["language"], r["text"]) for r in out2}
    assert m1 == m2


def test_data_designer_gated():
    from curator_ray.stages.synthetic import data_designer_stage

    try:
        import data_designer  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="data-designer"):
            data_designer_stage(None, config_file="/tmp/nonexistent.yaml")
