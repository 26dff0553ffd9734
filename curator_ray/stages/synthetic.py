"""Synthetic-data stages (Nemotron-CC style LLM rewriting).

Ray-Data-first counterparts of the reference ``stages/synthetic/nemotron_cc``
family (``nemotron_cc.py:36-182``, ``base.py:30-110``):

- ``synthetic_stage``            — BaseSyntheticStage: prompt-template a text
  column and call an LLM client once per record (actor pool: the client
  connects once per worker).
- ``wikipedia_rephrase`` / ``diverse_qa`` / ``distill`` /
  ``extract_knowledge`` / ``knowledge_list`` — the five prompt presets.
- ``diverse_qa_postprocess``     — DiverseQAPostProcessingStage
  (nemotron_cc.py:57-120): parse the generated QA bullet list, sample up to
  ``max_num_pairs`` pairs, concatenate onto the source document.
- ``knowledge_list_postprocess`` — KnowledgeListPostProcessingStage
  (nemotron_cc.py:151-182): normalize leading bullets / indentation.

No LLM is reachable in this sandbox, so the default client is
``EchoLLMClient`` — a deterministic stand-in that makes the plumbing
(prompt templating, per-worker client setup, response column contract)
real and testable; any object with ``setup()`` + ``generate(prompts) ->
list[str]`` (e.g. an OpenAI-compatible HTTP client) drops in unchanged.

Determinism note: the reference samples QA pairs with the process-global
``random`` module, which is not reproducible across a distributed run. Here
the sample is keyed on a murmur3 hash of the row's text, so any partitioning
of the data yields identical output — the distributed-correct variant of the
same sampling semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _texts, token_count

# Prompt presets mirroring the reference templates' contracts
# (prompts.py:21-92): each takes the document via ``{document}``.
NEMOTRON_CC_SYSTEM_PROMPT = "You are a careful assistant that follows formatting instructions exactly."
NEMOTRON_CC_DISTILL_SYSTEM_PROMPT = "You are a precise assistant that condenses text without losing facts."

WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE = (
    'Paraphrase the following text into high-quality encyclopedic English. Begin your answer on a '
    'separate line with "Here is a paraphrased version:".\n\nText: {document}'
)
DIVERSE_QA_PROMPT_TEMPLATE = (
    "Write diverse question-answer pairs covering the factual content of the text below. Prefix "
    'each question with "Question:" and each answer with "Answer:".\n\nText:\n{document}'
)
DISTILL_PROMPT_TEMPLATE = (
    "Condense the following text, keeping every load-bearing fact and removing redundancy.\n\n"
    "Text:\n{document}"
)
EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE = (
    "Rewrite the knowledge contained in the text below as self-contained statements.\n\n"
    "Text:\n{document}"
)
KNOWLEDGE_LIST_PROMPT_TEMPLATE = (
    "Review the text and extract the key information as a bulleted list (one fact per line, "
    'each starting with "- ").\n\nText:\n{document}'
)


class EchoLLMClient:
    """Deterministic stand-in for the reference's LLMClient
    (models/client/llm_client.py:51-): returns the document portion of the
    prompt verbatim (optionally with a fixed preamble), so downstream
    postprocessing is exercised on predictable text."""

    def __init__(self, preamble: str = ""):
        self.preamble = preamble
        self.ready = False

    def setup(self) -> None:
        self.ready = True

    def generate(self, prompts: list[str], documents: list[str]) -> list[str]:
        return [self.preamble + d for d in documents]


class SyntheticLLMStage:
    """Actor: per-worker client setup, per-batch prompt templating + calls."""

    def __init__(self, prompt: str, system_prompt: str, input_field: str,
                 output_field: str, client_factory=None):
        self.prompt = prompt
        self.system_prompt = system_prompt
        self.input_field = input_field
        self.output_field = output_field
        self.client = (client_factory or EchoLLMClient)()
        self.client.setup()

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.input_field).to_pylist()
        prompts = [self.prompt.format(document=d or "") for d in docs]
        responses = self.client.generate(prompts, docs)
        return batch.append_column(self.output_field, pa.array(responses, pa.string()))


def synthetic_stage(ds, prompt: str, system_prompt: str = NEMOTRON_CC_SYSTEM_PROMPT,
                    input_field: str = "text", output_field: str = "generated",
                    client_factory=None, concurrency: tuple[int, int] = (1, 8),
                    batch_size: int = 256):
    """BaseSyntheticStage (base.py:30-110) as an actor-pool map_batches."""
    return ds.map_batches(
        SyntheticLLMStage,
        fn_constructor_kwargs={
            "prompt": prompt,
            "system_prompt": system_prompt,
            "input_field": input_field,
            "output_field": output_field,
            "client_factory": client_factory,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def wikipedia_rephrase(ds, **kw):
    return synthetic_stage(ds, WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE,
                           output_field=kw.pop("output_field", "rephrased"), **kw)


def diverse_qa(ds, **kw):
    return synthetic_stage(ds, DIVERSE_QA_PROMPT_TEMPLATE,
                           output_field=kw.pop("output_field", "diverse_qa"), **kw)


def distill(ds, **kw):
    return synthetic_stage(ds, DISTILL_PROMPT_TEMPLATE,
                           system_prompt=NEMOTRON_CC_DISTILL_SYSTEM_PROMPT,
                           output_field=kw.pop("output_field", "distill"), **kw)


def extract_knowledge(ds, **kw):
    return synthetic_stage(ds, EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE,
                           output_field=kw.pop("output_field", "extract_knowledge"), **kw)


def knowledge_list(ds, **kw):
    return synthetic_stage(ds, KNOWLEDGE_LIST_PROMPT_TEMPLATE,
                           output_field=kw.pop("output_field", "knowledge_list"), **kw)


# ------------------------------------------------------------ postprocessing


def _format_diverse_qa(text: str, generated: str, max_num_pairs: int,
                       n_tokens: int | None, seed: int) -> str:
    """Per-record QA formatting (nemotron_cc.py:74-111), with the global-RNG
    shuffle replaced by a per-record seeded RNG (see module docstring)."""
    lines = [ln.strip() for ln in (generated or "").split("\n") if ln.strip()]
    if not lines:
        return ""
    lines = [ln[2:].strip() if ln.startswith("- ") else ln for ln in lines]
    if lines and lines[0] == "Here are the questions and answers based on the provided text:":
        lines = lines[1:]
    qa_pairs: list[str] = []
    for ln in lines:
        if ln.startswith("Question:"):
            qa_pairs.append(ln)
        elif qa_pairs:
            qa_pairs[-1] += "\n" + ln
        else:
            return ""
    if not qa_pairs:
        return ""
    rng = np.random.default_rng(seed)
    rng.shuffle(qa_pairs)
    if n_tokens is not None:
        cap = max(1, int(max_num_pairs * n_tokens / 150))
    else:
        cap = max_num_pairs
    qa_pairs = qa_pairs[: rng.integers(1, cap + 1)]
    return f"{text}\n\n" + "\n\n".join(qa_pairs)


def diverse_qa_postprocess(ds, input_field: str = "text", qa_field: str = "diverse_qa",
                           max_num_pairs: int = 10, use_token_count: bool = False):
    """DiverseQAPostProcessingStage (nemotron_cc.py:57-120)."""
    from .ids import hash_ids_from_strings

    def fn(batch: pa.Table) -> pa.Table:
        texts = _texts(batch, input_field)
        gens = batch.column(qa_field).to_pylist()
        seeds = hash_ids_from_strings(texts).astype(np.uint64)
        ntok = (
            token_count(texts).to_numpy(zero_copy_only=False)
            if use_token_count else [None] * len(batch)
        )
        out = [
            _format_diverse_qa(t or "", g, max_num_pairs,
                               int(ntok[i]) if ntok[i] is not None else None, int(seeds[i]))
            for i, (t, g) in enumerate(zip(texts.to_pylist(), gens))
        ]
        idx = batch.column_names.index(qa_field)
        return batch.set_column(idx, qa_field, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def knowledge_list_postprocess(ds, input_field: str = "knowledge_list"):
    """KnowledgeListPostProcessingStage (nemotron_cc.py:151-182): drop a
    non-bullet header line, strip two-space / "- " lead-ins, keep the rest.

    Vectorized: split to a list column, build per-line masks and slices with
    Arrow kernels, re-join — no Python over rows.
    """

    def fn(batch: pa.Table) -> pa.Table:
        col = _texts(batch, input_field)
        col = pc.if_else(pc.is_valid(col), col, "")
        splits = pc.split_pattern(col, "\n")
        flat = splits.flatten()
        lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lengths)

        starts_dash = pc.starts_with(flat, "-").to_numpy(zero_copy_only=False)
        drop = (pos == 0) & ~starts_dash
        strip2 = pc.or_(
            pc.starts_with(flat, "  "), pc.starts_with(flat, "- ")
        ).to_numpy(zero_copy_only=False)
        stripped = pc.utf8_trim_whitespace(pc.utf8_slice_codeunits(flat, 2))
        lines = pc.if_else(pa.array(strip2), stripped, flat)

        keep = ~drop
        kept_lines = lines.filter(pa.array(keep))
        kept_doc = np.repeat(np.arange(len(batch)), lengths)[keep]
        # rebuild list offsets over kept lines (docs may lose their header)
        counts = np.zeros(len(batch), dtype=np.int32)
        np.add.at(counts, kept_doc, 1)
        new_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), kept_lines), "\n"
        )
        idx = batch.column_names.index(input_field)
        return batch.set_column(idx, input_field, joined)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------- QA multilingual generator

QA_MULTILINGUAL_PROMPT_TEMPLATE = (
    "Write one question about everyday life and a helpful answer to it. "
    "Write both entirely in {language}."
)


class QAMultilingualGenStage:
    """Actor for QAMultilingualSyntheticStage (synthetic/
    qa_multilingual_synthetic.py:33-129): generate ``num_samples`` synthetic
    QA texts from nothing. The reference's ``secrets.choice(languages)`` is
    replaced with a per-sample seeded pick (hash of the sample ordinal) so the
    output is reproducible under any partitioning; the ``*`` bold-stripping
    post-step (:63-72) is kept verbatim."""

    def __init__(self, prompt: str, languages: list[str], client_factory=None,
                 seed: int = 42):
        from ..functions.murmur import murmur3_x86_32

        self.prompt = prompt
        self.languages = list(languages)
        self.seed = seed
        self._hash = murmur3_x86_32
        self.client = (client_factory or EchoLLMClient)()
        self.client.setup()  # once per worker

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype("<u4")
        rows = np.ascontiguousarray(ids).view(np.uint8).reshape(len(ids), 4)
        picks = self._hash(rows, seed=self.seed) % len(self.languages)
        prompts = [self.prompt.format(language=self.languages[int(p)]) for p in picks]
        responses = self.client.generate(prompts, prompts)
        texts = [(r or "").replace("*", "") for r in responses]  # strip bolding
        return pa.table({
            "sample_id": batch.column("id"),
            "language": pa.array([self.languages[int(p)] for p in picks], pa.string()),
            "text": pa.array(texts, pa.string()),
        })


def qa_multilingual_synthetic(num_samples: int, languages: list[str],
                              prompt: str = QA_MULTILINGUAL_PROMPT_TEMPLATE,
                              client_factory=None,
                              concurrency: tuple[int, int] = (1, 8),
                              batch_size: int = 256):
    """EmptyTask -> DocumentBatch generator as a Ray Data pipeline:
    ``ray.data.range(num_samples)`` fans the sample ordinals across the
    cluster and the actor pool generates per-record — the reference's
    sequential sync loop (:74-88) becomes batch-parallel for free."""
    import ray

    ds = ray.data.range(num_samples)
    return ds.map_batches(
        QAMultilingualGenStage,
        fn_constructor_kwargs={
            "prompt": prompt,
            "languages": languages,
            "client_factory": client_factory,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ------------------------------------------------ NeMo Data Designer (gated)


def data_designer_stage(ds, config_builder=None, config_file: str | None = None,
                        model_providers: list | None = None,
                        concurrency: tuple[int, int] = (1, 4),
                        batch_size: int = 1024):
    """DataDesignerStage (synthetic/nemo_data_designer/data_designer.py:32-139):
    each batch becomes the seed dataset of a DataDesigner preview run. Gated on
    the external ``data_designer`` package exactly like the Lance and vLLM
    integrations — absent in this sandbox."""
    try:
        import data_designer.config as _dd  # noqa: F401
    except ImportError as e:  # pragma: no cover - package absent in sandbox
        msg = (
            "data_designer_stage requires the 'data-designer' package "
            "(pip install data-designer); not available in this environment"
        )
        raise ImportError(msg) from e
    if (config_builder is None) == (config_file is None):
        raise ValueError("exactly one of config_builder / config_file must be set")

    class _Actor:  # pragma: no cover - requires the external package
        def __init__(self):
            import data_designer.config as dd
            from data_designer.interface import DataDesigner

            self.builder = (
                config_builder
                if config_builder is not None
                else dd.DataDesignerConfigBuilder.from_config(config_file)
            )
            self.designer = (
                DataDesigner(model_providers=model_providers)
                if model_providers is not None else DataDesigner()
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            import data_designer.config as dd

            self.builder.with_seed_dataset(dd.DataFrameSeedSource(df=batch.to_pandas()))
            results = self.designer.preview(self.builder, num_records=len(batch))
            return pa.Table.from_pandas(results.dataset, preserve_index=False)

    return ds.map_batches(
        _Actor, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
    )
