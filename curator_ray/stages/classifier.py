"""Text-classifier scaffold: tokenizer -> sort-by-length -> model actor pool.

Ray-Data-native counterpart of the reference's classifier composite
(``stages/text/classifiers/base.py:163-260`` DistributedDataClassifier =
TokenizerStage + ClassifierModelStage) and its model plumbing
(``models/tokenizer.py:39-``, ``models/model.py:36-140``):

- ``TokenizerStage``: actor-pool ``map_batches`` whose ``__init__`` builds the
  vocab hash state once per worker (the reference loads a HF tokenizer
  there); emits ``input_ids`` (ragged list<int32>), ``token_length`` and —
  when ``sort_by_length`` — reorders the batch by token length and records
  ``seq_order`` so the model stage can restore input order, exactly the
  reference's SEQ_ORDER_FIELD protocol;
- ``ClassifierModelStage``: actor-pool ``map_batches`` whose ``__init__``
  builds the model weights once per worker; ``__call__`` runs micro-batches
  of ``model_inference_batch_size`` docs (the reference's
  ``yield_next_batch``), restores ``seq_order``, drops token columns unless
  ``keep_tokens`` and appends ``label_field`` (+ ``score_field``).

Torch and the real DeBERTa weights are absent in this sandbox, so the model
is a deterministic stub — seeded hashed-bag-of-words embedding + linear head
+ softmax — but every piece of the distributed plumbing (actor setup, micro-
batching, length-sorted inference, order restoration, label mapping from a
sorted label list, filter_by) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUALITY_LABELS = ["High", "Medium", "Low"]  # quality.py label set
# nvidia/domain-classifier taxonomy (26 labels); the multilingual variant
# (classifiers/domain.py:88-) shares it.
DOMAIN_LABELS = [
    "Adult", "Arts_and_Entertainment", "Autos_and_Vehicles",
    "Beauty_and_Fitness", "Books_and_Literature", "Business_and_Industrial",
    "Computers_and_Electronics", "Finance", "Food_and_Drink", "Games",
    "Health", "Hobbies_and_Leisure", "Home_and_Garden",
    "Internet_and_Telecom", "Jobs_and_Education", "Law_and_Government",
    "News", "Online_Communities", "People_and_Society", "Pets_and_Animals",
    "Real_Estate", "Science", "Sensitive_Subjects", "Shopping", "Sports",
    "Travel_and_Transportation",
]
AEGIS_LABELS = ["safe", "needs caution", "unsafe"]
# nvidia/content-type-classifier-deberta: 11 speech types
# (classifiers/content_type.py:28-53; the real label list ships in the HF
# config and loads with the real model — this ordered set stands in).
CONTENT_TYPE_LABELS = [
    "Analysis", "Blogs", "Boilerplate Content", "Creative Writing", "News",
    "Online Comments", "Patent", "Personal Story", "Q&A Forum", "Reviews",
    "Wiki and Textbook",
]

INPUT_ID_FIELD = "input_ids"
TOKEN_LENGTH_FIELD = "token_length"
SEQ_ORDER_FIELD = "seq_order"


class TokenizerStage:
    """Stub word-hash tokenizer with the reference TokenizerStage contract."""

    def __init__(
        self,
        vocab_size: int = 1 << 16,
        text_field: str = "text",
        max_chars: int | None = None,
        max_seq_length: int | None = 512,
        sort_by_length: bool = True,
        seed: int = 42,
    ):
        # per-worker setup (the reference loads the HF tokenizer here)
        self.vocab_size = vocab_size
        self.text_field = text_field
        self.max_chars = max_chars
        self.max_seq_length = max_seq_length
        self.sort_by_length = sort_by_length
        self.seed = seed

    def _token_ids(self, texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        from ..functions.tokens import whitespace_token_ids

        ids64, counts = whitespace_token_ids(
            texts, self.vocab_size, self.seed, max_chars=self.max_chars
        )
        ids = ids64.astype(np.int32)
        if self.max_seq_length is not None and len(ids):
            # truncate each doc's token list to max_seq_length
            starts = np.concatenate([[0], np.cumsum(counts)])
            doc_idx = np.repeat(np.arange(len(counts)), counts)
            keep = (np.arange(len(ids)) - starts[doc_idx]) < self.max_seq_length
            ids = ids[keep]
            counts = np.minimum(counts, self.max_seq_length)
        return ids, counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.fill_null("")
        ids, counts = self._token_ids(col)
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        id_col = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), pa.array(ids, pa.int32()))
        out = batch.append_column(INPUT_ID_FIELD, id_col)
        out = out.append_column(TOKEN_LENGTH_FIELD, pa.array(counts.astype(np.int64), pa.int64()))
        if self.sort_by_length:
            order = np.argsort(counts, kind="stable")
            out = out.append_column(
                SEQ_ORDER_FIELD, pa.array(np.arange(len(counts), dtype=np.int64), pa.int64())
            ).take(order)
        return out


class ClassifierModelStage:
    """Stub classifier head with the reference ClassifierModelStage contract."""

    def __init__(
        self,
        labels: list[str],
        vocab_size: int = 1 << 16,
        dim: int = 32,
        model_inference_batch_size: int = 256,
        label_field: str = "preds",
        score_field: str | None = None,
        has_seq_order: bool = True,
        keep_tokens: bool = False,
        seed: int = 7,
    ):
        # per-worker model load (seeded deterministic weights stand in for
        # Deberta.from_pretrained().cuda().eval(), base.py:124-135)
        rng = np.random.RandomState(seed)
        self.emb = rng.normal(scale=0.5, size=(vocab_size, dim)).astype(np.float32)
        self.w = rng.normal(size=(dim, len(labels))).astype(np.float32)
        self.b = rng.normal(size=len(labels)).astype(np.float32)
        self.labels = list(labels)
        self.batch_size = model_inference_batch_size
        self.label_field = label_field
        self.score_field = score_field
        self.has_seq_order = has_seq_order
        self.keep_tokens = keep_tokens

    def _forward(self, flat_ids: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Mean hashed-BoW embedding -> linear -> softmax probs (n, labels)."""
        from ..functions.tokens import mean_pool, softmax

        feats = mean_pool(self.emb, flat_ids, counts)
        return softmax(feats @ self.w + self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_col = batch.column(INPUT_ID_FIELD)
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        counts = pc.list_value_length(ids_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = ids_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        probs = np.zeros((n, len(self.labels)), dtype=np.float32)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        for s in range(0, n, self.batch_size):  # micro-batched inference
            e = min(n, s + self.batch_size)
            probs[s:e] = self._forward(flat[offsets[s] : offsets[e]], counts[s:e])
        preds = probs.argmax(axis=1)
        out = batch.append_column(
            self.label_field, pa.array(np.array(self.labels, dtype=object)[preds].tolist(), pa.string())
        )
        if self.score_field is not None:
            out = out.append_column(
                self.score_field, pa.array(probs[np.arange(n), preds].astype(np.float64), pa.float64())
            )
        if not self.keep_tokens:
            out = out.drop_columns([INPUT_ID_FIELD, TOKEN_LENGTH_FIELD])
        if self.has_seq_order and SEQ_ORDER_FIELD in out.column_names:
            order = np.argsort(out.column(SEQ_ORDER_FIELD).to_numpy(), kind="stable")
            out = out.take(order).drop_columns([SEQ_ORDER_FIELD])
        return out


def classifier_stage(
    ds,
    labels: list[str],
    text_field: str = "text",
    label_field: str = "preds",
    score_field: str | None = None,
    filter_by: list[str] | None = None,
    model_inference_batch_size: int = 256,
    max_seq_length: int | None = 512,
    sort_by_length: bool = True,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 1024,
):
    """DistributedDataClassifier composite (base.py:163-260): tokenizer actor
    pool -> length-sorted micro-batched model actor pool -> optional label
    filter."""
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
    scored = tokenized.map_batches(
        ClassifierModelStage,
        fn_constructor_kwargs={
            "labels": labels,
            "label_field": label_field,
            "score_field": score_field,
            "has_seq_order": sort_by_length,
            "model_inference_batch_size": model_inference_batch_size,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    if filter_by:
        allowed = set(filter_by)
        scored = scored.map_batches(
            lambda b: b.filter(pc.is_in(b.column(label_field), value_set=pa.array(sorted(allowed)))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return scored


def quality_classifier(ds, text_field: str = "text", filter_by: list[str] | None = None):
    """QualityClassifier (classifiers/quality.py:28): High/Medium/Low."""
    return classifier_stage(
        ds, QUALITY_LABELS, text_field=text_field, label_field="quality_pred",
        score_field="quality_prob", filter_by=filter_by,
    )


def domain_classifier(ds, text_field: str = "text", filter_by: list[str] | None = None):
    """DomainClassifier (classifiers/domain.py): categorical domains."""
    return classifier_stage(
        ds, DOMAIN_LABELS, text_field=text_field, label_field="domain_pred",
        score_field="domain_prob", filter_by=filter_by,
    )


def aegis_classifier(ds, text_field: str = "text", filter_by: list[str] | None = None):
    """AegisClassifier (classifiers/aegis.py) safety labels."""
    return classifier_stage(
        ds, AEGIS_LABELS, text_field=text_field, label_field="safety_pred",
        score_field="safety_prob", filter_by=filter_by,
    )


def content_type_classifier(ds, text_field: str = "text", filter_by: list[str] | None = None):
    """ContentTypeClassifier (classifiers/content_type.py:28): 11 speech types."""
    return classifier_stage(
        ds, CONTENT_TYPE_LABELS, text_field=text_field, label_field="content_pred",
        score_field="content_prob", filter_by=filter_by, max_seq_length=1024,
    )


def multilingual_domain_classifier(ds, text_field: str = "text", filter_by: list[str] | None = None):
    """MultilingualDomainClassifier (classifiers/domain.py:88): same 26-domain
    taxonomy as DomainClassifier, multilingual backbone."""
    return classifier_stage(
        ds, DOMAIN_LABELS, text_field=text_field,
        label_field="multilingual_domain_pred", score_field="multilingual_domain_prob",
        filter_by=filter_by,
    )


def instruction_data_guard_classifier(ds, text_field: str = "text"):
    """InstructionDataGuardClassifier (classifiers/aegis.py:509): poisoning
    probability in [0, 1] + boolean ``is_poisoned`` at the 0.5 threshold."""
    scored = classifier_stage(
        ds, ["clean", "poisoned"], text_field=text_field,
        label_field="_idg_pred", score_field="_idg_prob",
    )

    def finish(b: pa.Table) -> pa.Table:
        poisoned = pc.equal(b.column("_idg_pred"), "poisoned")
        prob = b.column("_idg_prob")
        # prob is P(argmax label); flip to P(poisoned) when argmax was "clean"
        score = pc.if_else(poisoned, prob, pc.subtract(1.0, prob))
        out = b.append_column("instruction_data_guard_poisoning_score", score)
        out = out.append_column("is_poisoned", pc.greater_equal(score, 0.5))
        return out.drop_columns(["_idg_pred", "_idg_prob"])

    return scored.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _fineweb_scorer(ds, text_field: str, float_field: str, int_field: str,
                    label_field: str):
    """Shared _FineWebBaseClassifier shape (fineweb_edu.py:110-135): regression
    head -> float in [0,5], rounded int, high/low label at the 2.5 cut."""
    labels = [str(i) for i in range(6)]  # 0-5 educational-value buckets
    scored = classifier_stage(
        ds, labels, text_field=text_field, label_field="_fw_bucket", score_field="_fw_prob",
    )

    def finish(b: pa.Table) -> pa.Table:
        bucket = pc.cast(b.column("_fw_bucket"), pa.float64())
        # smooth score: bucket blended with its confidence, clipped to [0, 5]
        score = pc.min_element_wise(
            pc.max_element_wise(pc.add(bucket, pc.subtract(b.column("_fw_prob"), 0.5)), 0.0), 5.0
        )
        out = b.append_column(float_field, score)
        out = out.append_column(int_field, pc.cast(pc.round(score), pa.int64()))
        out = out.append_column(
            label_field,
            pc.if_else(pc.greater_equal(score, 2.5), "high_quality", "low_quality"),
        )
        return out.drop_columns(["_fw_bucket", "_fw_prob"])

    return scored.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def fineweb_edu_scorer(ds, text_field: str = "text"):
    """FineWebEduClassifier (classifiers/fineweb_edu.py:233): regression head ->
    float score in [0, 5] plus the rounded int score and quality label."""
    return _fineweb_scorer(
        ds, text_field, "fineweb-edu-score-float", "fineweb-edu-score-int",
        "fineweb-edu-score-label",
    )


def fineweb_mixtral_edu_scorer(ds, text_field: str = "text"):
    """FineWebMixtralEduClassifier (fineweb_edu.py:295)."""
    return _fineweb_scorer(
        ds, text_field, "fineweb-mixtral-edu-score-float",
        "fineweb-mixtral-edu-score-int", "fineweb-mixtral-edu-score-label",
    )


def fineweb_nemotron_edu_scorer(ds, text_field: str = "text"):
    """FineWebNemotronEduClassifier (fineweb_edu.py:358)."""
    return _fineweb_scorer(
        ds, text_field, "fineweb-nemotron-edu-score-float",
        "fineweb-nemotron-edu-score-int", "fineweb-nemotron-edu-score-label",
    )


# ------------------------------------------------- prompt task & complexity

# nvidia/prompt-task-and-complexity-classifier (prompt_task_complexity.py:34-48):
# one shared backbone, 8 heads. Head sizes / per-head score weights stand in for
# the HF config's target_sizes / weights_map / divisor_map (loaded with the real
# model); the post-processing contract below is the reference's exactly.
PTC_TASK_TYPES = [
    "Brainstorming", "Chatbot", "Classification", "Closed QA",
    "Code Generation", "Extraction", "Open QA", "Other", "Rewrite",
    "Summarization", "Text Generation",
]
PTC_COMPLEXITY_HEADS = {
    # head -> number of ordinal buckets; score = softmax @ [0..n-1] / (n-1)
    "creativity_scope": 5,
    "reasoning": 5,
    "contextual_knowledge": 5,
    "number_of_few_shots": 5,
    "domain_knowledge": 5,
    "no_label_reason": 2,
    "constraint_ct": 5,
}
PTC_OUTPUT_FIELDS = [
    "prompt_complexity_score", "task_type_1", "task_type_2", "task_type_prob",
    "creativity_scope", "reasoning", "contextual_knowledge",
    "number_of_few_shots", "domain_knowledge", "no_label_reason",
    "constraint_ct",
]


class PromptTaskComplexityModelStage:
    """Multi-headed stub model with the reference CustomDeberta contract
    (prompt_task_complexity.py:76-213): mean-pooled features -> 8 linear
    heads -> task-type top-2 (+NA rule) and weighted-softmax ordinal scores,
    ensembled into ``prompt_complexity_score``."""

    def __init__(
        self,
        vocab_size: int = 1 << 16,
        dim: int = 32,
        model_inference_batch_size: int = 256,
        has_seq_order: bool = True,
        keep_tokens: bool = False,
        seed: int = 11,
    ):
        rng = np.random.RandomState(seed)
        self.emb = rng.normal(scale=0.5, size=(vocab_size, dim)).astype(np.float32)
        self.heads = {"task_type": (
            rng.normal(size=(dim, len(PTC_TASK_TYPES))).astype(np.float32),
            rng.normal(size=len(PTC_TASK_TYPES)).astype(np.float32),
        )}
        for name, n in PTC_COMPLEXITY_HEADS.items():
            self.heads[name] = (
                rng.normal(size=(dim, n)).astype(np.float32),
                rng.normal(size=n).astype(np.float32),
            )
        self.batch_size = model_inference_batch_size
        self.has_seq_order = has_seq_order
        self.keep_tokens = keep_tokens

    def _scores(self, feats: np.ndarray) -> dict[str, np.ndarray]:
        from ..functions.tokens import softmax

        out: dict[str, np.ndarray] = {}
        # task_type head: top-2 labels + prob, second label "NA" below 0.1
        w, b = self.heads["task_type"]
        probs = softmax(feats @ w + b)
        top2 = np.argsort(-probs, axis=1)[:, :2]
        p1 = np.round(probs[np.arange(len(probs)), top2[:, 0]], 3)
        p2 = np.round(probs[np.arange(len(probs)), top2[:, 1]], 3)
        types = np.array(PTC_TASK_TYPES, dtype=object)
        out["task_type_1"] = types[top2[:, 0]]
        t2 = types[top2[:, 1]].copy()
        t2[p2 < 0.1] = "NA"
        out["task_type_2"] = t2
        out["task_type_prob"] = p1
        # ordinal heads: weighted softmax / divisor (compute_results else-branch)
        for name, n in PTC_COMPLEXITY_HEADS.items():
            w, b = self.heads[name]
            p = softmax(feats @ w + b)
            score = np.round(p @ np.arange(n, dtype=np.float64) / (n - 1), 4)
            if name == "number_of_few_shots":
                score = np.where(score >= 0.05, score, 0.0)
            out[name] = score
        # ensemble (prompt_task_complexity.py:172-193)
        out["prompt_complexity_score"] = np.round(
            0.35 * out["creativity_scope"] + 0.25 * out["reasoning"]
            + 0.15 * out["constraint_ct"] + 0.15 * out["domain_knowledge"]
            + 0.05 * out["contextual_knowledge"] + 0.05 * out["number_of_few_shots"],
            5,
        )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokens import mean_pool

        ids_col = batch.column(INPUT_ID_FIELD)
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        counts = pc.list_value_length(ids_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = ids_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        cols: dict[str, list] = {f: [] for f in PTC_OUTPUT_FIELDS}
        for s in range(0, n, self.batch_size):  # micro-batched inference
            e = min(n, s + self.batch_size)
            feats = mean_pool(self.emb, flat[offsets[s] : offsets[e]], counts[s:e])
            for f, v in self._scores(feats).items():
                cols[f].append(v)
        out = batch
        for f in PTC_OUTPUT_FIELDS:
            vals = np.concatenate(cols[f]) if cols[f] else np.array([])
            typ = pa.string() if f.startswith("task_type_") and f != "task_type_prob" else pa.float64()
            out = out.append_column(f, pa.array(vals.tolist(), typ))
        if not self.keep_tokens:
            out = out.drop_columns([INPUT_ID_FIELD, TOKEN_LENGTH_FIELD])
        if self.has_seq_order and SEQ_ORDER_FIELD in out.column_names:
            order = np.argsort(out.column(SEQ_ORDER_FIELD).to_numpy(), kind="stable")
            out = out.take(order).drop_columns([SEQ_ORDER_FIELD])
        return out


def prompt_task_complexity_classifier(
    ds,
    text_field: str = "text",
    filter_by: list[str] | None = None,
    model_inference_batch_size: int = 256,
    sort_by_length: bool = True,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 1024,
):
    """PromptTaskComplexityClassifier (prompt_task_complexity.py:282-369):
    tokenizer actor pool -> multi-headed model actor pool. ``filter_by`` is
    rejected exactly as the reference does."""
    if filter_by:
        msg = "filter_by not supported with PromptTaskComplexityClassifier"
        raise NotImplementedError(msg)
    tokenized = ds.map_batches(
        TokenizerStage,
        fn_constructor_kwargs={
            "text_field": text_field,
            "max_seq_length": 512,
            "sort_by_length": sort_by_length,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    return tokenized.map_batches(
        PromptTaskComplexityModelStage,
        fn_constructor_kwargs={
            "has_seq_order": sort_by_length,
            "model_inference_batch_size": model_inference_batch_size,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
