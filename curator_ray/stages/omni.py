"""Omni OCR synthetic-data family (reference ``stages/synthetic/omni/``).

The reference pipeline is row-of-objects: ``ImageSampleTask[OCRData]`` flows
through ``ModelProcessingStage`` actors that build a bbox-verification prompt
per image, call a multimodal LLM (``base.py:37-209``), parse the JSON verdict
(``ocr_scoring_qa.py:95-104``), gate bboxes on ``bbox_match``/``text_errors``
(``ocr_scoring_qa.py:121-`` OCRScoringQAStage) and assemble multi-turn QA
conversations from the surviving boxes (``ocr_dense_qa.py:437-543``
build_qa_tagged / build_conversation / build_dense_conversation with a
balanced per-type sampler ``:67-103``).

Ray-Data-native version: one columnar table per corpus —
``image_id: string`` + ``ocr_dense: large_list<struct<bbox_2d, text_content>>``
— and ONE actor-pool ``map_batches`` stage that does prompt-build → client
call → JSON parse → gate → conversation assembly per batch. Per-row Python is
inherent here (string templating and JSON assembly per image); the cost sits
at the synthesis boundary exactly like the download/extract stages, and the
client call is batched per Arrow batch.

The cloud VLM is unreachable in this sandbox; ``EchoOCRScoringClient`` stands
in with a *content-derived, SQL-expressible* verdict (a bbox has
``text_errors=1`` iff its text contains a digit, ``bbox_match=10`` otherwise
full marks) so the gate semantics are oracle-checkable in DuckDB. Any client
exposing ``setup()`` + ``generate(prompts, images)`` drops in.

Determinism: the reference seeds its QA RNG with the framework task_id
(``build_qa_tagged`` :456); we seed per image with ``image_id`` so output is
reproducible under any partitioning.
"""

from __future__ import annotations

import json
import random
import re
from collections import defaultdict

import numpy as np
import pyarrow as pa

_JSON_OBJECT_RE = re.compile(r"\{.*\}", re.DOTALL)
_BBOX_COORD_COUNT = 4

# own wording; same JSON contract as the reference verifier prompt
# (ocr_scoring_qa.py:48-84)
_SCORING_PROMPT = (
    "Verify the OCR boxes below against the image and reply ONLY with JSON "
    'of the form {{"ocr_mode": "word"|"line", "text": [{{"idx": <int>, '
    '"is_word": <bool>, "is_line": <bool>, "bbox_match": <0-10>, '
    '"text_errors": <int>}}], "missing_text": [{{"text": "...", '
    '"bbox_2d": [y1, x1, y2, x2]}}]}}.\n'
    "Boxes (bbox_2d is [y1, x1, y2, x2] on a 0-1000 grid):\n{bboxes_json}\n"
    "Only output valid JSON."
)


def parse_json_object(text: str) -> dict | None:
    """First parsable JSON object in ``text``, code fences stripped
    (ocr_scoring_qa.py:87-104)."""
    cleaned = re.sub(r"```(?:json)?\s*|\s*```", "", text or "").strip()
    for match in _JSON_OBJECT_RE.finditer(cleaned):
        try:
            obj = json.loads(match.group(0))
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            return obj
    return None


class EchoOCRScoringClient:
    """Deterministic VLM stand-in: reads the bboxes JSON back out of the
    prompt and scores each box by content rules chosen to be expressible in
    SQL (see module docstring). Mirrors the LLMClient setup/generate shape
    used by the other synthetic stages."""

    def __init__(self) -> None:
        self.ready = False

    def setup(self) -> None:
        self.ready = True

    @staticmethod
    def _verdict(item: dict) -> dict:
        text = str(item.get("text", "") or "")
        words = text.split()
        return {
            "idx": item["idx"],
            "is_word": len(words) == 1,
            "is_line": len(words) > 1,
            "bbox_match": 10 if text.strip() else 0,
            # ASCII digits only (not str.isdigit): keeps the gate rule exactly
            # expressible as the DuckDB regex [0-9] in the oracle
            "text_errors": 1 if any(c in "0123456789" for c in text) else 0,
        }

    def generate(self, prompts: list[str], images: list | None = None) -> list[str]:
        out = []
        for p in prompts:
            boxes = parse_json_object("{\"b\": " + p.split("grid):\n", 1)[-1].rsplit("\nOnly", 1)[0] + "}")
            items = (boxes or {}).get("b") or []
            mode = "word" if all(len(str(i.get("text", "")).split()) <= 1 for i in items) else "line"
            out.append(json.dumps({
                "ocr_mode": mode,
                "text": [self._verdict(i) for i in items],
                "missing_text": [],
            }))
        return out


# ------------------------------------------------------------ QA templates
# Same five QA families as the reference generators (ocr_dense_qa.py:389-434),
# own phrasings.

_BBOX_TO_TEXT_Q = [
    "What is written inside the box {}?",
    "Transcribe the text found at {}.",
    "Report the text covered by the region {}.",
]
_POINT_TO_TEXT_Q = [
    "Which word sits at the point ({}, {})?",
    "What text is located at position ({}, {})?",
]
_TEXT_TO_BBOX_Q = [
    "Locate the text {} and answer with its box as [x1, y1, x2, y2].",
    "Where does {} appear? Reply with the bounding box [x1, y1, x2, y2].",
]
_TEXT_TO_BBOX_MULTI_Q = [
    "List every box containing {} as [x1, y1, x2, y2], left to right.",
]
_TEXT_TO_POINT_Q = [
    "Give the centre point of the text {} as (x, y).",
]
_DENSE_DUMP_Q = [
    "List every text region in the image as `text: [x1, y1, x2, y2]`, one per line.",
]

QA_TYPE_BBOX_TO_TEXT = "bbox_to_text"
QA_TYPE_POINT_TO_TEXT = "point_to_text"
QA_TYPE_TEXT_TO_BBOX = "text_to_bbox"
QA_TYPE_TEXT_TO_POINT = "text_to_point"
_MAX_INVALIDS_FOR_TEXT_TO_BBOX = 5  # ocr_dense_qa.py MAX_INVALID threshold:
# too many bad boxes means "where is X" answers could silently omit an
# occurrence, so the text->location QA families are disabled


def _fmt_box(b) -> str:
    return f"[{int(b[0])}, {int(b[1])}, {int(b[2])}, {int(b[3])}]"


def _bbox_center(b) -> tuple[int, int]:
    return (int(b[0]) + int(b[2])) // 2, (int(b[1]) + int(b[3])) // 2


def _quote(text: str) -> str:
    if '"' in text:
        return "'" + text.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return '"' + text.replace("\\", "\\\\") + '"'


def balanced_sample_qa(
    tagged: list[tuple[str, str, str]], max_pairs: int, rng: random.Random
) -> list[tuple[str, str]]:
    """Per-type balanced sampler (ocr_dense_qa.py:67-103): equal quota per QA
    type, remainder to the lexicographically first types, leftovers fill."""
    if len(tagged) <= max_pairs:
        result = [(q, a) for _, q, a in tagged]
        rng.shuffle(result)
        return result
    by_type: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for typ, q, a in tagged:
        by_type[typ].append((q, a))
    types = sorted(by_type)
    base, rem = divmod(max_pairs, len(types))
    selected: list[tuple[str, str]] = []
    leftover: list[tuple[str, str]] = []
    for i, typ in enumerate(types):
        bucket = by_type[typ]
        quota = base + (1 if i < rem else 0)
        if quota >= len(bucket):
            selected.extend(bucket)
        else:
            picked = set(rng.sample(range(len(bucket)), quota))
            for j, p in enumerate(bucket):
                (selected if j in picked else leftover).append(p)
    need = max_pairs - len(selected)
    if need > 0 and leftover:
        selected.extend(rng.sample(leftover, min(need, len(leftover))))
    rng.shuffle(selected)
    return selected


def build_qa_tagged(
    boxes: list[dict], valid: list[bool], rng: random.Random
) -> list[tuple[str, str, str]]:
    """Tagged (type, q, a) list over the gated boxes (ocr_dense_qa.py:437-504):
    one QA per distinct text, mode chosen by the seeded RNG; text->location
    families disabled when too many boxes failed the gate."""
    num_invalid = sum(1 for v in valid if not v)
    allow_locate = num_invalid < _MAX_INVALIDS_FOR_TEXT_TO_BBOX
    text_to_bboxes: dict[str, list] = defaultdict(list)
    for box, ok in zip(boxes, valid):
        text = str(box.get("text_content", "") or "").strip()
        bbox = box.get("bbox_2d")
        if ok and text and bbox is not None and len(bbox) == _BBOX_COORD_COUNT:
            text_to_bboxes[text].append(list(bbox))

    tagged: list[tuple[str, str, str]] = []
    for text, bbs in text_to_bboxes.items():
        mode = rng.choice((0, 1, 2, 3) if allow_locate else (0, 1))
        if mode == 0:
            q = rng.choice(_BBOX_TO_TEXT_Q).format(_fmt_box(bbs[0]))
            tagged.append((QA_TYPE_BBOX_TO_TEXT, q, text))
        elif mode == 1:
            cx, cy = _bbox_center(bbs[0])
            q = rng.choice(_POINT_TO_TEXT_Q).format(cx, cy)
            tagged.append((QA_TYPE_POINT_TO_TEXT, q, text))
        elif mode == 2:
            if len(bbs) == 1:
                q = rng.choice(_TEXT_TO_BBOX_Q).format(_quote(text))
                a = _fmt_box(bbs[0])
            else:
                q = rng.choice(_TEXT_TO_BBOX_MULTI_Q).format(_quote(text))
                a = ", ".join(_fmt_box(b) for b in sorted(bbs, key=lambda b: (b[0] + b[2]) / 2))
            tagged.append((QA_TYPE_TEXT_TO_BBOX, q, a))
        else:
            q = rng.choice(_TEXT_TO_POINT_Q).format(_quote(text))
            centers = sorted(_bbox_center(b) for b in bbs)
            a = "; ".join(f"({x}, {y})" for x, y in centers)
            tagged.append((QA_TYPE_TEXT_TO_POINT, q, a))
    return tagged


def _dense_dump(boxes: list[dict], valid: list[bool], rng: random.Random) -> tuple[str, str]:
    q = rng.choice(_DENSE_DUMP_Q)
    lines = [
        f"{str(b.get('text_content', '') or '').strip()}: {_fmt_box(b['bbox_2d'])}"
        for b, ok in zip(boxes, valid)
        if ok and b.get("bbox_2d") is not None
    ]
    return q, "\n".join(lines)


def _conversation_json(image_id: str, qa_pairs: list[tuple[str, str]]) -> str:
    """Alternating user/assistant messages; first user turn carries the image
    reference, matching build_conversation (ocr_dense_qa.py:507-524)."""
    messages = []
    for i, (q, a) in enumerate(qa_pairs):
        user: dict = {"sender": "user", "text": q}
        if i == 0:
            user["image"] = image_id
        messages.append(user)
        messages.append({"sender": "assistant", "text": a})
    return json.dumps(messages, ensure_ascii=False)


class OCRScoringQAStage:
    """Actor: per-worker client setup, per-batch verify→gate→QA.

    Mirrors OCRScoringQAStage (ocr_scoring_qa.py:121-299): the verifier is
    called once per image, boxes failing ``bbox_match >= min_bbox_match`` or
    ``text_errors <= max_text_errors`` are dropped from QA generation, and a
    dense-dump single-turn conversation replaces the multi-turn QA with
    probability ``dense_dump_prob`` when no missing text was reported.
    """

    def __init__(
        self,
        client_factory=None,
        min_bbox_match: int = 5,
        max_text_errors: int = 0,
        fail_on_missing_text: bool = False,
        dense_dump_prob: float = 0.05,
        max_qa_pairs: int = 100,
    ):
        self.client = (client_factory or EchoOCRScoringClient)()
        self.client.setup()  # once per worker
        self.min_bbox_match = min_bbox_match
        self.max_text_errors = max_text_errors
        self.fail_on_missing_text = fail_on_missing_text
        self.dense_dump_prob = dense_dump_prob
        self.max_qa_pairs = max_qa_pairs

    def _prompt(self, boxes: list[dict]) -> str:
        payload = [
            {
                "idx": i,
                "bbox_2d": [b["bbox_2d"][1], b["bbox_2d"][0], b["bbox_2d"][3], b["bbox_2d"][2]],
                "text": str(b.get("text_content", "") or ""),
            }
            for i, b in enumerate(boxes)
            if b.get("bbox_2d") is not None and len(b["bbox_2d"]) == _BBOX_COORD_COUNT
        ]
        return _SCORING_PROMPT.format(bboxes_json=json.dumps(payload, ensure_ascii=False))

    def _gate(self, boxes: list[dict], verdict: dict) -> tuple[list[bool], str, int]:
        per_idx = {int(v.get("idx", -1)): v for v in verdict.get("text") or [] if isinstance(v, dict)}
        valid = []
        for i in range(len(boxes)):
            v = per_idx.get(i)
            # A real VLM client may return null / non-numeric fields; a
            # conversion failure marks that one bbox invalid rather than
            # failing the batch (ocr_scoring_qa.py handle_response).
            ok = False
            if v is not None:
                try:
                    ok = (
                        int(v.get("bbox_match", 0)) >= self.min_bbox_match
                        and int(v.get("text_errors", 0)) <= self.max_text_errors
                    )
                except (TypeError, ValueError):
                    ok = False
            valid.append(ok)
        missing = verdict.get("missing_text") or []
        return valid, str(verdict.get("ocr_mode", "unknown")), len(missing)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        dense = batch.column("ocr_dense").to_pylist()
        rows = [(d or []) for d in dense]
        keep = [i for i, r in enumerate(rows) if r]
        prompts = [self._prompt(rows[i]) for i in keep]
        responses = self.client.generate(prompts, None)

        n = len(batch)
        modes = ["unknown"] * n
        n_boxes = [len(r) for r in rows]
        n_valid = [0] * n
        miss = [0] * n
        convo = [""] * n
        is_valid = [False] * n
        errs = [None] * n
        for i, resp in zip(keep, responses):
            verdict = parse_json_object(resp)
            if verdict is None:
                errs[i] = f"ocr_scoring_qa: could not parse JSON: {resp[:80]!r}"
                continue
            valid, mode, missing = self._gate(rows[i], verdict)
            modes[i] = mode
            n_valid[i] = sum(valid)
            miss[i] = missing
            if missing and self.fail_on_missing_text:
                errs[i] = "ocr_scoring_qa: missing text reported"
                continue
            if rows[i] and n_valid[i] == 0:
                # reference marks the image invalid before any conversation is
                # built — otherwise the dense-dump branch would emit a
                # degenerate empty-answer QA pair over all-invalid boxes
                errs[i] = "ocr_scoring_qa: no bboxes passed quality threshold"
                continue
            rng = random.Random(ids[i])  # per-image reproducible (see docstring)
            if missing == 0 and rng.random() < self.dense_dump_prob:
                q, a = _dense_dump(rows[i], valid, rng)
                pairs = [(q, a)]
            else:
                tagged = build_qa_tagged(rows[i], valid, rng)
                pairs = balanced_sample_qa(tagged, self.max_qa_pairs, rng)
            if not pairs:
                errs[i] = "ocr_scoring_qa: no QA pairs generated"
                continue
            convo[i] = _conversation_json(str(ids[i]), pairs)
            is_valid[i] = True
        for i in range(n):
            if not rows[i]:
                errs[i] = "ocr_scoring_qa: empty ocr_dense"

        return pa.table({
            "image_id": batch.column("image_id"),
            "ocr_mode": pa.array(modes, pa.string()),
            "n_bboxes": pa.array(n_boxes, pa.int64()),
            "n_valid_bboxes": pa.array(n_valid, pa.int64()),
            "n_missing": pa.array(miss, pa.int64()),
            "conversation": pa.array(convo, pa.string()),
            "is_valid": pa.array(is_valid, pa.bool_()),
            "error": pa.array(errs, pa.string()),
        })


def ocr_scoring_qa_stage(ds, concurrency: tuple[int, int] = (1, 8),
                         batch_size: int = 64, **kwargs):
    """OCRScoringQAStage as an actor-pool ``map_batches`` (client per worker,
    one verifier call batch per Arrow batch)."""
    return ds.map_batches(
        OCRScoringQAStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ------------------------------------------------- synthetic OCR derivation


def derive_ocr_table(ds, text_field: str = "text", id_field: str = "doc_id",
                     max_words: int = 12):
    """Deterministically derive an OCR table from a text corpus for tests and
    benchmarks: the first ``max_words`` whitespace tokens of each document
    become word boxes laid out on a 4-column grid of the 0-1000 normalized
    page (x1 = col*250, y1 = row*100, x2 = x1+200, y2 = y1+60). Vectorized:
    one split + ragged slice, nested column built from flat buffers."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_field)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.fill_null("") if texts.null_count else texts
        splits = pc.split_pattern_regex(texts, r"\s+")
        flat = splits.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        # rank of each non-empty token within its doc: exclusive prefix count
        # of non-empties, rebased at each doc start
        cum_ex = np.cumsum(nonempty) - nonempty
        if len(flat):
            doc_base = cum_ex[np.minimum(starts[:-1], len(flat) - 1)]
            rank = cum_ex - np.repeat(doc_base, counts)
        else:
            rank = cum_ex
        keep = nonempty & (rank < max_words)
        kept_words = flat.filter(pa.array(keep))
        kept_doc = doc_of[keep]
        kept_rank = rank[keep]
        x1 = (kept_rank % 4) * 250
        y1 = (kept_rank // 4) * 100
        bboxes = np.stack([x1, y1, x1 + 200, y1 + 60], axis=1).astype(np.int32)
        box_off = np.arange(0, 4 * (len(bboxes) + 1), 4, dtype=np.int32)
        bbox_col = pa.ListArray.from_arrays(
            pa.array(box_off, pa.int32()), pa.array(bboxes.reshape(-1), pa.int32())
        )
        struct = pa.StructArray.from_arrays(
            [bbox_col, kept_words.cast(pa.string())], ["bbox_2d", "text_content"]
        )
        per_doc = np.zeros(len(batch), dtype=np.int32)
        np.add.at(per_doc, kept_doc, 1)
        offsets = np.concatenate([[0], np.cumsum(per_doc)]).astype(np.int32)
        dense = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return pa.table({
            "image_id": pc.cast(batch.column(id_field), pa.string()),
            "ocr_dense": dense,
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
