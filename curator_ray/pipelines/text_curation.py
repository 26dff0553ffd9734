"""End-to-end text-curation pipeline: clean → filter → exact-dedup → write.

The canonical Curator text recipe (reference examples compose
Modify → ScoreFilter → deduplication → writer around
``stages/text/modifiers``, ``filters/score_filter.py:29`` and
``stages/deduplication/exact``), expressed as one lazy Dataset chain —
every stage is a streaming ``map_batches``; the only wide operation is the
exact-dedup groupby inside ``exact_duplicate_ids``, which pre-aggregates
per block before shuffling (stages/exact.py). At 100 TB the chain executes
as a single backpressured pipeline: no stage materializes the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TextCurationConfig:
    text_field: str = "text"
    id_field: str = "doc_id"
    min_words: int | None = 20
    max_words: int | None = 60
    modifiers: tuple = ("unicode", "urls")
    extra_filters: list = field(default_factory=list)  # [(scorer, min, max), ...]


def text_curation_survivors(ds, cfg: TextCurationConfig | None = None):
    """Clean + filter + exact-dedup (keep lowest id per identical text);
    returns the surviving (id, text) rows as a lazy Dataset."""
    from ..stages.exact import exact_duplicate_ids
    from ..stages.ids import with_ids
    from ..stages.removal import remove_by_ids
    from ..stages.text import (
        filter_stage,
        modify_stage,
        unicode_reformatter,
        url_remover,
        word_count,
    )

    cfg = cfg or TextCurationConfig()
    out = ds
    if "unicode" in cfg.modifiers:
        out = modify_stage(out, unicode_reformatter, cfg.text_field)
    if "urls" in cfg.modifiers:
        out = modify_stage(out, url_remover, cfg.text_field)
    if cfg.min_words is not None or cfg.max_words is not None:
        out = filter_stage(out, word_count, cfg.text_field,
                           min_value=cfg.min_words, max_value=cfg.max_words)
    for scorer, lo, hi in cfg.extra_filters:
        out = filter_stage(out, scorer, cfg.text_field, min_value=lo, max_value=hi)
    out = with_ids(out, key_field=cfg.id_field).materialize()
    removal = exact_duplicate_ids(out, text_field=cfg.text_field)
    return remove_by_ids(out, removal)
