"""CLI entry point — the ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- python -m curator_ray.cli dedup \
        --input /data/images_lance --output /data/deduped \
        --char-ngrams 24 --num-bands 20 --minhashes-per-band 13

In this sandbox the same command runs against the local Ray (the module
guards its ``ray.init`` so the job driver owns the session either way).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="curator_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="full image+caption dedup workflow")
    d.add_argument("--input", required=True, help="parquet/lance directory (input_hint schema)")
    d.add_argument("--output", required=True)
    d.add_argument("--char-ngrams", type=int, default=24)
    d.add_argument("--num-bands", type=int, default=20)
    d.add_argument("--minhashes-per-band", type=int, default=13)
    d.add_argument("--seed", type=int, default=42)
    d.add_argument("--no-substring", action="store_true")
    d.add_argument(
        "--substring-exact",
        action="store_true",
        help="use the distributed suffix-array exact-substring stage (checkpointed "
        "per doubling round) instead of the default winnowed fingerprints",
    )
    d.add_argument("--substring-min-length", type=int, default=50)
    d.add_argument("--no-survivors", action="store_true")
    d.add_argument("--no-checkpoint", action="store_true")
    d.add_argument(
        "--lazy-signatures",
        action="store_true",
        help="streaming path only: keep the (id, caption, phash) projection "
        "lazy instead of plasma-resident — for corpora where rows x 90 B "
        "outgrows the cluster's aggregate object store (SCALE.md)",
    )

    s = sub.add_parser("synth", help="generate the synthetic image+caption table")
    s.add_argument("--output", required=True)
    s.add_argument("--rows", type=int, default=10_000)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--no-pixels", action="store_true")

    t = sub.add_parser(
        "text-curation",
        help="canonical text recipe: clean -> filter -> exact-dedup -> write",
    )
    t.add_argument("--input", required=True, help="parquet or jsonl directory/file of documents")
    t.add_argument("--output", required=True, help="output parquet directory")
    t.add_argument("--text-field", default="text")
    t.add_argument("--id-field", default="doc_id")
    t.add_argument("--min-words", type=int, default=20)
    t.add_argument("--max-words", type=int, default=60)
    t.add_argument("--modifiers", default="unicode,urls", help="comma list of {unicode, urls}")

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    if args.cmd == "synth":
        from .sources.synth import write_synth_dataset

        write_synth_dataset(
            args.output, n_rows=args.rows, seed=args.seed, with_pixels=not args.no_pixels, use_ray=True
        )
        print(json.dumps({"output": args.output, "rows": args.rows}))
        return 0

    if args.cmd == "text-curation":
        from .pipelines.text_curation import TextCurationConfig, text_curation_survivors
        from .sources.io import read_jsonl, read_parquet, write_parquet

        reader = read_jsonl if args.input.rstrip("/").endswith((".jsonl", ".json")) else read_parquet
        ds = reader(args.input)
        cfg = TextCurationConfig(
            text_field=args.text_field,
            id_field=args.id_field,
            min_words=args.min_words,
            max_words=args.max_words,
            modifiers=tuple(m for m in args.modifiers.split(",") if m),
        )
        survivors = text_curation_survivors(ds, cfg)
        write_parquet(survivors, args.output, mode="overwrite")
        import ray as _ray

        n = _ray.data.read_parquet(args.output).count()
        print(json.dumps({"output": args.output, "survivors": n}))
        return 0

    from .config import FuzzyDedupConfig
    from .pipelines.image_dedup import image_dedup_workflow

    cfg = FuzzyDedupConfig(
        seed=args.seed,
        char_ngrams=args.char_ngrams,
        num_bands=args.num_bands,
        minhashes_per_band=args.minhashes_per_band,
    )
    counters = image_dedup_workflow(
        args.input,
        args.output,
        fuzzy=cfg,
        use_substring=not args.no_substring,
        substring_exact=args.substring_exact,
        substring_min_length=args.substring_min_length,
        write_survivors=not args.no_survivors,
        checkpoint=not args.no_checkpoint,
        sigs_materialize=not args.lazy_signatures,
    )
    print(json.dumps(counters))
    return 0


if __name__ == "__main__":
    sys.exit(main())
