"""Flagship workflow: full image+caption near-duplicate removal.

Ray-Data-native counterpart of the reference's three-pipeline image dedup
flow (``tutorials/image/getting-started/image_dedup_example.py:33-120`` —
embed -> semantic workflow -> removal) and the fuzzy text workflow
(``fuzzy/workflow.py:292-394``), folded into ONE Lance/parquet-backed
dataset flow:

1. signatures: read ONLY (image_id, caption, phash) — pixels never enter the
   wide stages — assign deterministic ids;
2. candidate edges from three signal families, each checkpointed:
   - fuzzy caption MinHash->LSH (per-band-wave partitions),
   - SimHash over the pHash column (identical bytes => identical pHash =>
     Hamming 0, so exact image dups are covered),
   - exact-substring caption fingerprints (optional);
3. shared connected components -> duplicate clusters -> removal ids
   (sorted parquet);
4. removal: re-read the full table (with bytes), broadcast anti-join, write
   surviving rows as partitioned parquet — bytes pass through untouched, so
   the decoded-pixel invariant holds trivially (PSNR = inf).

Every stage records (stage, partition, fingerprint, counters) in a
CheckpointManifest; a rerun skips completed entries mid-workflow.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..config import FuzzyDedupConfig, SimHashConfig
from ..stages.cc import connected_components, removal_ids
from ..stages.ids import with_ids
from ..stages.lsh import lsh_candidate_edges
from ..stages.minhash import minhash_stage
from ..stages.removal import remove_by_ids
from ..stages.simhash import simhash_candidate_edges
from ..stages.substring import substring_candidate_edges
from ..state.manifest import CheckpointManifest, checkpointed, dir_counters, fingerprint

EDGES_EMPTY = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})

# removal lists up to this size are driver-collected and broadcast via
# ray.put (8 bytes/id -> ~80 MB at the cap); larger lists switch to the
# distributed hash anti-join automatically
REMOVAL_BROADCAST_MAX = 10_000_000


# shared checkpoint-or-read helper and parquet-footer counters live with the
# manifest (state/manifest.py); the suffix-array stage's per-round resume
# (stages/suffix_global.py) uses the same machinery
_checkpointed = checkpointed
_dir_counters = dir_counters


def _warm_lazy_imports() -> None:
    """Make Ray Data's lazy fsspec-http import race-free under threads.

    ``read_parquet`` path resolution tries ``from fsspec.implementations.http
    import HTTPFileSystem`` and catches ModuleNotFoundError. In this
    environment that import ALWAYS fails (no aiohttp), so it is retried on
    every call — and two threads retrying concurrently can observe the
    partially-executed module and raise a bare ImportError that Ray does not
    catch (reproduced: ~1 in 1600 concurrent attempts). Pinning the
    sys.modules entry to ``None`` after the first failure makes every later
    import raise ModuleNotFoundError immediately, with no module execution
    and no race window, preserving the exact failure semantics Ray expects."""
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        sys.modules.setdefault("fsspec.implementations.http", None)
    except Exception:
        pass


def image_dedup_workflow(
    input_path: str,
    output_path: str,
    fuzzy: FuzzyDedupConfig | None = None,
    simhash: SimHashConfig | None = None,
    use_substring: bool = True,
    substring_min_length: int = 50,
    substring_exact: bool = False,
    cache_dir: str | None = None,
    write_survivors: bool = True,
    checkpoint: bool = True,
    survivors_format: str = "parquet",
    sigs_materialize: bool = True,
) -> dict:
    """Run the full dedup; returns counters (rows, duplicates, survivors).

    ``checkpoint=False`` runs the streaming path: no per-stage parquet
    materialization or manifests — signatures live in the object store and
    all edge sources union lazily into one connected-components pass. Use it
    when resumability isn't needed (benchmarks, small jobs); the default
    checkpointed path is the ops-grade flow.

    ``sigs_materialize=False`` (streaming path only) keeps the signature
    projection fully lazy — each edge builder re-reads the pruned columns
    from storage instead of sharing one plasma-resident copy. Measured
    slower at bench scale (re-read + re-id per builder vs one ~90 B/row
    round trip), but the right call when rows x 90 B outgrows the cluster's
    aggregate object store (SCALE.md).
    """
    import ray

    fuzzy = fuzzy or FuzzyDedupConfig(char_ngrams=12)
    simhash = simhash or SimHashConfig()
    if not checkpoint:
        return _streaming_workflow(
            input_path, output_path, fuzzy, simhash, use_substring, substring_min_length,
            write_survivors, survivors_format, sigs_materialize=sigs_materialize,
        )
    cache_dir = cache_dir or os.path.join(output_path, "_cache")
    manifest = CheckpointManifest(os.path.join(output_path, "_checkpoints"))
    touched: list[tuple[str, str]] = []  # (stage, partition) entries of THIS run

    sig_cols = ["image_id", "caption", "phash"]
    sigs = with_ids(ray.data.read_parquet(input_path, columns=sig_cols), key_field="image_id")

    # -- minhash cache (consumed twice by LSH) ------------------------------
    mh_fp = fingerprint(input_path, fuzzy)
    mh_dir = os.path.join(cache_dir, "minhash")
    touched.append(("minhash", "all"))
    sig_ds = _checkpointed(
        manifest,
        "minhash",
        "all",
        mh_fp,
        mh_dir,
        lambda: minhash_stage(sigs, fuzzy, keep_fields=(fuzzy.id_field,)),
    )

    # -- candidate edges, one checkpoint partition per source/wave ----------
    # the edge sources are independent given the minhash cache, and each
    # checkpoints into its own (stage, partition) entry — per-entry manifest
    # files commit atomically, so building them from concurrent driver
    # threads is safe and lets one source's map waves fill another's
    # sort/driver-merge barriers (same pattern as the streaming path)
    build_specs: list[tuple[str, str, str, str, object]] = []
    step = max(1, fuzzy.bands_per_iteration)
    for start in range(0, fuzzy.num_bands, step):
        rng = range(start, min(start + step, fuzzy.num_bands))
        part = f"bands_{rng.start}_{rng.stop}"
        build_specs.append(
            (
                "lsh_edges",
                part,
                fingerprint(mh_fp, tuple(rng)),
                os.path.join(cache_dir, "edges", part),
                lambda rng=rng: lsh_candidate_edges(sig_ds, fuzzy, band_range=rng),
            )
        )
    build_specs.append(
        (
            "simhash_edges",
            "all",
            fingerprint(input_path, simhash),
            os.path.join(cache_dir, "edges", "simhash"),
            lambda: simhash_candidate_edges(sigs, simhash),
        )
    )
    if use_substring:
        # default: winnowed fingerprints (one shuffle — the 100 TB path);
        # substring_exact swaps in the distributed suffix-array stage
        # (stages/suffix_global.py): exact, hash-free, 2 sorts/round
        if substring_exact:
            from ..stages.suffix_global import suffix_array_candidate_edges

            # the SA stage checkpoints each doubling round internally (2 full
            # sorts/round at scale), so a crash mid-stage resumes at the last
            # committed round, not from round 1
            def sub_stage(ds, min_match_length):
                return suffix_array_candidate_edges(
                    ds,
                    min_match_length=min_match_length,
                    checkpoint_path=os.path.join(cache_dir, "sa_rounds"),
                )

        else:
            sub_stage = substring_candidate_edges
        build_specs.append(
            (
                "substring_edges",
                "all",
                fingerprint(input_path, substring_min_length, substring_exact),
                os.path.join(cache_dir, "edges", "substring"),
                lambda: sub_stage(sigs, min_match_length=substring_min_length),
            )
        )

    from concurrent.futures import ThreadPoolExecutor

    _warm_lazy_imports()
    touched.extend((stage, part) for stage, part, _, _, _ in build_specs)
    with ThreadPoolExecutor(max_workers=min(4, len(build_specs))) as pool:
        futs = [
            pool.submit(_checkpointed, manifest, stage, part, fp, out_dir, build)
            for stage, part, fp, out_dir, build in build_specs
        ]
        edge_sets = [f.result() for f in futs]

    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)

    # -- connected components + removal ids ---------------------------------
    rm_fp = fingerprint(mh_fp, input_path, simhash, use_substring, substring_min_length)
    rm_dir = os.path.join(output_path, "duplicate_ids")

    def _build_removal():
        labels = connected_components(edges, fuzzy)
        return removal_ids(labels)

    touched.append(("removal_ids", "all"))
    removal = _checkpointed(manifest, "removal_ids", "all", rm_fp, rm_dir, _build_removal)
    n_dups = removal.count()

    counters = {"num_duplicates": n_dups}
    # -- anti-join + survivor write -----------------------------------------
    if write_survivors:
        surv_dir = os.path.join(output_path, "survivors")
        full = with_ids(ray.data.read_parquet(input_path), key_field="image_id")
        surv_fp = fingerprint(rm_fp, "survivors")
        touched.append(("survivors", "all"))
        if not manifest.is_complete("survivors", "all", surv_fp):
            import shutil

            survivors = _remove(full, removal, n_dups, fuzzy.id_field)
            shutil.rmtree(surv_dir, ignore_errors=True)
            os.makedirs(surv_dir, exist_ok=True)
            n_surv = _write_survivors(survivors.drop_columns([fuzzy.id_field]), surv_dir, survivors_format)
            manifest.record("survivors", "all", surv_fp, counters={"survivors": n_surv})
        counters["survivors"] = manifest.counters(touched).get("survivors", 0)
    counters.update(manifest.counters(touched))
    if substring_exact:
        # the suffix-array stage keeps its own per-round manifest (mid-stage
        # resume); surface its pruning curve — post-prune rows per doubling
        # round — as lineage in the workflow's counters
        sa_m = CheckpointManifest(os.path.join(cache_dir, "sa_rounds", "_checkpoints"))
        curve = {
            e["partition"]: e.get("counters", {}).get("sa_round_rows", 0)
            for e in sa_m.entries()
            if e.get("stage") == "sa_round"
        }
        if curve:
            counters["sa_pruning_curve"] = dict(sorted(curve.items()))
    return counters


def _write_survivors(survivors, surv_dir: str, fmt: str) -> int:
    """Write surviving rows as parquet or WebDataset tar shards; returns the
    survivor count (tar shards per the reference ImageWriterStage layout)."""
    import ray

    if fmt == "webdataset":
        from ..sources.tar import write_webdataset

        manifest = write_webdataset(survivors, surv_dir)
        # aggregate on-cluster: one scalar crosses to the driver, not one
        # row per tar shard
        return int(manifest.sum("n_images") or 0)
    survivors.write_parquet(surv_dir)
    return ray.data.read_parquet(surv_dir).count()


def _remove(full, removal, n_removal: int, id_field: str):
    """Anti-join, broadcast vs distributed chosen by removal-list size."""
    if n_removal <= REMOVAL_BROADCAST_MAX:
        return remove_by_ids(full, removal, id_field=id_field)
    from ..stages.removal import remove_by_ids_join

    return remove_by_ids_join(full, removal, id_field=id_field)


def _streaming_workflow(
    input_path: str,
    output_path: str,
    fuzzy: FuzzyDedupConfig,
    simhash: SimHashConfig,
    use_substring: bool,
    substring_min_length: int,
    write_survivors: bool,
    survivors_format: str = "parquet",
    sigs_materialize: bool = True,
) -> dict:
    """Checkpoint-free path: one object-store materialization of the
    signature projection, lazily-unioned edge sources, one CC pass."""
    import time

    import ray

    from ..stages.substring import substring_candidate_edges

    phase_log = os.environ.get("GRAFT_PHASE_LOG")
    t_prev = time.time()

    def _phase(name: str) -> None:
        nonlocal t_prev
        if phase_log:
            now = time.time()
            print(f"[phase] {name}: {now - t_prev:.2f}s", file=__import__("sys").stderr, flush=True)
            t_prev = now

    sig_cols = ["image_id", "caption", "phash"]
    sigs = with_ids(ray.data.read_parquet(input_path, columns=sig_cols), key_field="image_id")
    # the three edge builders are independent pipelines with internal
    # barriers (sorts, driver-side partial merges) where the cluster idles;
    # running them from concurrent driver threads lets one builder's compute
    # fill another's barrier gaps — each Dataset execution has its own
    # streaming executor, and they share the cluster through the usual
    # resource-based admission
    from concurrent.futures import ThreadPoolExecutor

    # one materialization of the slim signature projection feeds all three
    # builders (re-reading + re-assigning ids per builder costs more than the
    # one plasma round trip of ~90 B/row); minhash stays LAZY on top of it so
    # the (rows x num_hashes x 4B) signature matrix still never touches the
    # object store — plasma first-touch page faults are a measured serial
    # bottleneck in this sandbox (PERF.md). sigs_materialize=False keeps the
    # projection lazy for corpora where rows x 90 B outgrows aggregate
    # plasma: each builder then re-reads the pruned columns from storage,
    # which streams with zero resident footprint (SCALE.md).
    sigs_mat = sigs.materialize() if sigs_materialize else sigs
    mh = minhash_stage(sigs_mat, fuzzy, keep_fields=(fuzzy.id_field,))
    _phase("sigs_materialize" if sigs_materialize else "sigs_lazy")

    def _build_lsh():
        return lsh_candidate_edges(mh, fuzzy)

    def _build_simhash():
        return simhash_candidate_edges(sigs_mat, simhash)

    def _build_substring():
        return substring_candidate_edges(sigs_mat, min_match_length=substring_min_length)

    builders = [_build_lsh, _build_simhash] + ([_build_substring] if use_substring else [])
    _warm_lazy_imports()
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futs = [pool.submit(b) for b in builders]
        built = [f.result() for f in futs]
    _phase("edge_builds (lsh+simhash+substring concurrent)")
    edges = built[0]
    for extra in built[1:]:
        edges = edges.union(extra)

    labels = connected_components(edges, fuzzy)
    _phase("edges+cc")
    removal = removal_ids(labels)
    counters = {"num_duplicates": removal.count()}
    _phase("removal_count")
    if write_survivors:
        surv_dir = os.path.join(output_path, "survivors")
        import shutil

        shutil.rmtree(surv_dir, ignore_errors=True)
        os.makedirs(surv_dir, exist_ok=True)
        full = with_ids(ray.data.read_parquet(input_path), key_field="image_id")
        surv = _remove(full, removal, counters["num_duplicates"], fuzzy.id_field).drop_columns(
            [fuzzy.id_field]
        )
        counters["survivors"] = _write_survivors(surv, surv_dir, survivors_format)
    return counters
