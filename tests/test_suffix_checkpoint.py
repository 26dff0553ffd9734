"""Mid-stage resume for the distributed suffix-array stage.

The north rule requires per-partition lineage + counters and resume from
checkpoint mid-stage.  ``suffix_array_candidate_edges(checkpoint_path=...)``
persists the doc mapping and every non-final doubling round (each round = 2
full Dataset sorts — the unit of work worth not repeating); these tests pin:

* checkpointed output == uncheckpointed output == brute-force SA oracle;
* a rerun over a committed checkpoint recomputes ONLY the final round;
* a missing round record (crash before its atomic manifest commit) resumes
  from the last committed round, not from round 1;
* a config change (different ``min_match_length``) invalidates the
  fingerprint chain and recomputes everything;
* the fully-pruned (no-duplicate) case round-trips through the zero-row
  manifest entry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from curator_ray.stages import suffix_global as sg

from test_suffix_global import _ray_ds, sa_oracle_pairs


def _pairs(edges) -> set[tuple[int, int]]:
    parts = [pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return set()
    t = pa.concat_tables(parts)
    a, b = t.column("src").to_numpy(), t.column("dst").to_numpy()
    return set(zip(np.minimum(a, b).tolist(), np.maximum(a, b).tolist()))


def _corpus(seed=3, n=60):
    r = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [" ".join(r.choice(vocab, size=r.integers(8, 40))) for _ in range(n)]
    shared = " ".join(r.choice(vocab, size=14))
    for j in (3, 9, 17, 33, 48):
        docs[j] = docs[j][:8] + " " + shared + " " + docs[j][8:]
    ids = (r.permutation(10_000)[:n] + 1).tolist()
    return docs, ids


def _run(docs, ids, ckpt, k=30, nblocks=8):
    return _pairs(
        sg.suffix_array_candidate_edges(
            _ray_ds(docs, ids, nblocks),
            min_match_length=k,
            text_field="caption",
            id_field="_id",
            emit="pairs",
            checkpoint_path=str(ckpt),
        )
    )


def _spy_rounds(monkeypatch):
    calls = {"n": 0}
    orig = sg._round

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(sg, "_round", spy)
    return calls


def test_checkpointed_run_matches_oracle(ray_session, tmp_path):
    docs, ids = _corpus()
    exp = sa_oracle_pairs(docs, ids, 30)
    assert exp, "fixture must plant pairs"
    assert _run(docs, ids, tmp_path / "ck") == exp

    # lineage: manifest entries for the mapping + the committed rounds
    # (checkpoint_every=2 default: every other round plus the last
    # non-final one — steps(30)=[7,14,2] commits exactly r1), each carrying
    # row counters (the pruning curve)
    from curator_ray.state.manifest import CheckpointManifest

    m = CheckpointManifest(str(tmp_path / "ck" / "_checkpoints"))
    stages = {(e["stage"], e["partition"]) for e in m.entries()}
    assert ("sa_mapping", "all") in stages
    assert ("sa_round", "r1") in stages
    assert ("sa_round", "r0") not in stages  # skipped by the every-other policy
    r1 = m.entry("sa_round", "r1")
    assert r1 is not None and r1["counters"]["sa_round_rows"] > 0


def test_resume_recomputes_only_final_round(ray_session, tmp_path, monkeypatch):
    docs, ids = _corpus(seed=5)
    exp = sa_oracle_pairs(docs, ids, 30)
    first = _run(docs, ids, tmp_path / "ck")
    assert first == exp

    calls = _spy_rounds(monkeypatch)
    assert _run(docs, ids, tmp_path / "ck") == exp
    # steps(30) = [7, 14, 2]: two checkpointed rounds skipped, only the
    # final (edge-emitting) round recomputed
    assert calls["n"] == 1


def test_crash_before_round_commit_resumes_midstage(ray_session, tmp_path, monkeypatch):
    docs, ids = _corpus(seed=7)
    exp = sa_oracle_pairs(docs, ids, 30)
    assert _run(docs, ids, tmp_path / "ck") == exp

    # simulate a crash after round 0 committed but before round 1 did: drop
    # round 1's manifest record (the atomic commit point) and its files
    from curator_ray.state.manifest import CheckpointManifest

    m = CheckpointManifest(str(tmp_path / "ck" / "_checkpoints"))
    import os
    import shutil

    os.remove(m._entry_path("sa_round", "r1"))
    shutil.rmtree(tmp_path / "ck" / "round_1", ignore_errors=True)

    calls = _spy_rounds(monkeypatch)
    assert _run(docs, ids, tmp_path / "ck") == exp
    # with checkpoint_every=2 round 0 was never committed, so losing round
    # 1's commit restarts the chain: rounds 0, 1 and the final recomputed
    assert calls["n"] == 3


def test_config_change_invalidates_chain(ray_session, tmp_path, monkeypatch):
    docs, ids = _corpus(seed=11)
    assert _run(docs, ids, tmp_path / "ck", k=30) == sa_oracle_pairs(docs, ids, 30)

    calls = _spy_rounds(monkeypatch)
    # K=20: steps [7, 6] — different schedule, nothing may be resumed
    assert _run(docs, ids, tmp_path / "ck", k=20) == sa_oracle_pairs(docs, ids, 20)
    assert calls["n"] == len(sg._schedule(20))


def test_fully_pruned_corpus_checkpoints_zero_rows(ray_session, tmp_path, monkeypatch):
    # every doc shorter than the packed prefix: no positions, empty edges.
    # K=16 (steps [7, 2]) keeps round 0 non-final so the zero-row entry is
    # exercised; K=8 would be a single final round with no checkpoint.
    docs, ids = ["ab", "cd", "ef"], [1, 2, 3]
    assert _run(docs, ids, tmp_path / "ck", k=16, nblocks=2) == set()

    calls = _spy_rounds(monkeypatch)
    assert _run(docs, ids, tmp_path / "ck", k=16, nblocks=2) == set()
    # round 0's zero-row entry short-circuits the rerun before any round runs
    assert calls["n"] == 0


def test_corpus_fingerprint_block_order_invariant():
    """Resume safety linchpin: the fingerprint must not depend on summary-row
    arrival order (Ray block order is not deterministic), must change with
    any block content or config change, and must change with layout version."""
    t = pa.table(
        {
            "f_id": pa.array([10, 3, 77], pa.int64()),
            "n_rows": pa.array([5, 2, 9], pa.int64()),
            "max_len": pa.array([40, 11, 23], pa.int64()),
        }
    )
    perm = t.take(pa.array([2, 0, 1]))
    assert sg._corpus_fingerprint(t, 40, "star") == sg._corpus_fingerprint(perm, 40, "star")
    assert sg._corpus_fingerprint(t, 40, "star") != sg._corpus_fingerprint(t, 30, "star")
    assert sg._corpus_fingerprint(t, 40, "star") != sg._corpus_fingerprint(t, 40, "pairs")
    bigger = t.set_column(1, "n_rows", pa.array([5, 2, 10], pa.int64()))
    assert sg._corpus_fingerprint(t, 40, "star") != sg._corpus_fingerprint(bigger, 40, "star")
