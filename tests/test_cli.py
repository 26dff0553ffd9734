"""CLI (`ray job submit` surface): synth -> dedup --substring-exact, resume."""

import json
import os


def test_cli_dedup_substring_exact_and_rerun(ray_session, tmp_path, capsys):
    from curator_ray.cli import main

    src = str(tmp_path / "imgs")
    out = str(tmp_path / "deduped")
    assert main(["synth", "--output", src, "--rows", "400", "--no-pixels"]) == 0
    capsys.readouterr()

    args = [
        "dedup",
        "--input",
        src,
        "--output",
        out,
        "--char-ngrams",
        "12",
        "--substring-exact",
        "--substring-min-length",
        "40",
        "--no-survivors",
    ]
    assert main(args) == 0
    c1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert c1["num_duplicates"] > 0
    # lineage: the SA stage's per-round post-prune row counts surface in the
    # workflow counters (and stay JSON-serializable for the CLI)
    # checkpoint_every=2 commits every other round plus the last non-final
    # one, so the curve carries the committed subset — non-empty, positive
    curve = c1["sa_pruning_curve"]
    assert curve and all(v > 0 for v in curve.values())

    # the SA stage's per-round checkpoints were written under the cache
    sa_ck = os.path.join(out, "_cache", "sa_rounds", "_checkpoints")
    assert any(f.startswith("sa_round") for f in os.listdir(sa_ck))

    # rerun resumes from the manifests and reproduces the counters
    assert main(args) == 0
    c2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert c2["num_duplicates"] == c1["num_duplicates"]
