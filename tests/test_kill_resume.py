"""F9: hard-kill the workflow mid-stage in a subprocess, then resume.

The resumed run must skip completed (stage, partition) manifest entries and
produce byte-identical final outputs to an uninterrupted run.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False)
from curator_ray.pipelines.image_dedup import image_dedup_workflow
from curator_ray.config import FuzzyDedupConfig
c = image_dedup_workflow({src!r}, {out!r}, fuzzy=FuzzyDedupConfig(char_ngrams=12),
                         use_substring={use_substring}, substring_exact={substring_exact},
                         checkpoint=True)
import json; print("DONE " + json.dumps(c), flush=True)
ray.shutdown()
"""


@pytest.fixture(scope="module")
def synth_src(tmp_path_factory):
    from curator_ray.sources.synth import write_synth_dataset

    d = tmp_path_factory.mktemp("killsrc")
    return write_synth_dataset(str(d), n_rows=300, rows_per_file=100)


def _run(src, out, kill_after_stage=None, timeout=420, use_substring=False, substring_exact=False, ckpt_dir=None):
    script = _RUN_SCRIPT.format(
        repo=REPO, src=src, out=out, use_substring=use_substring, substring_exact=substring_exact
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
    )
    if kill_after_stage is None:
        out_text, _ = proc.communicate(timeout=timeout)
        assert proc.returncode == 0, out_text
        line = [l for l in out_text.splitlines() if l.startswith("DONE ")][-1]
        return json.loads(line[5:])
    # poll the checkpoint dir until the named stage commits, then SIGKILL
    ckpt = ckpt_dir or os.path.join(out, "_checkpoints")
    deadline = time.time() + timeout
    while time.time() < deadline:
        if os.path.isdir(ckpt) and any(f.startswith(kill_after_stage) for f in os.listdir(ckpt)):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    proc.kill()
    proc.wait()
    return None


def test_kill_after_minhash_then_resume(ray_session, synth_src, tmp_path):
    clean_out = str(tmp_path / "clean")
    ref = _run(synth_src, clean_out)

    out = str(tmp_path / "killed")
    _run(synth_src, out, kill_after_stage="minhash")
    ckpt = os.path.join(out, "_checkpoints")
    committed = set(os.listdir(ckpt)) if os.path.isdir(ckpt) else set()
    assert any(f.startswith("minhash") for f in committed)
    # workflow was killed before completion: removal manifest must be absent
    assert not any(f.startswith("survivors") for f in committed)

    resumed = _run(synth_src, out)
    assert resumed["num_duplicates"] == ref["num_duplicates"]
    assert resumed["survivors"] == ref["survivors"]
    # completed stage was not recomputed: its manifest file is unchanged
    assert committed <= set(os.listdir(ckpt))

    # byte-identical final duplicate ids
    import pyarrow.parquet as pq

    def ids(p):
        import glob

        tbls = [pq.read_table(f) for f in sorted(glob.glob(os.path.join(p, "duplicate_ids", "*.parquet")))]
        import pyarrow as pa

        return pa.concat_tables(tbls).column("_id").to_pylist()

    assert sorted(ids(out)) == sorted(ids(clean_out))

def test_kill_mid_suffix_array_then_resume(ray_session, synth_src, tmp_path):
    """SIGKILL the workflow while the suffix-array stage is between doubling
    rounds; the resumed run must reuse the committed sa_round checkpoints
    (mid-STAGE resume, finer than the per-stage manifest) and converge to the
    uninterrupted run's duplicate ids."""
    kw = dict(use_substring=True, substring_exact=True)
    clean_out = str(tmp_path / "clean")
    ref = _run(synth_src, clean_out, **kw)

    out = str(tmp_path / "killed")
    sa_ckpt = os.path.join(out, "_cache", "sa_rounds", "_checkpoints")
    _run(synth_src, out, kill_after_stage="sa_round", ckpt_dir=sa_ckpt, **kw)

    committed = set(os.listdir(sa_ckpt)) if os.path.isdir(sa_ckpt) else set()
    top = os.path.join(out, "_checkpoints")
    finished = os.path.isdir(top) and any(f.startswith("removal_ids") for f in os.listdir(top))
    if committed and not finished:
        # the interesting case: at least one doubling round committed before
        # the kill — record its manifest mtimes to prove the resume reuses it
        mtimes = {
            f: os.path.getmtime(os.path.join(sa_ckpt, f))
            for f in committed
            if f.startswith("sa_round")
        }
        resumed = _run(synth_src, out, **kw)
        assert resumed["num_duplicates"] == ref["num_duplicates"]
        for f, m in mtimes.items():
            assert os.path.getmtime(os.path.join(sa_ckpt, f)) == m, f"{f} was recomputed"
    else:
        # subprocess outran the poll (tiny corpus): still assert a plain
        # rerun is a stable no-op over the completed checkpoints
        resumed = _run(synth_src, out, **kw)
        assert resumed["num_duplicates"] == ref["num_duplicates"]
