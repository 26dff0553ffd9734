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
                         use_substring=False, checkpoint=True)
import json; print("DONE " + json.dumps(c), flush=True)
ray.shutdown()
"""


@pytest.fixture(scope="module")
def synth_src(tmp_path_factory):
    from curator_ray.sources.synth import write_synth_dataset

    d = tmp_path_factory.mktemp("killsrc")
    return write_synth_dataset(str(d), n_rows=300, rows_per_file=100)


def _run(src, out, kill_after_stage=None, timeout=420):
    script = _RUN_SCRIPT.format(repo=REPO, src=src, out=out)
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
    ckpt = os.path.join(out, "_checkpoints")
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
