"""Checkpoint manifests: per-(stage, partition) lineage + counters for resume.

The reference's opt-in resumability layer skips completed *source partitions*
recorded in LMDB (``pipeline/pipeline.py:231-258``); the north rule requires
finer, mid-stage resume. This engine gives every stage output a manifest
entry keyed by (stage, partition) carrying the input fingerprint and row
counters. A rerun skips any entry whose fingerprint matches; outputs are
written to the entry's own directory first and the manifest record is the
atomic commit point (write-temp + rename), so a crash mid-stage re-runs only
the incomplete entries.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def fingerprint(*parts: object) -> str:
    """Stable fingerprint of stage inputs (paths, configs, row counts...)."""
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


class CheckpointManifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _entry_path(self, stage: str, partition: str) -> str:
        safe = hashlib.sha256(f"{stage}::{partition}".encode()).hexdigest()[:24]
        return os.path.join(self.path, f"{stage}.{safe}.json")

    def is_complete(self, stage: str, partition: str = "all", fp: str | None = None) -> bool:
        p = self._entry_path(stage, partition)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return fp is None or rec.get("fingerprint") == fp

    def record(
        self, stage: str, partition: str = "all", fp: str | None = None, counters: dict | None = None
    ) -> None:
        rec = {
            "stage": stage,
            "partition": partition,
            "fingerprint": fp,
            "counters": counters or {},
            "completed_at": time.time(),
        }
        p = self._entry_path(stage, partition)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, p)  # atomic commit point

    def entries(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(self.path, name)) as f:
                        out.append(json.load(f))
                except (json.JSONDecodeError, OSError):
                    continue
        return out

    def entry(self, stage: str, partition: str = "all") -> dict | None:
        p = self._entry_path(stage, partition)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def counters(self, touched: list[tuple[str, str]] | None = None) -> dict:
        """Aggregate counters; with ``touched`` = [(stage, partition), ...],
        only those entries count — stale entries from earlier runs with
        different configs (e.g. leftover band partitions after num_bands
        shrinks) would otherwise inflate the totals."""
        want = {tuple(t) for t in touched} if touched is not None else None
        agg: dict = {}
        for e in self.entries():
            if want is not None and (e.get("stage"), e.get("partition")) not in want:
                continue
            for k, v in (e.get("counters") or {}).items():
                agg[k] = agg.get(k, 0) + v
        return agg


def dir_counters(out_dir: str, stage: str) -> dict:
    """Row/file counters from parquet footers (no extra Ray job)."""
    import pyarrow.parquet as pq

    rows = files = 0
    for name in os.listdir(out_dir):
        if name.endswith(".parquet"):
            files += 1
            rows += pq.ParquetFile(os.path.join(out_dir, name)).metadata.num_rows
    return {f"{stage}_rows": rows, f"{stage}_files": files}


def checkpointed(manifest: "CheckpointManifest | None", stage: str, part: str, fp: str, out_dir: str, build):
    """Run ``build() -> Dataset`` and persist to ``out_dir`` unless the
    manifest already records this (stage, partition, fingerprint)."""
    import ray

    if manifest is not None and manifest.is_complete(stage, part, fp):
        return ray.data.read_parquet(out_dir)
    ds = build()
    # an interrupted previous attempt may have left partial files: the
    # manifest record (written after the write) is the commit point, so a
    # rebuild always starts from an empty stage directory
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # coalesce: signature/edge stages emit many small blocks (one per band
    # wave / sort partition); without a floor the checkpoint dir gets one
    # file per block (PERF.md "Known costs") and the resume re-read pays
    # per-file open cost. 32k rows ~ a few MB per file at signature widths.
    ds.write_parquet(out_dir, min_rows_per_file=32_768)
    out = ray.data.read_parquet(out_dir)
    if manifest is not None:
        manifest.record(stage, part, fp, counters=dir_counters(out_dir, stage))
    return out
