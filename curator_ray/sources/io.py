"""Readers / writers: thin Ray-Data-native wrappers.

Reference counterparts: ``JsonlReaderStage``/``ParquetReaderStage``
(``stages/text/io/reader/{jsonl,parquet}.py``), ``JsonlWriter``/
``ParquetWriter`` (``stages/text/io/writer/*``), and the dedup-internal IO
mixin (``stages/deduplication/io_utils.py:26-71``). The reference partitions
files into FileGroupTasks driver-side (``stages/file_partitioning.py:33-120``);
Ray Data's read planning replaces that (``override_num_blocks`` / file-based
block splits), so readers here are plain ``ray.data.read_*`` calls with
column pruning + optional deterministic id assignment.

Lance is the preferred table format per the input hint; the sandbox image
lacks the ``lance`` package, so those paths are gated behind an import-try
and fall back to parquet.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_parquet(paths, columns: list[str] | None = None, assign_id_from: str | None = None, **kwargs):
    """Column-pruned parquet read, optionally appending the deterministic
    ``_id`` column (replaces the reference's IdGenerator registration)."""
    import ray

    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    if assign_id_from:
        from ..stages.ids import with_ids

        ds = with_ids(ds, key_field=assign_id_from)
    return ds


def read_jsonl(paths, assign_id_from: str | None = None, **kwargs):
    import ray

    ds = ray.data.read_json(paths, **kwargs)
    if assign_id_from:
        from ..stages.ids import with_ids

        ds = with_ids(ds, key_field=assign_id_from)
    return ds


def read_lance(uri, columns: list[str] | None = None, **kwargs):
    """Lance read (zero-copy fragments) — gated on the lance package."""
    import ray

    if not HAVE_LANCE:
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; "
            "use read_parquet (same schema) instead"
        )
    return ray.data.read_lance(uri, columns=columns, **kwargs)


def write_parquet(ds, path: str, mode: str = "overwrite", **kwargs) -> str:
    """Partitioned parquet write (one file per block — resumable output).

    Modes mirror the reference writer (``writer/base.py:31-66``):
    ignore | overwrite | append | error.
    """
    exists = os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
    if exists:
        if mode == "ignore":
            return path
        if mode == "error":
            raise FileExistsError(path)
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path, **kwargs)
    return path


def write_jsonl(ds, path: str, mode: str = "overwrite", **kwargs) -> str:
    exists = os.path.isdir(path) and any(f.endswith(".json") for f in os.listdir(path))
    if exists:
        if mode == "ignore":
            return path
        if mode == "error":
            raise FileExistsError(path)
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_json(path, **kwargs)
    return path


def write_lance(ds, uri: str, **kwargs) -> str:
    if not HAVE_LANCE:
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; "
            "use write_parquet (same schema) instead"
        )
    ds.write_lance(uri, **kwargs)
    return uri
