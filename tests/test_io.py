"""Reader/writer wrapper tests."""

import os

import pyarrow as pa
import pytest
import ray.data

from curator_ray.sources.io import (
    HAVE_LANCE,
    read_jsonl,
    read_lance,
    read_parquet,
    write_jsonl,
    write_parquet,
)


@pytest.fixture
def small_ds(ray_session):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(["a", "b", "c"])})
    )


def test_parquet_roundtrip_modes(small_ds, tmp_path):
    p = str(tmp_path / "pq")
    write_parquet(small_ds, p)
    back = read_parquet(p, columns=["doc_id"], assign_id_from="doc_id")
    rows = back.take_all()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
    assert all(r["_id"] == r["doc_id"] for r in rows)  # int keys pass through

    with pytest.raises(FileExistsError):
        write_parquet(small_ds, p, mode="error")
    write_parquet(small_ds, p, mode="ignore")
    write_parquet(small_ds, p, mode="overwrite")
    assert read_parquet(p).count() == 3


def test_jsonl_roundtrip(small_ds, tmp_path):
    p = str(tmp_path / "jl")
    write_jsonl(small_ds, p)
    back = read_jsonl(p)
    assert sorted(r["doc_id"] for r in back.take_all()) == [1, 2, 3]


def test_lance_gated():
    if HAVE_LANCE:
        pytest.skip("lance installed")
    with pytest.raises(NotImplementedError):
        read_lance("/tmp/nope.lance")
