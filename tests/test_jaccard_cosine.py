"""Exact n-gram Jaccard + cosine near-dup pairs vs DuckDB ground truth."""

import duckdb
import numpy as np
import pytest
import ray.data

from curator_ray.stages.ann import cosine_dup_pairs
from curator_ray.stages.cc import dedup_pairs
from curator_ray.stages.jaccard import doc_gram_hashes, ngram_jaccard_pairs

SF = "/root/testdata/sf0.001"

_JACCARD_SQL = """
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
grams AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
  FOR i IN range(1, len(w)-1)]) AS g FROM toks WHERE len(w) >= 3),
sizes AS (SELECT doc_id, len(g) AS n FROM grams),
ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c FROM ex a
  JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b FROM inter
JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c::DOUBLE / (sa.n + sb.n - c) >= {t} ORDER BY id_a, id_b
"""


def _duck(sf, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con.execute(sql).fetchall()


def test_dedup_pairs_kernel():
    lo = np.array([3, 1, 3, 1, 2], dtype=np.int64)
    hi = np.array([4, 2, 4, 2, 9], dtype=np.int64)
    a, b = dedup_pairs(lo, hi)
    assert list(zip(a, b)) == [(1, 2), (2, 9), (3, 4)]
    a, b = dedup_pairs(np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert len(a) == 0 and len(b) == 0


def test_doc_gram_hashes_counts():
    import pyarrow as pa

    texts = pa.array(["a b c d", "a b c d", "x! y, z", "one two"])
    d_idx, g = doc_gram_hashes(texts, 3)
    counts = np.bincount(d_idx, minlength=4)
    # "a b c d" -> 2 grams; identical docs hash identically; "x y z" -> 1;
    # "one two" -> too short -> 0
    assert list(counts) == [2, 2, 1, 0]
    assert set(g[d_idx == 0]) == set(g[d_idx == 1])


@pytest.mark.parametrize("threshold", [0.8, 0.5])
def test_ngram_jaccard_vs_duckdb(ray_session, threshold):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = sorted((r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(ds, threshold=threshold).take_all())
    want = sorted((int(a), int(b)) for a, b in _duck(SF, _JACCARD_SQL.format(t=threshold)))
    assert got == want


def test_ngram_jaccard_many_blocks(ray_session):
    """Tiny blocks force gram runs and pair runs across block boundaries —
    exercises both driver-side boundary merges."""
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).repartition(16)
    got = sorted((r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(ds, threshold=0.8).take_all())
    want = sorted((int(a), int(b)) for a, b in _duck(SF, _JACCARD_SQL.format(t=0.8)))
    assert got == want


def test_ngram_jaccard_max_df_guard(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    with pytest.raises(Exception, match="max_df"):
        ngram_jaccard_pairs(ds, threshold=0.1, max_df=2).take_all()


def test_cosine_dups_vs_duckdb(ray_session):
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = sorted((r["id_a"], r["id_b"]) for r in cosine_dup_pairs(ds, threshold=0.3).take_all())
    want = sorted(
        (int(a), int(b))
        for a, b in _duck(
            SF,
            "SELECT a.vec_id, b.vec_id FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3",
        )
    )
    assert got == want


def test_doc_gram_hashes_null_text():
    # a null doc is an empty doc (no grams), not a crash
    import pyarrow as pa

    doc_idx, gram = doc_gram_hashes(pa.array(["a b c", None, "a b c"]), n=2)
    assert set(doc_idx.tolist()) == {0, 2}
