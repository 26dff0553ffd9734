"""Local mirror of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count, column names, and a value hash over name-sorted columns
and canonically-ordered rows — the same comparison the round driver records
in ``CORRECTNESS_r{N}.json``.

Usage: PYTHONPATH=/root/repo python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df) -> str:
    import pandas as pd

    df = _canon(df)
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(9)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out, fails = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {}
        try:
            df = _to_pandas(fn(sf_dir))
            rec["rows"] = len(df)
            if name in sqls:
                odf = con.execute(sqls[name]).fetchdf()
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(df) == len(odf)
                rec["schema_match"] = sorted(df.columns) == sorted(odf.columns)
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"] and _value_hash(df) == _value_hash(odf)
                )
                if not rec["hash_match"]:
                    fails += 1
                    rec["cols"] = [sorted(df.columns), sorted(odf.columns)]
            else:
                rec["oracle"] = "none (rows-only)"
                if len(df) == 0 and name != "exact_dedup_removals":
                    rec["warn"] = "0 rows — vacuous"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            fails += 1
        out[name] = rec
        status = "FAIL" if rec.get("err") or rec.get("hash_match") is False else "ok"
        print(f"{status:4s} {name}: {json.dumps(rec)[:160]}", flush=True)
    print(f"\n{len(out)} queries, {fails} failures")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
