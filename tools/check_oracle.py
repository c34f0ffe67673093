#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB differential: for every query parquet
dumped by graft.Verify, run its oracle SQL in DuckDB over the same testdata
tables and compare (columns sorted by name, rows sorted, values normalized).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            out[c] = s.round(6)
        elif np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object or str(s.dtype) == "string":
            out[c] = s.map(lambda v: None if v is None else str(v))
        elif np.issubdtype(s.dtype, np.integer):
            out[c] = s.astype("int64")
        elif s.dtype == bool:
            out[c] = s
        else:
            out[c] = s
    r = pd.DataFrame(out)
    key = r.apply(lambda row: tuple(str(x) for x in row), axis=1)
    return r.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok, fails = 0, []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append((name, f"duckdb error: {e}"))
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            fails.append((name, f"spark output missing: {e}"))
            continue
        w, g = norm(want), norm(got)
        if sorted(w.columns) != sorted(g.columns):
            fails.append((name, f"columns differ: duck={list(w.columns)} spark={list(g.columns)}"))
            continue
        if len(w) != len(g):
            fails.append((name, f"row count: duck={len(w)} spark={len(g)}"))
            continue
        diff_cols = []
        for c in w.columns:
            a, b = w[c], g[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                eq = np.isclose(a.astype(float), b.astype(float),
                                rtol=1e-9, atol=1e-9, equal_nan=True)
            else:
                eq = (a.astype(str).fillna("∅") == b.astype(str).fillna("∅"))
            if not bool(np.all(eq)):
                i = int(np.argmin(eq))
                diff_cols.append(f"{c}[row{i}]: duck={a.iloc[i]!r} spark={b.iloc[i]!r}")
        if diff_cols:
            fails.append((name, "; ".join(diff_cols[:3])))
        else:
            n_ok += 1
            print(f"OK   {name} ({len(w)} rows)")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    print(f"\n{n_ok}/{len(oracle)} queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
