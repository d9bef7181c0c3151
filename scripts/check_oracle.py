#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify output.

Mimics the driver's correctness gate: run each oracle SQL in DuckDB over
the sf parquet tables, compare to the Spark result parquet (columns sorted
by name, rows sorted, values hashed). Usage:
    python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ: oracle={list(w.columns)} spark={list(g.columns)}")
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows differ: oracle={len(w)} spark={len(g)}")
            n_bad += 1
            continue
        mismatch = None
        for c in w.columns:
            wa, ga = w[c].values, g[c].values
            for i in range(len(wa)):
                a, b = wa[i], ga[i]
                if a != b and not (isinstance(a, float) and isinstance(b, float)
                                   and (math.isnan(a) and math.isnan(b) or a == b)):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: value mismatch col={c} row={i}: oracle={a!r} spark={b!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(w)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
