#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: runs each oracle SQL in
DuckDB over the sfDir parquet tables and compares against the Spark result
parquet written by graft.Verify (sorted columns, sorted rows, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total order (mirrors hash-of-values semantics)
    key = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1) if len(df) else None
    if key is not None:
        df = df.loc[key.sort_values().index]
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:200]}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLUMNS spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
            continue
        mismatched = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.astype(str) == bv.astype(str))
            except Exception:
                eq = pd.Series([False] * len(av))
            if not eq.all():
                idx = (~eq).idxmax()
                mismatched.append((c, str(av[idx])[:60], str(bv[idx])[:60], int((~eq).sum())))
        if mismatched:
            results[name] = "VALUES " + "; ".join(
                f"{c}: spark={x} duck={y} ({n} rows)" for c, x, y, n in mismatched[:3])
        else:
            results[name] = f"OK rows={len(a)}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_ro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok} OK, {n_ro} rows-only, {len(results)-n_ok-n_ro} FAILING of {len(results)}")
    return 0 if len(results) == n_ok + n_ro else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
