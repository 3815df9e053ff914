#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle_sql.json entry in
DuckDB over the sf tables, compare to the Spark result parquet (columns sorted
by name, rows sorted, values stringified)."""
import sys, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING spark output: {name}"); fail += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE SQL ERROR {name}: {e}"); fail += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    o, s = norm(odf), norm(sdf)
    if list(o.columns) != list(s.columns):
        print(f"SCHEMA MISMATCH {name}: oracle={list(o.columns)} spark={list(s.columns)}"); fail += 1; continue
    if len(o) != len(s):
        print(f"ROWCOUNT MISMATCH {name}: oracle={len(o)} spark={len(s)}"); fail += 1; continue
    if not o.equals(s):
        diff = (o != s).any(axis=1)
        print(f"VALUE MISMATCH {name}: {diff.sum()} differing rows")
        print("oracle:\n", o[diff].head(5).to_string())
        print("spark:\n", s[diff].head(5).to_string())
        fail += 1; continue
    ok += 1
    print(f"OK {name} ({len(o)} rows)")
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
