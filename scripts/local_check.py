#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/local_check.py [sfdir] [outdir]
Reads outdir/<name>/ parquet (written by graft.Verify) and
outdir/oracle_sql.json, runs each oracle in DuckDB against the sfdir
tables, and compares row counts, column names, and value multisets
(column-name-sorted, row-sorted hash — mirrors the driver contract).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fail += 1; continue
    spark_df = pq.read_table(files).to_pandas()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)")
        ok += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        print(f"{name}: COLUMN MISMATCH spark={s_cols} duck={d_cols}"); fail += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(spark_df)} duck={len(duck_df)}"); fail += 1; continue
    def canon(df):
        df = df[s_cols].copy()
        rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None))
        return rows
    sr, dr = canon(spark_df), canon(duck_df)
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"{name}: VALUE MISMATCH e.g. {diffs}"); fail += 1; continue
    print(f"{name}: OK ({len(spark_df)} rows)")
    ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
