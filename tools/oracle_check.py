#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side tooling
only — the shipped Scala library does not depend on this).

Runs `sbt runMain graft.Verify <sfDir> <outDir>` output against DuckDB
executing SparkEntry.oracleSql on the same parquet tables, and compares
row-by-row after sorting columns by name.

Usage: python3 tools/oracle_check.py [sfDir] [outDir] [jsonOut]

With jsonOut, also writes a CORRECTNESS_r*-shaped JSON artifact
(per-query rows/schema/hash match booleans) — used by the round-7
second-seed fuzz run to record CORRECTNESS_fuzz.json.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
json_out = sys.argv[3] if len(sys.argv) > 3 else None
record = {}

def rec(name, rows=False, schema=False, values=False, s_rows=None,
        o_rows=None, err=None):
    record[name] = {"rows_match": rows, "schema_match": schema,
                    "hash_match": values, "spark_rows": s_rows,
                    "oracle_rows": o_rows, "err": err}

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracles):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name}: no spark output dir"); fails += 1
        rec(name, err="no spark output dir"); continue
    # Recursive, like the driver's gate: anything nested inside a query's
    # output dir counts as query output (round-2 lesson — an aux parquet
    # nested under gen_orders_rollup/ leaked 100k rows into the compare).
    files = glob.glob(f"{spark_path}/**/*.parquet", recursive=True)
    if not files:
        print(f"MISSING  {name}: no parquet part files"); fails += 1
        rec(name, err="no parquet part files"); continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = canon(con.execute(oracles[name]).fetchdf())
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fails += 1
        rec(name, err=str(e)[:300]); continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"SCHEMA   {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fails += 1
        rec(name, rows=len(spark_df) == len(duck_df),
            s_rows=len(spark_df), o_rows=len(duck_df),
            err="schema mismatch"); continue
    if len(spark_df) != len(duck_df):
        print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}")
        fails += 1
        rec(name, schema=True, s_rows=len(spark_df), o_rows=len(duck_df),
            err="row count mismatch"); continue
    # dtype-tolerant value compare
    mismatch = None
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = ((a.astype(float) - b.astype(float)).abs() < 1e-9) | (a.isna() & b.isna())
            else:
                ok = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            if not ok.all():
                i = ok.idxmin()
                mismatch = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"
                break
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"; break
    # strict dtype note (driver may be stricter)
    dt_note = ""
    for c in spark_df.columns:
        if str(spark_df[c].dtype) != str(duck_df[c].dtype):
            dt_note += f" [dtype {c}: {spark_df[c].dtype} vs {duck_df[c].dtype}]"
    if mismatch:
        print(f"VALUE    {name}: {mismatch}{dt_note}"); fails += 1
        rec(name, rows=True, schema=True, s_rows=len(spark_df),
            o_rows=len(duck_df), err=mismatch[:300])
    else:
        print(f"OK       {name} ({len(spark_df)} rows){dt_note}")
        rec(name, rows=True, schema=True, values=True,
            s_rows=len(spark_df), o_rows=len(duck_df))

# rows-only queries (in output but no oracle)
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracles:
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
        print(f"ROWSONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")

if json_out:
    with open(json_out, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)

sys.exit(1 if fails else 0)
