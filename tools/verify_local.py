#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Spark result
parquet from Verify's outDir, run the paired oracle SQL in DuckDB over the
same sf tables, and compare schema (sorted column names), row count, and
exact values (columns sorted by name, rows in dumped order)."""
import sys, json, math, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def norm(v):
    if isinstance(v, float):
        return ("f", round(v, 9)) if not math.isnan(v) else ("f", "nan")
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

n_pass = n_fail = 0
for qname in sorted(oracle):
    spark_path = f"{out_dir}/{qname}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {qname}: no spark output"); n_fail += 1; continue
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        odf = con.sql(oracle[qname]).df()
    except Exception as e:
        print(f"FAIL {qname}: {e}"); n_fail += 1; continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"FAIL {qname}: cols spark={scols} oracle={ocols}"); n_fail += 1; continue
    sdf, odf = sdf[scols], odf[scols]
    if len(sdf) != len(odf):
        print(f"FAIL {qname}: rows spark={len(sdf)} oracle={len(odf)}"); n_fail += 1; continue
    srows = [tuple(norm(v) for v in r) for r in sdf.itertuples(index=False)]
    orows = [tuple(norm(v) for v in r) for r in odf.itertuples(index=False)]
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {qname}: {len(bad)}/{len(srows)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
        n_fail += 1
    else:
        print(f"PASS {qname} ({len(srows)} rows)"); n_pass += 1
print(f"== {n_pass} pass, {n_fail} fail ==")
sys.exit(1 if n_fail else 0)
