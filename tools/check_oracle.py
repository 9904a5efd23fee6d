#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff rows exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(rows, cols):
    # sort columns by name (like the driver), then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [tuple(str(x) for x in t) for t in out]

fails = 0
for name in sorted(oracle):
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        print(f"MISSING spark output: {name}")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    g_cols, g_rows = got.columns, got.fetchall()
    try:
        exp = con.sql(oracle[name])
        e_cols, e_rows = exp.columns, exp.fetchall()
    except Exception as ex:
        print(f"FAIL {name}: oracle SQL error: {ex}")
        fails += 1
        continue
    if sorted(g_cols) != sorted(e_cols):
        print(f"FAIL {name}: schema {sorted(g_cols)} vs {sorted(e_cols)}")
        fails += 1
        continue
    cg, ce = canon(g_rows, g_cols), canon(e_rows, e_cols)
    if len(cg) != len(ce):
        print(f"FAIL {name}: rowcount {len(cg)} vs {len(ce)}")
        fails += 1
        continue
    bad = [(a, b) for a, b in zip(cg, ce) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(cg)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
