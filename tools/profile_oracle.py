#!/usr/bin/env python3
"""Profile the DuckDB oracle cost per gate: run each oracle_sql.json entry
against the sf parquet tables and print seconds-per-gate, slowest first.

Usage: python3 tools/profile_oracle.py <oracle_sql.json> [sfDir]
"""
import sys, os, json, glob, time
import duckdb

oracle_path = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_path))
times = {}
t_all = time.time()
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).df()
        times[name] = time.time() - t0
    except Exception as e:
        times[name] = time.time() - t0
        print(f"ERROR {name}: {str(e)[:200]}")
total = time.time() - t_all
for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"{t:8.2f}s  {name}")
print(f"\nTOTAL {total:.1f}s for {len(oracle)} gates")
