#!/usr/bin/env python3
"""Compare two graft.Verify output dirs (round-13 cross-core determinism
pass): for every query dumped in BOTH dirs, load each parquet result,
sort columns by name and rows by every column, and compare a content
hash. The engine's determinism claims (seeded md5 order keys,
partition-invariant aggregations, two-phase ranks) predict BIT-IDENTICAL
results across core counts / shuffle-partition settings — local[8] vs
local[32] must hash equal on every gate.

Usage: python3 tools/compare_dumps.py <dirA> <dirB> [report.json]
Exit 1 on any mismatch.
"""
import hashlib
import json
import os
import sys

import duckdb

a, b = sys.argv[1], sys.argv[2]
report_path = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()


def content_hash(d, name):
    path = os.path.join(d, name, "*.parquet")
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()]
    ordered = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.execute(
        f"SELECT {ordered} FROM read_parquet('{path}') ORDER BY {ordered}"
    ).fetchall()
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest(), len(rows)


names_a = {n for n in os.listdir(a) if os.path.isdir(os.path.join(a, n))}
names_b = {n for n in os.listdir(b) if os.path.isdir(os.path.join(b, n))}
common = sorted(names_a & names_b)
only = names_a ^ names_b
mismatches = []
detail = {}
for n in common:
    ha, ra = content_hash(a, n)
    hb, rb = content_hash(b, n)
    ok = ha == hb and ra == rb
    detail[n] = {"rows": ra, "match": ok}
    if not ok:
        mismatches.append(n)
        print(f"MISMATCH {n}: {ra} rows/{ha[:12]} vs {rb} rows/{hb[:12]}")

print(f"{len(common) - len(mismatches)}/{len(common)} queries hash-identical"
      + (f"; only-in-one: {sorted(only)}" if only else ""))
if report_path:
    with open(report_path, "w") as f:
        json.dump({
            "metric": "determinism_compare", "dir_a": a, "dir_b": b,
            "queries_compared": len(common),
            "queries_identical": len(common) - len(mismatches),
            "mismatches": mismatches,
            "only_in_one": sorted(only),
            "all_identical": not mismatches and not only,
        }, f, indent=1)
sys.exit(1 if mismatches else 0)
