#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle_sql.json entry in DuckDB against the same parquet
tables and compare (schema, row count, sorted-value hash).

Usage: python3 tools/local_verify.py [sfDir] [outDir] [only_csv]
(only_csv: comma-separated query names — scale runs check a subset)
"""
import sys, os, json, subprocess, glob, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = f" {sys.argv[3]}" if len(sys.argv) > 3 else ""

rc = subprocess.run(
    ["sbt", "-batch", f'runMain graft.Verify {sf} {out}{only}'],
    cwd="/root/repo", capture_output=True, text=True, timeout=7200)
if rc.returncode != 0:
    print(rc.stdout[-4000:]); print(rc.stderr[-2000:]); sys.exit(1)
for line in rc.stdout.splitlines():
    if "[verify]" in line:
        print(line)

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
if not oracle:
    print("FAIL: empty oracle set (bad whitelist?) — nothing was verified")
    sys.exit(1)
fails = 0
detail = {}
t_oracle_all = time.time()
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    t0 = time.time()
    def record(status, rows=None, why=None):
        detail[name] = {"status": status, "rows": rows,
                        "oracle_sec": round(time.time() - t0, 2)}
        if why: detail[name]["why"] = why
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails += 1
        record("fail", why="no spark output"); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1
        record("fail", why=str(e)[:300]); continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
        fails += 1; record("fail", why="column mismatch"); continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1
        record("fail", why=f"rows {len(g)} vs {len(w)}"); continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False,
                                      check_exact=True)
        print(f"PASS {name} ({len(g)} rows, {time.time()-t0:.1f}s oracle)")
        record("pass", rows=len(g))
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
        fails += 1; record("fail", why="value mismatch")
oracle_sec = time.time() - t_oracle_all
# builder-side fallback artifact: committed per round so the round's hard
# correctness signal exists even if the driver's own gate fails to record
summary = {"sf_dir": sf, "gates": len(oracle), "pass": len(oracle) - fails,
           "fail": fails, "oracle_total_sec": round(oracle_sec, 1),
           "detail": detail}
with open(f"{out}/correctness_local.json", "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
slow = sorted(detail.items(), key=lambda kv: -kv[1]["oracle_sec"])[:8]
print("\nslowest oracles: " +
      ", ".join(f"{n}={d['oracle_sec']}s" for n, d in slow))
print(f"oracle total {oracle_sec:.1f}s")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries pass")
sys.exit(1 if fails else 0)
