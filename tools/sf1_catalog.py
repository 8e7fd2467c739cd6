#!/usr/bin/env python3
"""Full-catalog sf1.0 verification (round-14: ONE artifact, EVERY gate,
no gate unchecked — round-13 verdict item 4).

Phase 1: run graft.Verify over the PLAIN sf1.0 fixture (all gates).
Phase 2: run each oracle in its own DuckDB subprocess with a per-oracle
         timeout and value-compare against the Spark dump (the
         local_verify.py comparison, exact values).
Phase 3: any gate whose oracle exceeds its budget is labeled
         "oracle_timeout" and must be covered by the invariant harness
         (graft.VerifyInvariants on the capstress fixture) — the merge
         step stamps those rows check="invariant".

Usage:
  python3 tools/sf1_catalog.py <sfDir> <sparkOut> <reportJson> [--skip-spark]
  python3 tools/sf1_catalog.py --one <name> <sfDir> <sparkOut>   (internal)

The parent prints one line per gate and writes <reportJson> with
{"gates": {name: {check, status, rows, oracle_sec}}, counts...}.
"""
import sys, os, json, subprocess, glob, time

# oracles known to be minutes-long at sf1.0 (measured r13: d16 1096 s)
SLOW = {"d16_incremental_dedup", "d18_standing_trickle",
        "s14_stream_incremental_dedup"}
DEFAULT_TIMEOUT = int(os.environ.get("SF1_TIMEOUT", "900"))
SLOW_TIMEOUT = int(os.environ.get("SF1_SLOW_TIMEOUT", "2700"))


def run_one(name, sf, out):
    """Child: run one oracle + compare; print a one-line JSON verdict."""
    import duckdb
    import pandas as pd
    t0 = time.time()
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        tbl = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    sql = json.load(open(f"{out}/oracle_sql.json"))[name]
    spark_dir = f"{out}/{name}"
    verdict = {"status": "fail"}
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        want = con.execute(sql).df()
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) != list(w.columns):
            verdict["why"] = f"columns {list(g.columns)} vs {list(w.columns)}"
        elif len(g) != len(w):
            verdict["why"] = f"rows {len(g)} vs {len(w)}"
        else:
            gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
            ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(gs, ws, check_dtype=False,
                                              check_exact=True)
                verdict = {"status": "pass", "rows": len(g)}
            except AssertionError as e:
                verdict["why"] = "value mismatch: " + str(e)[:200]
    except Exception as e:
        verdict["why"] = str(e)[:300]
    verdict["oracle_sec"] = round(time.time() - t0, 1)
    print("VERDICT " + json.dumps(verdict))


def main():
    if sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    sf, out, report = sys.argv[1], sys.argv[2], sys.argv[3]
    skip_spark = "--skip-spark" in sys.argv[4:]

    if not skip_spark:
        rc = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf} {out}"],
            cwd="/root/repo", capture_output=True, text=True, timeout=14400)
        if rc.returncode != 0:
            print(rc.stdout[-4000:]); print(rc.stderr[-2000:]); sys.exit(1)
        for line in rc.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    gates = {}
    n_pass = n_fail = n_timeout = 0

    def check_one(name):
        budget = SLOW_TIMEOUT if name in SLOW else DEFAULT_TIMEOUT
        t0 = time.time()
        try:
            rc = subprocess.run(
                [sys.executable, __file__, "--one", name, sf, out],
                capture_output=True, text=True, timeout=budget)
            v = None
            for line in rc.stdout.splitlines():
                if line.startswith("VERDICT "):
                    v = json.loads(line[len("VERDICT "):])
            if v is None:
                v = {"status": "fail", "why": ("no verdict: " +
                     (rc.stdout + rc.stderr)[-200:]),
                     "oracle_sec": round(time.time() - t0, 1)}
        except subprocess.TimeoutExpired:
            v = {"status": "oracle_timeout", "oracle_sec": budget}
        v["check"] = "oracle"
        return name, v

    import concurrent.futures
    workers = int(os.environ.get("SF1_WORKERS", "6"))
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        for name, v in ex.map(check_one, sorted(oracle)):
            gates[name] = v
            if v["status"] == "pass":
                n_pass += 1
            elif v["status"] == "oracle_timeout":
                n_timeout += 1
            else:
                n_fail += 1
            print(f"{v['status'].upper():14s} {name} ({v['oracle_sec']}s)",
                  flush=True)

    summary = {"sf_dir": sf, "gates": gates, "n_gates": len(oracle),
               "n_pass": n_pass, "n_fail": n_fail, "n_timeout": n_timeout}
    with open(report, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n{n_pass}/{len(oracle)} pass, {n_timeout} timeout (need "
          f"invariant coverage), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
