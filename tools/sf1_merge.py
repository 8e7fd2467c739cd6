#!/usr/bin/env python3
"""Merge the sf1.0 full-catalog oracle report with the capstress
invariant harness into the round's SCALE_SF1 artifact: every gate gets a
row labeled with WHICH check verified it at scale —
  check=oracle          DuckDB value-compare passed at plain sf1.0
  check=oracle+invariant both (the incremental-dedup / CC family also
                        holds on the capstress fixture where the bucket
                        cap binds and the reach-CTE oracle is
                        intractable)
  check=invariant       oracle over budget at sf1.0; covered by the
                        invariant harness
  check=oracle_timeout  over budget and NOT invariant-covered (must be 0
                        or documented)

Usage: sf1_merge.py <rawReport> <invariantsJson> <outJson>
"""
import sys, json

# which invariant checks stand in for which gates (the families whose
# DuckDB replay is intractable or budget-bound at scale)
INVARIANT_COVERS = {
    "d05_connected_components": ["cc_edge_consistency", "cc_label_minimality",
                                 "cc_label_is_member_root",
                                 "cc_shuffled_recompute_equal"],
    "d17_keep_best": ["cc_edge_consistency", "cc_shuffled_recompute_equal"],
    "d02_dedup_groups": ["cc_edge_consistency", "cc_label_minimality"],
    "d16_incremental_dedup": ["s14_round1_stream_eq_bulk"],
    "d18_standing_trickle": ["s14_round1_stream_eq_bulk",
                             "s14_round2_stream_eq_bulk"],
    "s14_stream_incremental_dedup": ["s14_round1_stream_eq_bulk",
                                     "s14_round2_stream_eq_bulk"],
}

raw = json.load(open(sys.argv[1]))
inv = json.load(open(sys.argv[2]))
inv_checks = inv["checks"]

gates = {}
n_oracle = n_both = n_invariant_only = n_uncovered = n_fail = 0
for name, v in sorted(raw["gates"].items()):
    row = dict(v)
    covers = [c for c in INVARIANT_COVERS.get(name, [])
              if inv_checks.get(c) == "pass"]
    if v["status"] == "pass":
        if covers:
            row["check"] = "oracle+invariant"
            row["invariants"] = covers
            n_both += 1
        else:
            row["check"] = "oracle"
            n_oracle += 1
    elif v["status"] == "oracle_timeout" and covers:
        row["check"] = "invariant"
        row["invariants"] = covers
        row["status"] = "pass_invariant"
        n_invariant_only += 1
    elif v["status"] == "oracle_timeout":
        n_uncovered += 1
    else:
        n_fail += 1
    gates[name] = row

out = {
    "metric": "sf1_full_catalog",
    "sf_dir": raw["sf_dir"],
    "capstress_invariants": inv,
    "n_gates": raw["n_gates"],
    "n_pass_oracle": n_oracle,
    "n_pass_oracle_and_invariant": n_both,
    "n_pass_invariant_only": n_invariant_only,
    "n_timeout_uncovered": n_uncovered,
    "n_fail": n_fail,
    "all_gates_checked": n_uncovered == 0 and n_fail == 0,
    "gates": gates,
}
with open(sys.argv[3], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"oracle={n_oracle} oracle+inv={n_both} inv-only={n_invariant_only} "
      f"timeout-uncovered={n_uncovered} fail={n_fail} "
      f"all_checked={n_uncovered == 0 and n_fail == 0}")
