#!/usr/bin/env python3
"""Assemble a CORRECTNESS_sf{N}.json artifact from check.py /
check_fast.py log output (driver-side tooling, like check.py).

Usage: python3 tools/assemble_scale_artifact.py <sf> <data_note> <check_note> <out.json> <log> [log2 ...]

Log lines consumed: "PASS name: N rows...", "FAIL name: ...",
"TIMEOUT name: ...", "SKIP name: ...". Names absent from every log but
present in the verify dump's oracle_sql.json are ignored; rows-only
queries (no oracle) are listed from the dump dir via the extra
ROWS_ONLY env (comma-separated).
"""
import json
import os
import re
import sys

sf, data_note, check_note, out = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
logs = sys.argv[5:]
rows_only = [x for x in os.environ.get("ROWS_ONLY", "").split(",") if x]

queries = {}
totals = {"pass": 0, "oracle_timeout": 0, "oracle_skipped": 0, "rows_only": 0, "fail": 0}
pat = re.compile(r"^(PASS|FAIL|TIMEOUT|SKIP|SAMPLED) (\S+?):\s*(.*)$")
sampled = {}
for log in logs:
    for line in open(log):
        m = pat.match(line.strip())
        if not m:
            continue
        verdict, name, rest = m.groups()
        if verdict == "SAMPLED":
            # replica-0 slice of the big-SF engine run vs the full
            # sf0.1 oracle (tools/sampled_check.py) — recorded as an
            # extra field on the skip row, not a status of its own.
            # A fail is sticky: if ANY dump block reported fail for
            # this query, a later block's pass must not mask it.
            prev = sampled.get(name, "")
            if not prev.startswith("fail"):
                sampled[name] = rest[:200]
        elif verdict == "PASS":
            entry = {"status": "pass"}
            rm = re.match(r"(\d+) rows", rest)
            if rm:
                entry["rows"] = int(rm.group(1))
            queries[name] = entry
        elif verdict == "TIMEOUT":
            queries[name] = {"status": "oracle_timeout", "note": rest[:160]}
        elif verdict == "SKIP":
            queries[name] = {"status": "oracle_skipped", "note": rest[:160]}
        else:
            queries[name] = {"status": "fail", "note": rest[:160]}
for name in rows_only:
    queries[name] = {"status": "rows_only", "note": "approximate ANN by design; recall-property-tested in ScaleSpec"}
for name, note in sampled.items():
    if name in queries:
        queries[name]["sampled_check"] = note
for q in queries.values():
    totals[q["status"]] += 1
totals["sampled_pass"] = sum(1 for q in queries.values()
                             if str(q.get("sampled_check", "")).startswith("pass"))
totals = {k: v for k, v in totals.items() if v}
art = {"sf": int(sf), "data": data_note, "check": check_note, "totals": totals,
       "queries": dict(sorted(queries.items()))}
json.dump(art, open(out, "w"), indent=1)
print(f"[assemble] {out}: {totals}")
sys.exit(1 if totals.get("fail") else 0)
