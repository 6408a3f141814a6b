#!/usr/bin/env python3
"""Aggregate-compare variant of check.py for big-SF parity sweeps.

check.py fetches both result sets into Python and compares sorted
rows — at sf10 a single query can be 15M rows x 9 columns, and the
fetchall dominates the sweep. Here both sides reduce INSIDE DuckDB to
(count, order-independent multiset hash over all columns): identical
verdict semantics (multiset equality == sorted-rows equality given the
same column set, modulo 64-bit hash-sum collisions), none of the
transfer cost. check.py remains the driver-faithful gate at small SF.

Usage: python3 tools/check_fast.py <sfDir> <outDir> [onlyCsv] [skipCsv]
Env: CHECK_TIMEOUT=<seconds per oracle> (0 = unlimited)
"""
import sys, json, glob, os, threading
import duckdb

TIMEOUT = float(os.environ.get("CHECK_TIMEOUT", "0"))
sf, out = sys.argv[1], sys.argv[2]
# empty onlyCsv ("") means "no filter", NOT "check nothing" — it is the
# placeholder slot when only skipCsv is being passed
only = (set(x for x in sys.argv[3].split(",") if x) or None) if len(sys.argv) > 3 else None
skip = set(x for x in sys.argv[4].split(",") if x) if len(sys.argv) > 4 else set()

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    if name in skip:
        print(f"SKIP {name}: quadratic oracle at this SF", flush=True)
        continue
    resdir = f"{out}/{name}"
    if not os.path.isdir(resdir):
        print(f"FAIL {name}: no spark result dir", flush=True)
        fails += 1
        continue
    timer = threading.Timer(TIMEOUT, con.interrupt) if TIMEOUT > 0 else None
    if timer:
        timer.start()
    try:
        got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'")
        exp = con.sql(sql)
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}", flush=True)
            fails += 1
            continue
        gtypes = [str(t) for _, t in sorted(zip(got.columns, got.types))]
        etypes = [str(t) for _, t in sorted(zip(exp.columns, exp.types))]
        if gtypes != etypes:
            print(f"WARN {name}: types {gtypes} vs {etypes}", flush=True)
        sel = ", ".join(f'"{c}"' for c in gcols)
        agg = f"count(*) AS n, coalesce(sum(hash(ROW({sel}))), 0) AS h"
        g = con.sql(f"SELECT {agg} FROM got").fetchone()
        e = con.sql(f"SELECT {agg} FROM exp").fetchone()
        if g == e:
            print(f"PASS {name}: {g[0]} rows (multiset hash)", flush=True)
        else:
            print(f"FAIL {name}: got (n={g[0]}, h={g[1]}) vs oracle (n={e[0]}, h={e[1]})", flush=True)
            fails += 1
    except duckdb.InterruptException:
        print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT:.0f}s in DuckDB", flush=True)
    except Exception as ex:
        if "INTERRUPT" in str(ex).upper():
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT:.0f}s in DuckDB", flush=True)
        else:
            print(f"FAIL {name}: {ex}", flush=True)
            fails += 1
    finally:
        if timer:
            timer.cancel()
sys.exit(1 if fails else 0)
