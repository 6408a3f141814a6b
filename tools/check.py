#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB against the
sfDir parquet tables, and compares schema + row values.
"""
import sys, json, glob, os, threading
import duckdb

# optional per-oracle wall budget (seconds): big-SF sweeps interrupt
# oracles DuckDB can't finish in time and record them as TIMEOUT
# instead of hanging the sweep (0 = unlimited)
TIMEOUT = float(os.environ.get("CHECK_TIMEOUT", "0"))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional: comma-separated oracle names to skip — used for big-SF
# sweeps where a query's ORACLE is by-design quadratic (all-pairs SQL)
# even though the engine-side plan is linear
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
timeouts = []
for name, sql in sorted(oracle.items()):
    if name in skip:
        print(f"SKIP {name}: quadratic oracle at this SF")
        continue
    resdir = f"{out}/{name}"
    if not os.path.isdir(resdir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    timer = None
    if TIMEOUT > 0:
        timer = threading.Timer(TIMEOUT, con.interrupt)
        timer.start()
    try:
        got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'")
        exp = con.sql(sql)
        gcols = sorted(got.columns); ecols = sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails += 1; continue
        gtypes = [str(t) for _, t in sorted(zip(got.columns, got.types))]
        etypes = [str(t) for _, t in sorted(zip(exp.columns, exp.types))]
        if gtypes != etypes:
            print(f"WARN {name}: types {gtypes} vs {etypes}")
        sel = ", ".join(f'"{c}"' for c in gcols)
        grows = con.sql(f"SELECT {sel} FROM got ORDER BY ALL").fetchall()
        erows = con.sql(f"SELECT {sel} FROM exp ORDER BY ALL").fetchall()
        if grows == erows:
            print(f"PASS {name}: {len(grows)} rows")
        else:
            fails += 1
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows")
            diff = [(a, b) for a, b in zip(grows, erows) if a != b]
            for a, b in diff[:3]:
                print(f"   spark: {a}\n   duck : {b}")
    except duckdb.InterruptException:
        timeouts.append(name)
        print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT:.0f}s in DuckDB (engine result not judged)")
    except Exception as e:
        if "INTERRUPT" in str(e).upper():
            timeouts.append(name)
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT:.0f}s in DuckDB (engine result not judged)")
        else:
            print(f"FAIL {name}: {e}"); fails += 1
    finally:
        if timer is not None:
            timer.cancel()

extra = [os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)
         and os.path.basename(d) not in oracle]
if extra:
    print(f"rows-only (no oracle): {sorted(extra)}")
if timeouts:
    print(f"oracle timeouts: {sorted(timeouts)}")
sys.exit(1 if fails else 0)
