#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir] [--skip-run]

Runs graft.Verify (Spark) to dump each SparkEntry.queries result to
parquet + oracle_sql.json, then replays each oracle in DuckDB over the
same parquet tables and compares: schema (column names), row count, and
a value hash over rows sorted by all columns (columns sorted by name) —
a strict over-approximation of whatever the driver does.
"""
import duckdb, glob, json, os, subprocess, sys
from decimal import Decimal

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out = args[1] if len(args) > 1 else "/tmp/verify_out"

if "--skip-run" not in sys.argv:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
                       cwd="/root/repo", env=env, capture_output=True, text=True)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return "true" if v else "false"
    if isinstance(v, Decimal): return str(v)
    if isinstance(v, float): return repr(v)
    if isinstance(v, bytes): return v.hex()
    return str(v)

def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out_rows

fails = ok = 0
for dirname in sorted(os.listdir(out)):
    d = os.path.join(out, dirname)
    if not os.path.isdir(d): continue
    # Driver convention (round 1 evidence): oracle lookup uses the raw
    # directory name "q_foo.parquet". Verify emits both key forms, but
    # mimic the driver here by preferring the raw name.
    name = dirname if dirname in oracles or dirname[:-8] not in oracles \
        else dirname[:-8]
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written"); fails += 1; continue
    got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    gcols, grows = table_repr(got.columns, got.fetchall())
    if name not in oracles:
        print(f"rows-only {name}: {len(grows)} rows" + ("" if grows else "  << EMPTY")); continue
    try:
        exp = con.sql(oracles[name])
        ecols, erows = table_repr(exp.columns, exp.fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:160]}"); fails += 1; continue
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} != {ecols}"); fails += 1; continue
    if len(grows) != len(erows):
        print(f"FAIL {name}: rowcount {len(grows)} != {len(erows)}"); fails += 1; continue
    bad = [i for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
    if bad:
        i = bad[0]
        print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:")
        print(f"   spark: {grows[i][:300]}")
        print(f"   duck : {erows[i][:300]}")
        fails += 1; continue
    print(f"OK   {name}: {len(grows)} rows"); ok += 1
print(f"\n{ok} oracle-matched, {fails} failed, "
      f"{len([n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))]) - ok - fails} rows-only")
sys.exit(1 if fails else 0)
