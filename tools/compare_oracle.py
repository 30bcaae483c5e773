#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py /tmp/verify_out /root/testdata/sf0.01
For each key in oracle_sql.json: run the SQL in DuckDB over the sf tables,
read the Spark parquet result, sort columns by name, sort rows, and compare
values cell by cell (floats to 1e-9 rel). Queries without an oracle get a
rows-only (>0) check.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    names = sorted(d[:-8] for d in os.listdir(outdir)
                   if d.endswith(".parquet") and not d.startswith("."))
    for name in names:
        files = glob.glob(os.path.join(outdir, f"{name}.parquet", "*.parquet"))
        rel = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in rel.description]
        srows = rel.fetchall()
        if name not in oracles:
            results[name] = ("ROWS_ONLY_OK" if len(srows) > 0 else
                             "ROWS_ONLY_EMPTY")
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        sc, sr = canon(scols, srows)
        oc, odr = canon(ocols, orows)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(odr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(odr)}"
        else:
            bad = None
            for i, (a, b) in enumerate(zip(sr, odr)):
                for x, y in zip(a, b):
                    eq = (x == y)
                    if not eq and isinstance(x, float) and isinstance(y, float):
                        eq = abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                    if not eq and {type(x), type(y)} <= {int, float} | {type(None)}:
                        try:
                            eq = float(x) == float(y)
                        except (TypeError, ValueError):
                            eq = False
                    if not eq:
                        bad = (i, x, y)
                        break
                if bad:
                    break
            results[name] = "OK" if bad is None else f"VALUE_MISMATCH row{bad[0]}: {bad[1]!r} != {bad[2]!r}"
    ok = sum(1 for v in results.values() if v in ("OK", "ROWS_ONLY_OK"))
    for k in sorted(results):
        flag = "  " if results[k] in ("OK", "ROWS_ONLY_OK") else "!!"
        print(f"{flag} {k}: {results[k]}")
    print(f"\n{ok}/{len(results)} pass")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
