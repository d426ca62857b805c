#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each entry in <out>/oracle_sql.json: run the SQL in DuckDB over views of
the sfDir parquet tables, read the Spark result parquet, sort columns by name
and rows by value, and compare cell-by-cell (floats within 1e-9 rel).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            d = con.execute(sql)
            dcols = [c[0] for c in d.description]
            drows, dcols_s = norm(d.fetchall(), dcols)
            s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
            scols = [c[0] for c in s.description]
            srows, scols_s = norm(s.fetchall(), scols)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        if dcols_s != scols_s:
            print(f"FAIL {name}: columns duck={dcols_s} spark={scols_s}")
            n_bad += 1
            continue
        if len(drows) != len(srows):
            print(f"FAIL {name}: rows duck={len(drows)} spark={len(srows)}")
            n_bad += 1
            continue
        bad = None
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            if not all(eq(a, b) for a, b in zip(dr, sr)):
                bad = (i, dr, sr)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n  duck ={bad[1]}\n  spark={bad[2]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
