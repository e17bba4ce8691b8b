#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare:
run each oracle SQL on the sf parquet tables, compare with the Spark
parquet dump (columns sorted by name, rows sorted, values hashed)."""
import duckdb, json, sys, glob, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gv"

con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf}/{tbl}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(v)
    return str(v)

def normed(rel):
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    rows = [tuple(norm_cell(r[i]) for i in idx) for r in rel.fetchall()]
    return cols, sorted(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        oc, orows = normed(con.sql(sql))
        files = glob.glob(f"{out}/{name}/*.parquet")
        sc, srows = normed(con.sql(f"SELECT * FROM read_parquet({files!r})"))
        if oc != sc:
            print(f"FAIL {name}: schema oracle={oc} spark={sc}"); fails += 1
        elif orows != srows:
            diff = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)} first-diffs={diff}")
            if len(orows) != len(srows):
                so, ss = set(orows), set(srows)
                print(f"  only-oracle={list(so-ss)[:2]} only-spark={list(ss-so)[:2]}")
            fails += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
    except Exception as e:
        print(f"ERROR {name}: {e}"); fails += 1

nosql = [d.split('/')[-1] for d in sorted(glob.glob(f"{out}/q*")) if d.split('/')[-1] not in oracle]
print(f"\nrows-only (no oracle): {nosql}")
sys.exit(1 if fails else 0)
