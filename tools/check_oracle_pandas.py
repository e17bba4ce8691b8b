#!/usr/bin/env python3
"""Second replica of the driver's DuckDB correctness compare, using the
PANDAS fetch path. CORRECTNESS_r05 proved the driver normalizes through
pandas: DuckDB HUGEINT (sum() over BIGINT) becomes float64 there, so an
int64 Spark column hashes as '218' while the oracle hashes '218.0' —
rows_match stayed true (counts equal) while hash_match flipped false on
exactly the six queries whose oracle carries a HUGEINT column. This tool
reproduces that comparison (df() + str per cell) so the r6 fix
(decimal(38,0) on the mirrored Spark columns, identical under BOTH
fetchall-str and pandas normalization) is testable locally alongside the
original fetchall replica (check_oracle.py)."""
import duckdb, json, sys, glob, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gv"

con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf}/{tbl}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, float) and math.isnan(v): return "nan"
    return str(v)

def normed(rel):
    df = rel.df()
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
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
            fails += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
    except Exception as e:
        print(f"ERROR {name}: {e}"); fails += 1
sys.exit(1 if fails else 0)
