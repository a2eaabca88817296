#!/usr/bin/env python3
"""Targeted oracle replay: like check_oracle.py but only for the query
names given on the command line. Used for the per-round sf0.1
scale-robustness replay of CHANGED oracles (the full-suite DuckDB replay
at sf0.1 costs hours; see BASELINE.md 'Oracle scale-robustness note')."""
import sys, json
import duckdb

from oracle_compare import compare

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
if not names:
    sys.exit("usage: check_oracle_subset.py SF_DIR OUT_DIR QUERY [QUERY...]")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for table in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'")

fails = 0
for name in names:
    if name not in oracle:
        print(f"ERR  {name}: not in oracle_sql.json"); fails += 1; continue
    try:
        want = con.execute(oracle[name]).df()
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if compare(name, want, got):
            print(f"OK   {name}: {len(want)} rows")
        else:
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1

sys.exit(1 if fails else 0)
