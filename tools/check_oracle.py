#!/usr/bin/env python3
"""Replay the driver's correctness gate locally: run each oracle SQL in
DuckDB over the sf tables and compare (rows, schema-by-name, sorted value
hash) against the Verify-dumped parquet results.

Optional extra args name-filter the replay (the targeted per-round sf0.1
scale-robustness check of CHANGED oracles — pair with
graft.tools.DumpQuery for the Spark side):

    check_oracle.py SF_DIR OUT_DIR [QUERY ...]
"""
import sys, json, glob
import duckdb

from oracle_compare import compare

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = set(sys.argv[3:])
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for table in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'")

fails = 0
for name in sorted(names - set(oracle)):
    if not glob.glob(f"{out_dir}/{name}"):
        print(f"ERR  {name}: not in oracle_sql.json and not dumped")
        fails += 1

for name, sql in sorted(oracle.items()):
    if names and name not in names:
        continue
    try:
        want = con.execute(sql).df()
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if compare(name, want, got):
            print(f"OK   {name}: {len(want)} rows")
        else:
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1

rows_only = [d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if '/' in d
             and not d.endswith('.json') and not d.endswith('.sql')
             and d.split('/')[-1] not in oracle
             and (not names or d.split('/')[-1] in names)]
for name in sorted(rows_only):
    try:
        n = duckdb.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        if n == 0: fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}"); fails += 1

sys.exit(1 if fails else 0)
