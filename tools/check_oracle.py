#!/usr/bin/env python3
"""Replay the driver's correctness gate locally: run each oracle SQL in
DuckDB over the sf tables and compare (rows, schema-by-name, sorted value
hash) against the Verify-dumped parquet results."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for table in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ: oracle={list(w.columns)} got={list(g.columns)}")
            fails += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows differ: oracle={len(w)} got={len(g)}")
            fails += 1
            continue
        # STRICT value compare: stringify like the driver's hash canonicalizer
        # does (no pd.to_numeric — that masked the round-1 DuckDB
        # sum()->HUGEINT vs Spark BIGINT rendering mismatch). A dtype
        # difference that changes the string form (e.g. '123.0' vs '123',
        # Decimal('123') vs 123) must FAIL here exactly as it fails the gate.
        eq = True
        for c in w.columns:
            wc, gc = w[c].astype(str), g[c].astype(str)
            same = wc == gc
            if not same.all():
                bad = (~same).idxmax()
                print(f"FAIL {name}: column {c} (oracle dtype={w[c].dtype}, "
                      f"got dtype={g[c].dtype}) differs at row {bad}: "
                      f"oracle={wc[bad]!r} got={gc[bad]!r}")
                eq = False
                break
        if eq:
            print(f"OK   {name}: {len(w)} rows")
        else:
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1

rows_only = [d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if '/' in d
             and not d.endswith('.json') and d.split('/')[-1] not in oracle]
for name in sorted(rows_only):
    try:
        n = duckdb.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        if n == 0: fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}"); fails += 1

sys.exit(1 if fails else 0)
