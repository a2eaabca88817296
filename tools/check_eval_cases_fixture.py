#!/usr/bin/env python3
"""Replay the eval_cases hybrid oracle SQL over the hand-built fixture
dumps (tools/EvalCasesFixture.scala) and assert row-set equality with the
engine's case table — executed evidence for the SQL branches that the
driver gate's synthetic corpus never reaches (no-prediction FN incl. the
is_date filter and NER_FN_LOWERCASED, partial-name wrong/correct,
multi-candidate labels)."""
import sys
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_cases_fixture"
sql = open(f"{out}/eval_cases.sql").read()

want = duckdb.sql(sql).df()
got = duckdb.sql(f"SELECT * FROM '{out}/eval_cases_expected/*.parquet'").df()

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

w, g = canon(want), canon(got)
ok = True
if list(w.columns) != list(g.columns):
    print(f"FAIL columns: oracle={list(w.columns)} engine={list(g.columns)}")
    ok = False
elif len(w) != len(g):
    print(f"FAIL rows: oracle={len(w)} engine={len(g)}")
    ok = False
else:
    for c in w.columns:
        same = w[c].astype(str) == g[c].astype(str)
        if not same.all():
            bad = (~same).idxmax()
            print(f"FAIL col {c} row {bad}: oracle={w[c].astype(str)[bad]!r} "
                  f"engine={g[c].astype(str)[bad]!r}")
            ok = False
if ok:
    print(f"OK eval_cases fixture: {len(w)} cases, oracle == engine")
    # show the exercised branch labels for the reader
    print(duckdb.sql(
        f"SELECT text, linking_ignored, errors_ignored "
        f"FROM '{out}/eval_cases_expected/*.parquet' ORDER BY \"begin\"").df().to_string())
sys.exit(0 if ok else 1)
