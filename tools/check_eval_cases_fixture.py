#!/usr/bin/env python3
"""Replay the eval_cases hybrid oracle SQL over the hand-built fixture
dumps (tools/EvalCasesFixture.scala) and assert row-set equality with the
engine's case table — executed evidence for the SQL branches that the
driver gate's synthetic corpus never reaches (no-prediction FN incl. the
is_date filter and NER_FN_LOWERCASED, partial-name wrong/correct,
multi-candidate labels).

Self-protecting: also asserts that those previously-dead branch labels
actually APPEAR in the fixture output, so a fixture/Synth/isDate drift
that silently kills a branch fails the check instead of passing
vacuously."""
import sys
import duckdb

from oracle_compare import compare

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_cases_fixture"
sql = open(f"{out}/eval_cases.sql").read()

want = duckdb.sql(sql).df()
got = duckdb.sql(f"SELECT * FROM '{out}/eval_cases_expected/*.parquet'").df()

if not compare("eval_cases_fixture", want, got):
    sys.exit(1)

# the branches this fixture EXISTS to exercise must actually fire
REQUIRED_LABELS = {
    "NER_FN", "NER_FN_LOWERCASED", "NER_FN_OTHER",
    "DISAMBIGUATION_PARTIAL_NAME_WRONG", "DISAMBIGUATION_PARTIAL_NAME_CORRECT",
    "DISAMBIGUATION_MULTI_CANDIDATES_WRONG", "DISAMBIGUATION_MULTI_CANDIDATES_CORRECT",
    "DISAMBIGUATION_CANDIDATES_WRONG", "HYPERLINK_WRONG",
}
seen = set()
for cell in got["errors_ignored"]:
    seen.update(x for x in str(cell).split(",") if x)
missing = REQUIRED_LABELS - seen
if missing:
    print(f"FAIL: fixture no longer exercises: {sorted(missing)} — "
          "a Synth/isDate/fixture drift made a dead branch dead again")
    sys.exit(1)
linkings = set(got["linking_ignored"].astype(str))
if not {"TP", "FN", "FN,FP"} <= linkings:
    print(f"FAIL: linking decision branches missing: got {sorted(linkings)}")
    sys.exit(1)

print(f"OK eval_cases fixture: {len(want)} cases, oracle == engine, "
      f"all dead-branch labels exercised")
print(duckdb.sql(
    f"SELECT text, linking_ignored, errors_ignored "
    f"FROM '{out}/eval_cases_expected/*.parquet' ORDER BY \"begin\"").df().to_string())
sys.exit(0)
