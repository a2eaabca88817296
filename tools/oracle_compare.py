"""Shared canonicalization + strict compare for the DuckDB oracle
checkers (check_oracle.py, check_eval_cases_fixture.py).

STRICT value compare: stringify like the driver's hash canonicalizer does
(no pd.to_numeric — that masked the round-1 DuckDB sum()->HUGEINT vs
Spark BIGINT rendering mismatch). A dtype difference that changes the
string form (e.g. '123.0' vs '123', Decimal('123') vs 123) must FAIL
here exactly as it fails the gate."""
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name, want: pd.DataFrame, got: pd.DataFrame) -> bool:
    """Print a FAIL line and return False on the first difference;
    True when the canonicalized frames are identical."""
    w, g = canon(want), canon(got)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {name}: columns differ: oracle={list(w.columns)} got={list(g.columns)}")
        return False
    if len(w) != len(g):
        print(f"FAIL {name}: rows differ: oracle={len(w)} got={len(g)}")
        return False
    for c in w.columns:
        wc, gc = w[c].astype(str), g[c].astype(str)
        same = wc == gc
        if not same.all():
            bad = (~same).idxmax()
            print(f"FAIL {name}: column {c} (oracle dtype={w[c].dtype}, "
                  f"got dtype={g[c].dtype}) differs at row {bad}: "
                  f"oracle={wc[bad]!r} got={gc[bad]!r}")
            return False
    return True
