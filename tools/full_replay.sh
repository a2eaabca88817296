#!/bin/sh
# Full-suite DuckDB oracle replay at an arbitrary scale factor — the one
# documented entry point for the periodic sf0.1 robustness pass (round-6
# verdict item 9). Usage:
#   tools/full_replay.sh [SF_DIR] [OUT_DIR]
# Defaults: SF_DIR=/root/testdata/sf0.1, OUT_DIR=/tmp/replay_<sf>.
# The engine dump takes minutes; the DuckDB side is the slow half at
# sf0.1 (the HUGEINT signature CTEs — hours; that asymmetry is itself a
# datum on why the engine computes signatures natively). Exit 0 = every
# oracle-gated query hash-green. Record the run in BASELINE.md.
set -e
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/replay_$(basename "$SF")}"
echo "[full_replay] dumping engine results for $SF -> $OUT"
sbt -batch "runMain graft.Verify $SF $OUT"
echo "[full_replay] replaying oracles in DuckDB"
python3 "$(dirname "$0")/check_oracle.py" "$SF" "$OUT"
echo "[full_replay] clean: all oracles hash-green at $SF"
