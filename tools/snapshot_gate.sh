#!/usr/bin/env bash
# Snapshot gate (round-16 postmortem): the end-of-round commit itself
# must build and pass a spot verify BEFORE it is made. Round 16's final
# commit referenced a helper that was never written — `sbt compile`
# failed at HEAD and the driver's correctness/bench artifacts for the
# whole round came back empty. This script makes that class of failure
# structurally impossible: run it from the repo root with the tree in
# exactly the state you are about to commit; a non-zero exit means DO
# NOT COMMIT.
#
# Usage: tools/snapshot_gate.sh [sfDir]        (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"

echo "[gate] 1/3 sbt compile + Test/compile"
sbt -batch ";compile;Test/compile" >/tmp/gate_compile.log 2>&1 || {
  tail -30 /tmp/gate_compile.log; echo "[gate] FAIL: compile"; exit 1; }

OUT="$(mktemp -d /tmp/gate_verify.XXXXXX)"
echo "[gate] 2/3 spot Verify at $SF_DIR -> $OUT"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF_DIR $OUT" \
  >/tmp/gate_verify.log 2>&1 || {
  tail -30 /tmp/gate_verify.log; echo "[gate] FAIL: Verify run"; exit 1; }

echo "[gate] 3/3 DuckDB compare"
python3 tools/compare.py "$SF_DIR" "$OUT" || {
  echo "[gate] FAIL: oracle compare"; exit 1; }

rm -rf "$OUT"
echo "[gate] PASS — safe to commit"
