#!/usr/bin/env bash
# Multi-SF correctness guard: run the full Verify dump + DuckDB oracle
# compare at EVERY generated scale factor, so an SF-overfitted constant
# (a threshold tuned to one corpus size, a limit that only holds at sf0.01)
# fails by name between rounds instead of surviving until the driver's
# single-SF gate happens to move. Part of the documented pin recipe
# (README "Contracts & gates"); cheap: sf0.001 adds ~1 min on top of the
# sf0.01 run the driver performs anyway.
#
# Usage: tools/verify_all_sf.sh [sf ...]   (default: 0.001 0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
sfs=("${@:-0.001 0.01}")
[ $# -gt 0 ] && sfs=("$@") || sfs=(0.001 0.01)
fail=0
for sf in "${sfs[@]}"; do
  dir="/root/testdata/sf$sf"
  out="/tmp/verify_sf$sf"
  [ -d "$dir" ] || { echo "SKIP sf$sf (no testdata at $dir)"; continue; }
  echo "=== Verify @ sf$sf ==="
  rm -rf "$out"
  sbt -batch "runMain graft.Verify $dir $out" >/dev/null
  if python3 tools/check_oracle.py "$dir" "$out" | tail -1 | tee "/tmp/verify_sf$sf.summary" | grep -q " 0 fail"; then
    echo "sf$sf: $(cat /tmp/verify_sf$sf.summary)"
  else
    echo "sf$sf FAILED: $(cat /tmp/verify_sf$sf.summary)"
    python3 tools/check_oracle.py "$dir" "$out" | grep FAIL || true
    fail=1
  fi
done
exit $fail
