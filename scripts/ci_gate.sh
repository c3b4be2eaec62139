#!/usr/bin/env bash
# CI-style gate: run the full suite in ONE process (the configuration
# that used to segfault, VERDICT r2 weak #1) and append the outcome to
# ci_runs.log so suite health is a recorded artifact, not a claim.
# Full output goes to /tmp/ci_gate_full.log (overwritten per run).
#
# Usage: bash scripts/ci_gate.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
# XLA:CPU AOT executables hold many mmap regions; a full run needs more
# than the 65530 default or the loader segfaults (see tests/conftest.py)
if [ -w /proc/sys/vm/max_map_count ]; then
  cur=$(cat /proc/sys/vm/max_map_count)
  [ "$cur" -lt 262144 ] && echo 262144 > /proc/sys/vm/max_map_count
fi
start=$(date -u +%Y-%m-%dT%H:%M:%SZ)
t0=$(date +%s)
python -m pytest tests/ -q "$@" > /tmp/ci_gate_full.log 2>&1
rc=$?
t1=$(date +%s)
summary=$(grep -E "[0-9]+ (passed|failed|error)" /tmp/ci_gate_full.log | tail -1)
echo "${start} rc=${rc} dur=$((t1 - t0))s ${summary}" >> ci_runs.log
tail -5 /tmp/ci_gate_full.log
exit "${rc}"
