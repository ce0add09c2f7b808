#!/usr/bin/env bash
# Round-open bookkeeping (r16 verdict item 2): the driver writes its
# post-round artifacts (target/bench.json, bench_summary.json,
# LEAKCHECK.json round bump, CORRECTNESS/BENCH/VERDICT/ADVICE) AFTER
# the round's last commit, so every round used to open with
# modified-uncommitted working-tree drift — a repeat judge finding
# (r14/r15/r16). Run this as the round's FIRST act: it commits
# whatever the driver left behind, or no-ops on a clean tree.
# Usage: dev/round_open.sh [round-label]   NOT shipped code.
set -eu
cd "$(dirname "$0")/.."
label="${1:-driver post-round artifacts}"
if git status --porcelain | grep -q .; then
  git add -A
  git commit -m "Commit ${label} left after the previous round's last commit"
  echo "round_open: committed driver drift"
else
  echo "round_open: tree already clean — nothing to commit"
fi
