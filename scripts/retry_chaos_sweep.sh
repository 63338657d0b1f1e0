#!/usr/bin/env bash
# Retry-chaos sweep: the full Verify + DuckDB compare while every n-th
# first-attempt task is KILLED and rescheduled (Verify's chaos
# listener, SPARK_GRAFT_TASK_CHAOS). RetryDeterminismSpec pins eight
# curated operators under an injected retry; this extends the
# execution-history axis to the WHOLE registry, writes included — on a
# 1000-executor cluster task re-execution (preemption, OOM kills,
# speculative cancels) is steady-state, so every oracle-checked result
# must be a function of the data, not of which task attempt computed
# it. Hash-exact under chaos = no operator leaks per-attempt
# nondeterminism or side effects into its output.
#
# The fired-guard: a run that killed ZERO tasks is a plain re-dump
# masquerading as a chaos pass, so the sweep fails unless Verify's
# VERIFY_CHAOS line reports a nonzero kill count.
#
# Usage: scripts/retry_chaos_sweep.sh [n] [sfdir]
#        (default: every 20th task at sf0.01, ~4 min; pass a bigger
#        fixture for longer tasks — more kills land mid-execution)
set -u
cd "$(dirname "$0")/.."
. scripts/lib_verify_gate.sh
n="${1:-20}"
sfdir="${2:-/root/testdata/sf0.01}"
overall=0
run_verify_gate chaos "$sfdir" "SPARK_GRAFT_TASK_CHAOS=$n"
if ! grep -q "VERIFY_CHAOS killed=[1-9]" /tmp/verify_chaos.log; then
  echo "FAIL  chaos: zero tasks killed — the sweep ran a plain re-dump" \
    "(see /tmp/verify_chaos.log)"
  overall=1
else
  grep -o "VERIFY_CHAOS killed=[0-9]*" /tmp/verify_chaos.log
fi
exit $overall
