#!/usr/bin/env bash
# Fetch-failure chaos sweep — stage-resubmission determinism at
# REGISTRY level (the curated 9-shape StageResubmissionSpec's big
# sibling, mirroring how the task-retry axis went curated → whole
# registry in r18). SPARK_GRAFT_FETCH_CHAOS=1 makes Verify route
# every query's written frame through its plan RDD with a wrapper
# that throws a REAL FetchFailedException (naming the nearest
# upstream shuffle) from partition 0's first attempt: the scheduler
# unregisters that map output, RESUBMITS the upstream stage, and
# re-runs only the failed partition against REGENERATED output while
# sibling partitions keep the original — so the parquet the DuckDB
# oracle compares IS the mixed-provenance result, for every
# shuffle-bearing query. A nondeterministic map stage (unstable sort
# under a limit, rand bucketing, iteration-order floats) diverges
# exactly here — the failure class behind Spark's indeterminate-stage
# protections (SPARK-23207).
#
# Fired-guards (all listener-side — an in-task counter would be blind
# on a multi-JVM master and an accumulator is dropped with the failed
# task): VERIFY_CONF must echo fetch_chaos=on; VERIFY_FETCH_CHAOS must
# show fetch_failed == expected (one injection per shuffle-bearing
# query) and resubmitted >= 1 (real stage attempts > 0 reached the
# scheduler).
#
# Usage: scripts/fetch_chaos_sweep.sh [sfdir]   (default sf0.01)
set -u
cd "$(dirname "$0")/.."
. scripts/lib_verify_gate.sh
sfdir="${1:-/root/testdata/sf0.01}"
overall=0
run_verify_gate fetch_chaos "$sfdir" "SPARK_GRAFT_FETCH_CHAOS=1"
if ! grep -q "^\(\[info\] \)*VERIFY_CONF .*\bfetch_chaos=on\b" \
    /tmp/verify_fetch_chaos.log; then
  echo "FAIL  fetch_chaos: VERIFY_CONF does not show fetch_chaos=on —" \
    "the knob did not take effect"
  overall=1
fi
line=$(grep -o "VERIFY_FETCH_CHAOS.*" /tmp/verify_fetch_chaos.log | tail -1)
if [ -z "$line" ]; then
  echo "FAIL  fetch_chaos: no VERIFY_FETCH_CHAOS line"
  overall=1
else
  echo "$line"
  failed=$(echo "$line" | grep -o "fetch_failed=[0-9]*" | grep -o "[0-9]*")
  resub=$(echo "$line" | grep -o "resubmitted=[0-9]*" | grep -o "[0-9]*")
  expect=$(echo "$line" | grep -o "expected=[0-9]*" | grep -o "[0-9]*")
  if [ "$failed" != "$expect" ] || [ "${failed:-0}" -lt 1 ]; then
    echo "FAIL  fetch_chaos: fetch_failed=$failed != expected=$expect —" \
      "some shuffle-bearing query never took its injection"
    overall=1
  fi
  if [ "${resub:-0}" -lt 1 ]; then
    echo "FAIL  fetch_chaos: zero stage resubmissions observed — the" \
      "fetch failures never forced upstream regeneration"
    overall=1
  fi
fi
exit $overall
