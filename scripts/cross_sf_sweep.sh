#!/usr/bin/env bash
# Cross-scale-factor oracle sweep — the standing gate behind round 17's
# one-off "141/141 hash-exact at sf0.001, sf0.01 AND sf0.1" run. The
# driver's own gate only ever checks sf0.01, so a SCALE-DEPENDENT logic
# bug (a threshold tuned to one fixture, an overflow that needs volume,
# a sampler whose seed interacts with partition count) is invisible to
# it; this sweep runs the full Verify + DuckDB compare at the other two
# committed fixtures. Run before each round's close and record the two
# counts in PLANS.md's round block.
#
# Usage: scripts/cross_sf_sweep.sh  (from the repo root; ~6 min)
# Exit 0 = every query hash-exact at BOTH extra scale factors.
set -u
cd "$(dirname "$0")/.."
overall=0
for sf in sf0.001 sf0.1; do
  out="/tmp/verify_out_$sf"
  rm -rf "$out"
  echo "== $sf: Spark Verify =="
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >"/tmp/verify_$sf.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAIL  Verify main exited $rc at $sf (see /tmp/verify_$sf.log)"
    overall=1
    continue
  fi
  echo "== $sf: DuckDB oracle compare =="
  python3 scripts/verify_local.py "/root/testdata/$sf" "$out" >"/tmp/oracle_$sf.log" 2>&1
  rc=$?
  ok=$(grep -c '^OK' "/tmp/oracle_$sf.log")
  total=$(grep -c '^\(OK\|FAIL\)' "/tmp/oracle_$sf.log")
  echo "$sf: $ok/$total hash-exact"
  # a zero-coverage compare (empty/truncated oracle_sql.json → the
  # loop ran zero iterations and exited 0) must not pass the gate —
  # silent truncation reading as "covered everything" is the exact
  # failure class this script exists to prevent
  if [ "$total" -eq 0 ]; then
    echo "FAIL  $sf: oracle compare ran ZERO queries"
    overall=1
  fi
  if [ $rc -ne 0 ]; then
    grep '^FAIL' "/tmp/oracle_$sf.log" | head -20
    overall=1
  fi
done
exit $overall
