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
. scripts/lib_verify_gate.sh
overall=0
for sf in sf0.001 sf0.1; do
  run_verify_gate "$sf" "/root/testdata/$sf"
done
exit $overall
