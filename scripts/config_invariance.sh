#!/usr/bin/env bash
# Config-invariance sweep: every oracle-checked result must be
# IDENTICAL under a hostile physical configuration — on a real cluster
# the partitioning never matches local[32]'s, so a float fold whose
# value depends on partition order, a limit riding an unpinned sort,
# or an AQE-dependent plan picking a different-but-buggy path would
# pass the canonical config forever and diverge at 1000 executors.
# This runs the full Verify + DuckDB compare at sf0.01 with an odd
# parallelism (7 threads), a mismatched prime shuffle-partition count
# (13) and AQE DISABLED, then again with a degenerate single shuffle
# partition. Hash-exact under both = the results are functions of the
# data, not of the layout. The shared gate helper also asserts each
# knob TOOK EFFECT (via Verify's VERIFY_CONF echo), so a renamed env
# var cannot silently degrade this to a canonical-config re-run.
#
# Usage: scripts/config_invariance.sh  (from the repo root; ~5 min)
set -u
cd "$(dirname "$0")/.."
. scripts/lib_verify_gate.sh
overall=0
run_verify_gate cfg_hostile /root/testdata/sf0.01 \
  SPARK_GRAFT_CPUS=7 SPARK_GRAFT_SHUFFLE_PARTITIONS=13 SPARK_GRAFT_AQE=false
run_verify_gate cfg_onepart /root/testdata/sf0.01 \
  SPARK_GRAFT_CPUS=5 SPARK_GRAFT_SHUFFLE_PARTITIONS=1 SPARK_GRAFT_AQE=false
exit $overall
