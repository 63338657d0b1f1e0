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
# data, not of the layout.
#
# Usage: scripts/config_invariance.sh  (from the repo root; ~5 min)
set -u
cd "$(dirname "$0")/.."
overall=0
run_one() {
  local tag="$1"; shift
  local out="/tmp/verify_out_cfg_$tag"
  rm -rf "$out"
  echo "== config '$tag' ($*): Spark Verify =="
  env "$@" sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out" \
    >"/tmp/verify_cfg_$tag.log" 2>&1
  if [ $? -ne 0 ]; then
    echo "FAIL  Verify main crashed under config '$tag' (see /tmp/verify_cfg_$tag.log)"
    overall=1
    return
  fi
  python3 scripts/verify_local.py /root/testdata/sf0.01 "$out" \
    >"/tmp/oracle_cfg_$tag.log" 2>&1
  local rc=$?
  local ok total
  ok=$(grep -c '^OK' "/tmp/oracle_cfg_$tag.log")
  total=$(grep -c '^\(OK\|FAIL\)' "/tmp/oracle_cfg_$tag.log")
  echo "config '$tag': $ok/$total hash-exact"
  if [ "$total" -eq 0 ]; then
    echo "FAIL  config '$tag': oracle compare ran ZERO queries"
    overall=1
  fi
  if [ $rc -ne 0 ]; then
    grep '^FAIL' "/tmp/oracle_cfg_$tag.log" | head -20
    overall=1
  fi
}
run_one hostile SPARK_GRAFT_CPUS=7 SPARK_GRAFT_SHUFFLE_PARTITIONS=13 SPARK_GRAFT_AQE=false
run_one onepart SPARK_GRAFT_CPUS=5 SPARK_GRAFT_SHUFFLE_PARTITIONS=1 SPARK_GRAFT_AQE=false
exit $overall
