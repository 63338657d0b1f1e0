# Shared run-Verify-and-compare block for the standing sweeps
# (cross_sf_sweep.sh varies the DATA, config_invariance.sh varies the
# LAYOUT). One definition of the run/compare/count/zero-coverage logic
# so a fix to the counting or guard never has to land twice — the two
# gates cannot silently diverge.
#
# Usage:  run_verify_gate <tag> <sfdir> [ENV=VAL ...]
# Writes: /tmp/verify_<tag>.log, /tmp/oracle_<tag>.log,
#         /tmp/verify_out_<tag>/ (parquet dumps)
# Sets:   overall=1 on any failure (caller initializes overall=0).
run_verify_gate() {
  local tag="$1" sfdir="$2"; shift 2
  local out="/tmp/verify_out_$tag"
  rm -rf "$out"
  echo "== $tag ($sfdir${*:+; $*}): Spark Verify =="
  env "$@" sbt -batch "runMain graft.Verify $sfdir $out" \
    >"/tmp/verify_$tag.log" 2>&1
  if [ $? -ne 0 ]; then
    echo "FAIL  $tag: Verify main crashed (see /tmp/verify_$tag.log)"
    overall=1
    return
  fi
  # the knobs must have TAKEN EFFECT: Verify echoes the live session's
  # config; a renamed env var silently re-running the canonical config
  # is the vacuous-pass failure class this guard exists for
  local want
  for kv in "$@"; do
    case "$kv" in
      SPARK_GRAFT_SHUFFLE_PARTITIONS=*) want="shuffle=${kv#*=}" ;;
      SPARK_GRAFT_AQE=*) want="aqe=${kv#*=}" ;;
      *) continue ;;
    esac
    # anchored, allowing sbt's "[info] " prefix on forked-run stdout —
    # a fully un-anchored match could be satisfied by any later log
    # line QUOTING the requested value (an error message, a
    # requested-vs-effective echo), silently re-opening the vacuous
    # pass this guard exists to prevent
    if ! grep -q "^\(\[info\] \)*VERIFY_CONF .*\b$want\b" \
        "/tmp/verify_$tag.log"; then
      echo "FAIL  $tag: requested $kv but VERIFY_CONF does not show" \
        "'$want' — the knob did not take effect"
      overall=1
      return
    fi
  done
  echo "== $tag: DuckDB oracle compare =="
  python3 scripts/verify_local.py "$sfdir" "$out" \
    >"/tmp/oracle_$tag.log" 2>&1
  local rc=$?
  local ok total
  ok=$(grep -c '^OK' "/tmp/oracle_$tag.log")
  total=$(grep -c '^\(OK\|FAIL\)' "/tmp/oracle_$tag.log")
  echo "$tag: $ok/$total hash-exact"
  # a zero-coverage compare (empty/truncated oracle_sql.json → the
  # loop ran zero iterations and exited 0) must not pass the gate —
  # silent truncation reading as "covered everything" is the exact
  # failure class these scripts exist to prevent
  if [ "$total" -eq 0 ]; then
    echo "FAIL  $tag: oracle compare ran ZERO queries"
    overall=1
  fi
  if [ $rc -ne 0 ]; then
    grep '^FAIL' "/tmp/oracle_$tag.log" | head -20
    overall=1
  fi
}
