#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB
(with each testdata table registered as a view) and compare values
column-name-sorted, row-sorted. Usage:
    python3 scripts/verify_local.py [sfDir] [outDir]
(Does NOT run sbt; run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import json, math, sys
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_types = dict(zip(got_rel.columns, map(str, got_rel.types)))
        got_cols, got = norm(got_rel.fetchall(), got_rel.columns)
        exp_rel = con.sql(sql)
        exp_types = dict(zip(exp_rel.columns, map(str, exp_rel.types)))
        exp_cols, exp = norm(exp_rel.fetchall(), exp_rel.columns)
    except Exception as e:
        print(f"FAIL  {name}: {e}")
        fails += 1
        continue
    if got_cols != exp_cols:
        print(f"FAIL  {name}: columns {got_cols} != {exp_cols}")
        fails += 1
    # the driver's hash is TYPE-sensitive (round 1: DuckDB HUGEINT vs
    # Spark BIGINT hashed differently despite bit-exact values) — so
    # an un-cast oracle SUM must fail HERE, not at the driver
    elif got_types != exp_types:
        d = {c: (got_types[c], exp_types[c]) for c in got_types
             if got_types.get(c) != exp_types.get(c)}
        print(f"FAIL  {name}: column types spark!=oracle: {d}")
        fails += 1
    elif got != exp:
        diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
        print(f"FAIL  {name}: {len(got)} vs {len(exp)} rows; first diffs: {diff}")
        fails += 1
    else:
        print(f"OK    {name} ({len(got)} rows)")
sys.exit(1 if fails else 0)
