#!/usr/bin/env python3
"""Typed-schema lint for the oracle gate: compares the ARROW type of every
column in each Verify output against what DuckDB exports for the matching
oracle SQL. tools/check.py folds types before hashing (Decimal->float,
int widths), but the driver's gate compare is type-sensitive -- round 2's
q_shard_pack failed on exactly this (un-CAST windowed sum -> HUGEINT ->
decimal128 vs int64 with identical values). Run after `graft.Verify`:

    python3 tools/typecheck.py sf0.01
"""
import duckdb, json, os, sys
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
OUT = f"/tmp/verify_{SF}"
TD = f"/root/testdata/{SF}"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

sql = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{TD}/{t}.parquet')")

bad = 0
for q in sorted(sql):
    path = f"{OUT}/{q}"
    if not os.path.isdir(path):
        print(f"MISSING {q}"); bad += 1; continue
    spark = {f.name: str(f.type) for f in pq.read_table(path).schema}
    oracle = {f.name: str(f.type)
              for f in con.execute(sql[q]).fetch_arrow_table().schema}
    diff = {k: (spark.get(k), oracle.get(k))
            for k in set(spark) | set(oracle) if spark.get(k) != oracle.get(k)}
    if diff:
        print(f"TYPE-DIFF {q}: {diff}"); bad += 1
print(f"typecheck: {len(sql)} queries, {bad} diffs")
sys.exit(1 if bad else 0)
