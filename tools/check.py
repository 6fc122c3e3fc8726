#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare values column-by-column (columns sorted by name).
Dev tool only — not part of the shipped library."""
import json, math, sys, subprocess
import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
OUT = f"/tmp/verify_{SF}"
TD = f"/root/testdata/{SF}"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return float(round(v, 9))
    if hasattr(v, "isoformat"): return v.isoformat()
    import decimal
    if isinstance(v, decimal.Decimal): return float(v)
    return v

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{TD}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
import os
declared = sorted(d for d in os.listdir(OUT) if not d.endswith(".json"))
fails, passes, rowsonly = [], [], []
for name in declared:
    spark_tbl = pq.read_table(f"{OUT}/{name}")
    if name not in oracle:
        rowsonly.append((name, spark_tbl.num_rows))
        continue
    try:
        duck = con.sql(oracle[name]).arrow()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {str(e)[:200]}"))
        continue
    scols, dcols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if scols != dcols:
        fails.append((name, f"schema names differ: spark={scols} duck={dcols}"))
        continue
    if spark_tbl.num_rows != duck.num_rows:
        fails.append((name, f"row count: spark={spark_tbl.num_rows} duck={duck.num_rows}"))
        continue
    ok = True
    for c in scols:
        sv = [norm(x) for x in spark_tbl.column(c).to_pylist()]
        dv = [norm(x) for x in duck.column(c).to_pylist()]
        if sv != dv:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            fails.append((name, f"col {c} differs, first diffs {diffs}"))
            ok = False
            break
    if ok: passes.append((name, spark_tbl.num_rows))

print(f"== PASS ({len(passes)}):")
for n, r in passes: print(f"   {n} ({r} rows)")
print(f"== ROWS-ONLY ({len(rowsonly)}):")
for n, r in rowsonly: print(f"   {n} ({r} rows)")
print(f"== FAIL ({len(fails)}):")
for n, m in fails: print(f"   {n}: {m}")
sys.exit(1 if fails else 0)
