"""Driver simulation per .claude/skills/verify: VANILLA SparkSession
(no sparkroach configs), __spark_entry__ contract, DuckDB oracle,
exact stringified comparison. Usage:
    python scripts/driver_sim.py [sf_dir] [name1,name2,...]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = SparkSession.builder.master("local[8]").getOrCreate()

import __spark_entry__ as e
from sparkroach.tables import TABLES

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs = e.queries()
oracles = e.oracle_sql()
names = NAMES or list(qs)
bad = 0
for name in names:
    if name not in qs:
        print(f"SKIP {name}: not gated")
        continue
    try:
        df = qs[name](spark, SF)
        srows = df.collect()
        scols = df.columns
    except Exception as exc:
        print(f"FAIL {name}: spark EXCEPTION {exc}")
        bad += 1
        continue
    if name not in oracles:
        print(f"OK   {name}: rows-only ({len(srows)} rows)")
        continue
    rel = con.sql(oracles[name])
    ocols = list(rel.columns)
    orows = rel.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    s = sorted([tuple(str(r[i]) for i in so) for r in srows])
    o = sorted([tuple(str(r[i]) for i in oo) for r in orows])
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
        bad += 1
    elif s != o:
        detail = ""
        for i, (a, b) in enumerate(zip(s, o)):
            if a != b:
                detail = f" first diff row {i}: spark={a} oracle={b}"
                break
        if not detail and len(s) != len(o):
            detail = f" rowcount {len(s)} vs {len(o)}"
        print(f"FAIL {name}: value mismatch{detail}")
        bad += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")
print("ALL GREEN" if bad == 0 else f"{bad} FAILURES")
sys.exit(1 if bad else 0)
