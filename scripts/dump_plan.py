"""Dump .explain("formatted") for named queries to plans/<dir>/<name>_<tag>.txt.

Usage: python scripts/dump_plan.py <tag> <name1,name2,...> [outdir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from sparkroach.queries import QUERIES
from sparkroach.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
tag = sys.argv[1]
names = sys.argv[2].split(",")
outdir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r09"
os.makedirs(outdir, exist_ok=True)

spark = get_spark("plan-dump")
for name in names:
    df = QUERIES[name].fn(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    p = os.path.join(outdir, f"{name}_{tag}.txt")
    with open(p, "w") as f:
        f.write(plan)
    n_ex = plan.count("Exchange")
    n_scan = plan.count("Scan parquet")
    print(f"{name}: {len(plan.splitlines())} lines, ~{n_ex} Exchange refs, {n_scan} parquet scans -> {p}")
