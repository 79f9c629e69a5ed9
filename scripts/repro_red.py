"""Reproduce the two r8 red oracle rows with EXACT cell comparison (no
Decimal->float normalization, which the local mirror uses and which can
mask last-digit decimal drift that the driver's hash catches)."""
from __future__ import annotations

import sys

from sparkroach import oracle
from sparkroach.queries import QUERIES
from sparkroach.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = (sys.argv[2].split(",") if len(sys.argv) > 2
         else ["orders_benford_audit", "search_ndcg_report"])

spark = get_spark("repro-red")
con = oracle._duck_connection(SF)

for name in NAMES:
    q = QUERIES[name]
    df = q.fn(spark, SF)
    srows = df.collect()
    scols = df.columns
    rel = con.sql(q.oracle)
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    print(f"=== {name} @ {SF}")
    print("spark dtypes:", df.dtypes)
    print("oracle types:", list(zip(ocols, otypes)))
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    s = sorted([tuple(r[i] for i in order_s) for r in srows], key=repr)
    o = sorted([tuple(r[i] for i in order_o) for r in orows], key=repr)
    ncol = [scols[i] for i in order_s]
    for i, (a, b) in enumerate(zip(s, o)):
        for j, (x, y) in enumerate(zip(a, b)):
            if repr(x) != repr(y):
                print(f"  row {i} col {ncol[j]}: spark={x!r} oracle={y!r}")
    if len(s) != len(o):
        print(f"  ROWCOUNT spark={len(s)} oracle={len(o)}")
    print("  exact-equal:", [tuple(map(repr, r)) for r in s] == [tuple(map(repr, r)) for r in o])
