"""Benchmark runner: times the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed twice: a warm-up is NOT used (the driver grades cold
numbers); we time a single materializing run per query (collect of the
already-small result sets — every headline query reduces to ≤ a few
thousand rows, so collect cost is plan cost, not transfer cost).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from sparkroach.queries import QUERIES
    from sparkroach.session import get_spark

    spark = get_spark("sparkroach-bench")
    # Touch the session once so JVM/session startup isn't billed to q1.
    spark.range(1).collect()

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}
    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
