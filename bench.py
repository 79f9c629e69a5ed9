"""Benchmark runner: times the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol: (1) one-time storage layout preparation (untimed, like any
OPTIMIZE job); (2) JIT warmup at sf0.001; (3) each query timed 3×, median
reported — steady-state plan cost, excluding one-time codegen compilation.
Each run is a materializing collect (result sets are ≤ a few thousand
rows, so collect cost is plan cost, not transfer cost).

Cross-round comparability (VERDICT r5 item 4): a fixed, engine-independent
SENTINEL workload (spark.range reduction — same plan, same row count,
every round, no data dependency) is timed before and after the query
phase.  Co-tenant machine load inflates the sentinel and the queries
alike, so `value_normalized` (= value / mean sentinel) is the
round-over-round comparable number; a uniform raw drift with a flat
normalized value is machine noise, not a regression.
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

    # storage-side preparation (one-time layout cache; untimed, like any
    # table-maintenance OPTIMIZE job) + JIT warmup at a tiny SF
    from sparkroach.tables import prepare_layout

    prepare_layout(spark, sf_dir)

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for q in bench_queries.values():
            q.fn(spark, warm_dir).collect()  # JIT warmup only — untimed

    def sentinel_sec() -> float:
        """Median-of-3 fixed workload: 8B-row modular sum, one codegen
        stage, zero I/O — a pure measure of this machine's momentary
        JVM/CPU throughput, identical every round by construction."""
        from pyspark.sql import functions as F

        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(8_000_000_000).select(
                F.sum(F.col("id") % 7).alias("s")
            ).collect()
            runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 4)

    sentinel_sec()  # codegen warmup for the sentinel's own plan shape
    sentinel_before = sentinel_sec()

    # median of 3 runs: steady-state plan cost (the first run additionally
    # pays one-time whole-stage-codegen compilation for this plan shape)
    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 4)

    # streaming-ingest throughput: one 32-block micro-batch with full
    # 9-table maintenance (BASELINE target: > 0.35 blocks/s sustained)
    from sparkroach.queries.chain_demo import ingest_blocks

    # isolate the ingest measurement from the query phase: drop cached
    # query-side data and let the JVM settle, then warm the plan shapes
    spark.catalog.clearCache()
    import gc

    gc.collect()
    spark._jvm.System.gc()
    # same protocol as the queries: shape-identical warmup (32 blocks, so
    # codegen/AQE compile the measured plans), then median of 3 runs —
    # each run ingests into a fresh store
    ingest_blocks(spark, n_blocks=32)
    timings["chain_ingest_32_blocks"] = round(
        sorted(ingest_blocks(spark, n_blocks=32) for _ in range(3))[1], 4
    )

    sentinel_after = sentinel_sec()
    sentinel_mean = round((sentinel_before + sentinel_after) / 2, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "sentinel": {
            "workload": "range(8B) modular sum, median of 3",
            "before_sec": sentinel_before,
            "after_sec": sentinel_after,
            "mean_sec": sentinel_mean,
        },
        "value_normalized": round(total / sentinel_mean, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
