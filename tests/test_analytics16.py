"""Pins for the wave-8 analytics: the distributed prefix sum must equal
the single-partition window baseline (the thing it exists to avoid), and
the concurrency sweep's tie rule must count touching sessions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkroach.queries.analytics16 import running_global_sum
import pytest


@pytest.mark.soak  # property/twin grade (r9 tiering)
def test_running_global_sum_equals_single_window(spark):
    """1000 ±1 deltas over shuffled keys: offset+local running sum must
    equal the one-task global window row-for-row, across many range
    partitions (shuffle.partitions=8 in tests, so the offsets matter)."""
    rows = [(i * 7 % 1000, 1 if i % 3 else -1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, d long")
    got = running_global_sum(df, "k", "d").select("k", "running")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select("k", F.sum("d").over(w).cast("long").alias("running"))
    assert sorted((r.k, r.running) for r in got.collect()) == sorted(
        (r.k, r.running) for r in want.collect()
    )


def test_running_global_sum_uses_many_partitions(spark):
    """The point of the operator: no single-partition exchange. The
    range-partitioned side must actually spread across partitions."""
    df = spark.createDataFrame([(i, 1) for i in range(500)], "k long, d long")
    part = running_global_sum(df, "k", "d")
    n_parts = part.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts > 1


def test_touching_sessions_count_as_concurrent(spark):
    """delta ordering at equal t: a session starting exactly when another
    ends overlaps it for that instant (starts sort first via the 2t+bit
    key), so peak is 2, not 1."""
    # session A [10, 20], session B [20, 30] -> at t=20 both active
    b = spark.createDataFrame(
        [(10, 1), (20, -1), (20, 1), (30, -1)], "t long, delta long"
    ).withColumn("_k", F.col("t") * 2 + F.when(F.col("delta") == 1, 0).otherwise(1))
    r = running_global_sum(b, "_k", "delta")
    assert r.agg(F.max("running")).first()[0] == 2
