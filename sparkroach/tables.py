"""Testdata table access.

The driver's deterministic TPC-H-ish tables (see TESTDATA.md) live as one
parquet file per table under ``/root/testdata/sf{0.001,0.01,0.1}``.  We read
them with schema-on-file (parquet carries exact types) and never infer.

At 100 TB these would be directories partitioned by the natural pruning key
(orders by month of o_orderdate, lineitem by l_shipdate bucket, events by
date of ts); ``load`` is the single seam where that layout swap happens —
query code only ever sees the logical table name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime SQL confs every query depends on, applied defensively because the
# caller (e.g. the driver harness) may hand us a vanilla SparkSession:
# - nanosAsLong: events.parquet stores ts as TIMESTAMP(NANOS), which Spark
#   otherwise refuses to read (load() converts the long back to a timestamp);
# - UTC session tz: parquet timestamps are naive-UTC and the DuckDB oracle
#   reads them naively — any other session tz would shift collected values.
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. ``name`` must be in TABLES."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # parquet TIMESTAMP(NANOS) arrives as long (nanosAsLong); truncate
        # to micros exactly like DuckDB's ns→us conversion so oracles agree.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can see them."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
