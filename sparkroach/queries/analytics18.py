"""Warehouse-plane breadth, round-4 continuation (wave 8d): SCD Type 2
dimension build, ANALYZE-style column profiling, and the training-shard
export primitive.

- ``events_scd2_intervals``: the classic slowly-changing-dimension
  Type 2 build from a change stream — collapse consecutive repeats of
  the tracked attribute (event_type per user), then close each version
  with the next change's timestamp (``lead``), leaving the current
  version open (NULL valid_to).  Two window passes over one user_id
  shuffle; (ts, event_id) is the total order that makes both engines
  deterministic.  This is the load pattern behind every
  effective-dated dimension table; the chain plane's account SCD-lite
  (transforms.py) tracks only the latest row — this operator is the
  full-history variant.

- ``orders_profile_report``: per-column profiling (ANALYZE TABLE /
  data-catalog ingestion shape): null count, exact distinct count, and
  typed min/max for every column of ``orders``, emitted as one row per
  column.  One aggregation pass computes every metric (the multi
  COUNT(DISTINCT) expands map-side); numeric extremes stay DOUBLE and
  date/string extremes travel as ISO strings — doubles-as-text is the
  cross-engine formatting trap the registry discipline forbids.

- ``documents_shard_export``: the training-data export primitive —
  deterministic hash-sharding (md5-prefix of doc_id mod N_SHARDS),
  physical ``partitionBy("shard")`` parquet write, then a manifest
  (docs, doc_id sum, token sum, text checksum per shard) computed FROM
  THE READ-BACK FILES.  The oracle computes the identical manifest
  straight from the raw table, so the gate pins that the partitioned
  write/read round-trip loses and reorders nothing.  At 100 TB this is
  how a corpus ships to trainers: shard count × maxRecordsPerFile
  bounds file sizes, the hash balances shards within binomial noise,
  and the manifest is the integrity contract consumers verify against.

All gated=False on registration: r5/r6 rotation candidates, swept by
the local oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.analytics11 import _th32_col, _th32_sql
from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# SCD Type 2 build from the event change stream
# ---------------------------------------------------------------------------


@register(
    "events_scd2_intervals",
    gated=False,
    oracle="""
        WITH e AS (SELECT user_id, event_type, event_id,
                          epoch_us(ts::TIMESTAMP) AS t_us FROM events),
        c AS (SELECT *, lag(event_type) OVER (
                  PARTITION BY user_id ORDER BY t_us, event_id) AS prev
              FROM e),
        ch AS (SELECT user_id, event_type, t_us, event_id FROM c
               WHERE prev IS NULL OR prev <> event_type),
        iv AS (SELECT user_id, event_type,
                      t_us AS valid_from_us,
                      lead(t_us) OVER (
                          PARTITION BY user_id ORDER BY t_us, event_id
                      ) AS valid_to_us
               FROM ch)
        SELECT user_id, event_type, valid_from_us, valid_to_us
        FROM iv ORDER BY user_id, valid_from_us
    """,
    survey_ref="§2C warehouse modeling — SCD Type 2 dimension build: "
    "collapse consecutive repeats, close versions with lead(), leave "
    "the current version open (full-history variant of the chain "
    "plane's SCD-lite account rows)",
    description="effective-dated (user, event_type) version intervals "
    "from the event stream: valid_from = first microsecond of a run of "
    "equal types, valid_to = next change (NULL while current). Two "
    "windows over one user_id shuffle; (ts, event_id) total-orders both "
    "engines",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    changes = ev.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return (
        changes.select(
            "user_id",
            "event_type",
            F.col("t_us").alias("valid_from_us"),
            F.lead("t_us").over(w).alias("valid_to_us"),
        )
        .orderBy("user_id", "valid_from_us")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style per-column profile
# ---------------------------------------------------------------------------

# (name, kind) — kind picks which extreme columns a row populates
_ORDER_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def _profile_oracle() -> str:
    rows = []
    for name, kind in _ORDER_COLS:
        if kind == "num":
            mins = f"CAST(MIN({name}) AS DOUBLE)", "CAST(NULL AS VARCHAR)"
            maxs = f"CAST(MAX({name}) AS DOUBLE)", "CAST(NULL AS VARCHAR)"
        elif kind == "date":
            mins = "CAST(NULL AS DOUBLE)", f"strftime(MIN({name}), '%Y-%m-%d')"
            maxs = "CAST(NULL AS DOUBLE)", f"strftime(MAX({name}), '%Y-%m-%d')"
        else:
            mins = "CAST(NULL AS DOUBLE)", f"MIN({name})"
            maxs = "CAST(NULL AS DOUBLE)", f"MAX({name})"
        rows.append(
            f"""SELECT '{name}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
                   {mins[0]} AS min_d, {maxs[0]} AS max_d,
                   {mins[1]} AS min_s, {maxs[1]} AS max_s
            FROM orders"""
        )
        pass
    return " UNION ALL ".join(rows) + " ORDER BY column_name"


@register(
    "orders_profile_report",
    gated=False,
    oracle=_profile_oracle(),
    survey_ref="§2C data profiling — ANALYZE TABLE shape: per-column "
    "nulls, exact distinct, typed min/max in one aggregation pass",
    description="column profile of orders (one row per column): numeric "
    "extremes stay DOUBLE, date/string extremes travel as ISO strings — "
    "never doubles-as-text, the cross-engine formatting trap",
)
def orders_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("_rows")]
    for name, kind in _ORDER_COLS:
        aggs.append(F.count(name).alias(f"{name}__nn"))
        aggs.append(F.countDistinct(name).alias(f"{name}__nd"))
        if kind == "num":
            aggs.append(F.min(name).cast("double").alias(f"{name}__mind"))
            aggs.append(F.max(name).cast("double").alias(f"{name}__maxd"))
        elif kind == "date":
            aggs.append(F.date_format(F.min(name), "yyyy-MM-dd").alias(f"{name}__mins"))
            aggs.append(F.date_format(F.max(name), "yyyy-MM-dd").alias(f"{name}__maxs"))
        else:
            aggs.append(F.min(name).alias(f"{name}__mins"))
            aggs.append(F.max(name).alias(f"{name}__maxs"))
    one = o.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    parts = []
    for name, kind in _ORDER_COLS:
        mind = F.col(f"{name}__mind") if kind == "num" else null_d
        maxd = F.col(f"{name}__maxd") if kind == "num" else null_d
        mins = null_s if kind == "num" else F.col(f"{name}__mins")
        maxs = null_s if kind == "num" else F.col(f"{name}__maxs")
        parts.append(
            F.struct(
                F.lit(name).alias("column_name"),
                F.col("_rows").cast("long").alias("n_rows"),
                (F.col("_rows") - F.col(f"{name}__nn")).cast("long").alias("n_nulls"),
                F.col(f"{name}__nd").cast("long").alias("n_distinct"),
                mind.alias("min_d"),
                maxd.alias("max_d"),
                mins.alias("min_s"),
                maxs.alias("max_s"),
            )
        )
    return (
        one.select(F.explode(F.array(*parts)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# training-shard export with manifest
# ---------------------------------------------------------------------------

N_SHARDS = 8


@register(
    "documents_shard_export",
    gated=False,
    oracle=f"""
        WITH s AS (SELECT doc_id, text,
                          {_th32_sql("CAST(doc_id AS VARCHAR)")} % {N_SHARDS}
                              AS shard
                   FROM documents)
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS token_sum,
               CAST(SUM({_th32_sql("text")}) AS BIGINT) AS text_hash_sum
        FROM s GROUP BY shard ORDER BY shard
    """,
    survey_ref="§2C storage — training-shard export: deterministic hash "
    "sharding, physical partitionBy write, manifest computed from the "
    "READ-BACK files and pinned against the raw-table oracle",
    description=f"hash-shard the corpus into {N_SHARDS} shards "
    "(md5-prefix of doc_id), write partitionBy('shard') parquet, read "
    "the files back and emit the per-shard manifest (docs, id sum, "
    "token sum, text checksum) — the integrity contract a trainer "
    "verifies before consuming; self-materializing gate",
)
def documents_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents")
    sharded = d.select(
        "doc_id",
        "text",
        F.pmod(_th32_col(F.col("doc_id").cast("string")), F.lit(N_SHARDS)).alias(
            "shard"
        ),
    )
    root = tempfile.mkdtemp(prefix="sparkroach_shards_")
    try:
        path = os.path.join(root, "corpus")
        sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
        back = spark.read.parquet(path)
        manifest = (
            back.groupBy("shard")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("doc_id_sum"),
                F.sum(F.size(F.split("text", " "))).cast("long").alias("token_sum"),
                F.sum(_th32_col(F.col("text"))).cast("long").alias("text_hash_sum"),
            )
            .select(
                F.col("shard").cast("long").alias("shard"),
                "n_docs",
                "doc_id_sum",
                "token_sum",
                "text_hash_sum",
            )
            .orderBy("shard")
        )
        rows = manifest.collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, manifest.schema)
