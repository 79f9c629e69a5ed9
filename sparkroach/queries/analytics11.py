"""Analytics breadth, round-4 continuation: physical-layout operators
(bucketed co-located join, partition-pruned layout, ORC source format),
mergeable-state operators (KMV set-similarity sketch, incremental rollup
maintenance), and two keep/drop-decision shapes (per-cluster canonical
selection, per-user burst windows).

Reference parity note: the reference's physical layout (CockroachDB
B-tree PKs + secondary indexes, setup_cockroachdb.sql:7-122) is the
row-store answer to exactly the questions these operators answer for a
columnar deployment: `bucketed_orders_join` is the Spark analog of the
reference's PK-co-located `txn ⋈ txn_participation` access path, and
`events_partitioned_read` is the analog of its `block_header_time` index
(setup_cockroachdb.sql:15) — prune by physical organization instead of
scanning.  The sketch/maintenance/decision operators extend the
beyond-reference LLM-pipeline plane.

All gated=False on registration (this round's 50 driver slots are
allocated to first-time recordings of the streaming/sketch/graph
families); every oracle here is swept by the local gate and these are r5
rotation candidates.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkroach.queries.registry import register
from sparkroach.tables import load

_HEX = "0123456789abcdef"
# 32-bit int from an md5 hex prefix, DuckDB side (no hex→int conv()):
# sum over the first 8 hex digits of digit_value * 16^(7-k).
def _th32_sql(expr: str) -> str:
    inner = " + ".join(
        f"(instr('{_HEX}', substring(md5({expr}), {k + 1}, 1)) - 1)"
        f" * {16 ** (7 - k)}"
        for k in range(8)
    )
    return f"({inner})"


def _th32_col(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# events_trailing_hour_peak — bounded RANGE frame over event time
# ---------------------------------------------------------------------------

TRAIL_US = 3600 * 1_000_000  # trailing hour, inclusive


@register(
    "events_trailing_hour_peak",
    gated=False,  # r6 rotation candidate (window frozen this round)
    oracle=f"""
        WITH m AS (
            SELECT user_id, event_id,
                   COUNT(*) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts)
                       RANGE BETWEEN {TRAIL_US} PRECEDING AND CURRENT ROW
                   ) AS trail_n,
                   SUM(CAST(value AS DECIMAL(28,10))) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts)
                       RANGE BETWEEN {TRAIL_US} PRECEDING AND CURRENT ROW
                   ) AS trail_v
            FROM events
        ),
        r AS (
            SELECT user_id, event_id,
                   CAST(trail_n AS BIGINT) AS trail_n,
                   CAST(trail_v AS DOUBLE) AS trail_value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY trail_n DESC, event_id
                   ) AS rn
            FROM m
        )
        SELECT user_id, event_id AS peak_event, trail_n, trail_value
        FROM r WHERE rn = 1
        ORDER BY user_id
    """,
    survey_ref="analytics breadth: bounded RANGE window frame — a VALUE "
    "offset over event time (all rows within the trailing hour), the "
    "frame kind ROWS frames (events_peak_window) and cumulative RANGE "
    "(events_cumulative_value) cannot express: the frame width varies "
    "per row with data density, and ts ties are frame PEERS (included "
    "together) rather than ordered rows",
    description="per-user busiest trailing hour: for every event, the "
    "count and decimal-exact value sum of that user's events in "
    "[ts − 1 h, ts] via RANGE BETWEEN over unix microseconds, then "
    "argmax per user (row_number tiebroken by event_id).  One row per "
    "user.  At 100 TB: one shuffle on user_id, the range frame slides "
    "with two pointers per partition — no per-row rescans — and the "
    "argmax folds into a second window over the same exchange",
)
def events_trailing_hour_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").cast("decimal(28,10)").alias("dv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-TRAIL_US, 0)
    )
    m = ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("trail_n"),
        F.sum("dv").over(w).alias("trail_v"),
    )
    rw = Window.partitionBy("user_id").orderBy(
        F.col("trail_n").desc(), F.col("event_id")
    )
    return (
        m.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("peak_event"),
            F.col("trail_n").cast("long").alias("trail_n"),
            F.col("trail_v").cast("double").alias("trail_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# events_peak_window — per-user burst detection via ROWS-frame moving sum
# ---------------------------------------------------------------------------

PEAK_FRAME = 7  # moving frame: current event + 6 preceding


@register(
    "events_peak_window",
    oracle=f"""
        WITH m AS (
            SELECT user_id, event_id,
                   SUM(CAST(value AS DECIMAL(28,10))) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN {PEAK_FRAME - 1} PRECEDING AND CURRENT ROW
                   ) AS mov,
                   COUNT(*) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN {PEAK_FRAME - 1} PRECEDING AND CURRENT ROW
                   ) AS frame_n
            FROM events
        ),
        r AS (
            SELECT user_id, event_id,
                   CAST(mov AS DOUBLE) AS peak_sum, frame_n,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY mov DESC, event_id
                   ) AS rn
            FROM m
        )
        SELECT user_id, event_id AS peak_end_event,
               peak_sum, CAST(frame_n AS BIGINT) AS frame_n
        FROM r WHERE rn = 1
        ORDER BY user_id
    """,
    survey_ref="analytics breadth: ROWS-frame moving aggregate — the one "
    "window frame shape (physical row frame, not RANGE/cumulative) no "
    "other query exercised; burst = max moving sum per user",
    description=f"per-user peak {PEAK_FRAME}-event window: moving value "
    "sum over a ROWS BETWEEN frame ordered by (ts, event_id) — the frame "
    "sum is DECIMAL so it is order-insensitive within the frame and "
    "bit-identical across engines — then argmax per user (row_number "
    "tiebroken by event_id).  One row per user, so the driver-collected "
    "result stays bounded at any SF.  At 100 TB the window partitions by "
    "user_id: one shuffle, frames never cross partitions, and the argmax "
    "folds into the same window pass",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def events_peak_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(PEAK_FRAME - 1), 0)
    )
    m = ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(28,10)")).over(w).alias("mov"),
        F.count("*").over(w).alias("frame_n"),
    )
    rw = Window.partitionBy("user_id").orderBy(
        F.col("mov").desc(), F.col("event_id")
    )
    return (
        m.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("peak_end_event"),
            F.col("mov").cast("double").alias("peak_sum"),
            F.col("frame_n").cast("long").alias("frame_n"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# kmv_type_jaccard — K-minimum-values sketch: set similarity of event types
# ---------------------------------------------------------------------------

KMV_K = 64


@register(
    "kmv_type_jaccard",
    oracle=f"""
        WITH base AS (
            SELECT DISTINCT event_type,
                   user_id * 100 + EXTRACT(day FROM ts) AS elem
            FROM events
        ),
        hashed AS (
            SELECT DISTINCT event_type,
                   {_th32_sql("CAST(elem AS VARCHAR)")} AS h
            FROM base
        ),
        sk AS (
            SELECT event_type, h FROM (
                SELECT event_type, h,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY h
                       ) AS rn
                FROM hashed
            ) WHERE rn <= {KMV_K}
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM (SELECT DISTINCT event_type FROM sk) a
            JOIN (SELECT DISTINCT event_type FROM sk) b
              ON a.event_type < b.event_type
        ),
        expanded AS (
            SELECT p.type_a, p.type_b, s.h,
                   MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
                       AS in_a,
                   MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
                       AS in_b
            FROM pairs p
            JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
            GROUP BY p.type_a, p.type_b, s.h
        ),
        unioned AS (
            SELECT type_a, type_b, h, in_a, in_b,
                   row_number() OVER (
                       PARTITION BY type_a, type_b ORDER BY h
                   ) AS rn
            FROM expanded
        )
        SELECT type_a, type_b,
               CAST({KMV_K} AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS kmv_union,
               CAST(SUM(in_a * in_b) AS BIGINT) AS kmv_inter
        FROM unioned WHERE rn <= {KMV_K}
        GROUP BY type_a, type_b
        ORDER BY type_a, type_b
    """,
    survey_ref="LLM ops / sketches: KMV (k-minimum-values) distinct sketch "
    "with SET operations — the mergeable sketch family member that "
    "supports intersection/Jaccard, which HLL cannot",
    description="KMV set-similarity sketch (Beyer et al. SIGMOD'07 "
    "shape): element = active (user, day) pair per event type, hashed to "
    "a 32-bit integer (md5 prefix, bit-identical across engines); each "
    f"type keeps its k={KMV_K} smallest distinct hash values.  For every "
    "type pair, the union sketch is the k smallest of the two sketches' "
    "union, and kmv_inter counts union-sketch members present in BOTH — "
    "kmv_inter/k is the standard Jaccard estimator, reported as exact "
    "integers so the gate hash is deterministic.  Mergeability is the "
    "100 TB story: per-partition k-smallest lists merge by "
    "sort-and-truncate (same property the HLL/CMS/histogram sketches "
    f"pin), and the pair stage touches only 5×{KMV_K} sketch rows, never "
    "the corpus",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def kmv_type_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.col("user_id") * 100 + F.dayofmonth("ts")).alias("elem"),
    ).distinct()
    hashed = base.select(
        "event_type", _th32_col(F.col("elem").cast("string")).alias("h")
    ).distinct()
    rw = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    expanded = (
        F.broadcast(pairs)
        .join(
            sk,
            (sk["event_type"] == F.col("type_a"))
            | (sk["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    uw = Window.partitionBy("type_a", "type_b").orderBy("h")
    return (
        expanded.withColumn("rn", F.row_number().over(uw))
        .where(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.lit(KMV_K).cast("long").alias("k"),
            F.count("*").cast("long").alias("kmv_union"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("kmv_inter"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# dedup_keep_best — quality-ranked canonical selection per duplicate cluster
# ---------------------------------------------------------------------------


def _keep_best_oracle() -> str:
    from sparkroach.queries.llm_ops import (  # shared capped LSH pipeline
        _JACC_SQL,
        _JACCARD_TAU,
        _lsh_candidates_cte,
    )

    lsh = _lsh_candidates_cte().strip()
    assert lsh.startswith("WITH ")
    return f"""
        WITH RECURSIVE {lsh[len("WITH "):]},
        edges AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN shing sa ON sa.doc_id = c.doc_a
            JOIN shing sb ON sb.doc_id = c.doc_b
            WHERE {_JACC_SQL} >= {_JACCARD_TAU}
        ),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM edges
        ),
        reach(node, r) AS (
            SELECT DISTINCT src, src FROM sym
            UNION
            SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.node
        ),
        comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        -- NB not named "ranked": the shared LSH CTE already defines one
        best AS (
            SELECT comp.cluster_id, comp.node AS doc_id, d.n_chars,
                   row_number() OVER (
                       PARTITION BY comp.cluster_id
                       ORDER BY d.n_chars DESC, comp.node
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY comp.cluster_id) AS sz
            FROM comp JOIN documents d ON d.doc_id = comp.node
        )
        SELECT cluster_id, doc_id AS keep_doc_id,
               CAST(n_chars AS BIGINT) AS keep_n_chars,
               CAST(sz - 1 AS BIGINT) AS n_dropped
        FROM best WHERE rn = 1
        ORDER BY cluster_id
    """


@register(
    "dedup_keep_best",
    oracle=_keep_best_oracle(),
    survey_ref="LLM ops: dedup keep/drop DECISION — quality-ranked "
    "canonical selection per near-dup cluster (the step after "
    "dedup_cc_clusters that picks WHICH duplicate survives)",
    description="per duplicate cluster, keep the highest-quality member "
    "(max n_chars, doc_id tiebreak) and count the dropped ones — the "
    "policy real pipelines apply (keep the longest / highest-scoring "
    "copy), vs dedup_cc_clusters' structural min-id canonical.  Built on "
    "the shared capped LSH→Jaccard→CC pipeline, then one broadcast-ready "
    "join to documents and a per-cluster argmax window.  At 100 TB the "
    "cluster table is orders of magnitude smaller than the corpus, so "
    "the join partitions by doc_id and the window by cluster_id — both "
    "bounded by cluster count, not corpus size",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.llm_ops import (
        _JACCARD_TAU,
        _verified_pairs,
        connected_components,
    )

    d = load(spark, sf_dir, "documents")
    edges = (
        _verified_pairs(d)
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    joined = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    sz = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("sz", F.count("*").over(sz))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").cast("long").alias("keep_n_chars"),
            (F.col("sz") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# events_incremental_rollup — materialized-view maintenance by partial merge
# ---------------------------------------------------------------------------

ROLLUP_SHARDS = 4


@register(
    "events_incremental_rollup",
    oracle="""
        SELECT event_type,
               CAST(EXTRACT(day FROM ts) AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY event_type, EXTRACT(day FROM ts)
        ORDER BY event_type, day
    """,
    survey_ref="analytics breadth: incremental materialized-view "
    "maintenance — per-shard partial aggregates merged into the final "
    "rollup, result identical to a full recompute",
    description=f"the MV-maintenance contract, executed: the event feed "
    f"is split into {ROLLUP_SHARDS} arrival shards (event_id mod — "
    "standing in for 'yesterday's rollup' + 'today's delta'), each shard "
    "is aggregated INDEPENDENTLY to partial state (count, DECIMAL sum "
    "per type×day), and the partials are merged by re-aggregation — "
    "never touching the raw rows again.  The oracle is the full "
    "recompute, so the gate hash IS the proof that merge(partials) == "
    "recompute — the algebraic property that lets a 100 TB deployment "
    "maintain rollups at delta cost (the same mergeability the "
    "HLL/CMS/KMV sketches pin for the non-algebraic aggregates)",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.dayofmonth("ts").cast("long").alias("day"),
        F.col("value").cast("decimal(28,10)").alias("v"),
    )
    # partial state per arrival shard, each computed independently
    partials = [
        ev.where(F.pmod("event_id", F.lit(ROLLUP_SHARDS)) == i)
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("pn"),
            F.sum("v").alias("psum"),
        )
        for i in range(ROLLUP_SHARDS)
    ]
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    return (
        merged.groupBy("event_type", "day")
        .agg(
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("psum").cast("double").alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# documents_orc_roundtrip — ORC as a real source format
# ---------------------------------------------------------------------------

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "documents_orc_roundtrip",
    oracle=f"""
        WITH md AS (SELECT doc_id, n_chars, lang,
                           {_th32_sql("text")} AS th
                    FROM documents),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(SUM(th) AS BIGINT) AS text_hash_sum
            FROM md
        )
        SELECT 'orc' AS format, * FROM s
        UNION ALL
        SELECT 'parquet' AS format, * FROM s
        ORDER BY format
    """,
    survey_ref="source formats: ORC read/write path (Spark-native "
    "columnar alternative) + an engine-written parquet round-trip, "
    "content-checksummed against the original",
    description="columnar format round-trip: documents → ORC and → "
    "engine-written parquet → read back with the explicit schema → "
    "per-format checksums (row count, id/char sums, distinct langs, "
    "md5-prefix sum over text) hash-matched against the oracle's "
    "checksums over the original files.  Completes the source-format "
    "matrix (parquet native, CSV/JSON in documents_format_roundtrip, "
    "ORC here) — at 100 TB, format choice is a real migration decision "
    "and this gate is the cheap proof a format path is byte-faithful",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def documents_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="sparkroach_orc_")

    def checksums(df: DataFrame, fmt: str) -> DataFrame:
        th = _th32_col(F.col("text"))
        return df.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_chars").cast("long").alias("sum_n_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(th).cast("long").alias("text_hash_sum"),
        ).select(F.lit(fmt).alias("format"), "*")

    try:
        orc_path = os.path.join(root, "docs_orc")
        d.write.orc(orc_path)
        pq_path = os.path.join(root, "docs_pq")
        d.write.parquet(pq_path)
        from_orc = spark.read.schema(_DOC_SCHEMA).orc(orc_path)
        from_pq = spark.read.schema(_DOC_SCHEMA).parquet(pq_path)
        out = (
            checksums(from_orc, "orc")
            .unionByName(checksums(from_pq, "parquet"))
            .orderBy("format")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# events_partitioned_read — hive-partitioned layout + partition pruning
# ---------------------------------------------------------------------------

PRUNE_DAYS = ("2024-01-03", "2024-01-04")


@register(
    "events_partitioned_read",
    oracle=f"""
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   AS total_value
        FROM events
        -- NOT `IN (DATE ..., DATE ...)`: DuckDB resolves the IN-list
        -- comparison through a type that matches zero rows here, while
        -- the plain equality form behaves; OR of equalities is safe.
        WHERE CAST(ts AS DATE) = DATE '{PRUNE_DAYS[0]}'
           OR CAST(ts AS DATE) = DATE '{PRUNE_DAYS[1]}'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    survey_ref="physical layout: hive-partitioned write + partition-"
    "pruned read — the columnar analog of the reference's "
    "block_header_time index (setup_cockroachdb.sql:15): answer a "
    "time-window query by touching only the matching physical unit",
    description="writes events hive-partitioned by event_date into a "
    "scratch dir, then reads it back with a two-day IN filter: Catalyst "
    "resolves the predicate against the directory structure "
    "(PartitionFilters, plan-pinned in tests) so non-matching days are "
    "never opened — at 100 TB this is THE difference between a 2-day "
    "query costing 2 days of I/O vs 30.  The aggregate result is "
    "hash-matched against the oracle filtering the raw table, proving "
    "the partitioned layout is content-faithful (no rows lost/dup'd at "
    "partition boundaries, date derivation consistent)",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def events_partitioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="sparkroach_part_")
    try:
        (
            ev.withColumn("event_date", F.col("ts").cast("date"))
            .write.partitionBy("event_date")
            .parquet(os.path.join(root, "events_by_day"))
        )
        back = spark.read.parquet(os.path.join(root, "events_by_day"))
        out = (
            back.where(
                (F.col("event_date") == F.lit(PRUNE_DAYS[0]).cast("date"))
                | (F.col("event_date") == F.lit(PRUNE_DAYS[1]).cast("date"))
            )
            .groupBy(
                # string-typed on BOTH sides: a DATE-typed result column
                # is untested territory for the driver's value hasher
                F.col("event_date").cast("string").alias("event_date"),
                "event_type",
            )
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum(F.col("value").cast("decimal(28,10)"))
                .cast("double")
                .alias("total_value"),
            )
            .orderBy("event_date", "event_type")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# bucketed_orders_join — co-located (shuffle-free) fact-fact join
# ---------------------------------------------------------------------------

N_BUCKETS = 8


@register(
    "bucketed_orders_join",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(28,4))))
                    AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    survey_ref="physical layout: bucketed tables + co-located join — the "
    "columnar analog of the reference's PK-co-located txn ⋈ "
    "txn_participation access path (both sides physically organized by "
    "the join key, so the join needs no data movement)",
    description=f"writes orders and lineitem as {N_BUCKETS}-bucket "
    "tables bucketed+sorted by order key (bucketBy/sortBy/saveAsTable — "
    "external, scratch-dir-backed, dropped after), then joins them: "
    "because both sides hash-partition identically on disk, Catalyst "
    "plans the sort-merge join with NO Exchange on either side "
    "(plan-pinned in tests with broadcast disabled) — at 100 TB this is "
    "the recurring-join strategy: pay the shuffle once at write time, "
    "join for free forever after.  Result hash-matched against the "
    "plain-join oracle, proving bucket routing loses/duplicates nothing",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def bucketed_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    uid = uuid.uuid4().hex[:12]
    t_orders = f"sr_orders_b_{uid}"
    t_line = f"sr_lineitem_b_{uid}"
    root = tempfile.mkdtemp(prefix="sparkroach_bucket_")
    try:
        (
            orders.write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(root, "orders_b"))
            .saveAsTable(t_orders)
        )
        (
            lineitem.write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(root, "lineitem_b"))
            .saveAsTable(t_line)
        )
        o = spark.table(t_orders)
        l = spark.table(t_line)
        out = (
            o.join(l, l["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("long").alias("n_items"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(28,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(28,4)"))
                )
                .cast("double")
                .alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        return out.localCheckpoint()
    finally:
        for t in (t_orders, t_line):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# events_dynamic_partition_overwrite — correction batches rewrite ONE day
# ---------------------------------------------------------------------------


@register(
    "events_dynamic_partition_overwrite",
    gated=False,  # r6 rotation candidate (window frozen this round)
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day, event_id FROM events
        ),
        busy AS (
            SELECT day FROM d GROUP BY day
            ORDER BY COUNT(*) DESC, day LIMIT 1
        ),
        final AS (
            SELECT * FROM d WHERE day <> (SELECT day FROM busy)
            UNION ALL
            SELECT * FROM d
            WHERE day = (SELECT day FROM busy) AND event_id % 2 = 0
        )
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(event_id) AS BIGINT) AS sum_event_id
        FROM final
        GROUP BY day
        ORDER BY day
    """,
    survey_ref="§2C physical layout — DYNAMIC partition overwrite: a "
    "correction batch rewrites exactly the partitions it contains and "
    "no others (partitionOverwriteMode=dynamic); under the default "
    "STATIC mode the same write would wipe every other day, so the "
    "per-day checksums pin the semantics, not just the write path",
    description="events land hive-partitioned by day; the busiest day "
    "(found from the data) is then corrected — its batch keeps only "
    "even event_ids — via mode('overwrite') under dynamic partition "
    "overwrite.  Every other day must survive untouched: the gate "
    "output is per-day row counts + event_id sums over the final "
    "table, equal to 'all days except D, plus D filtered' computed "
    "relationally.  At 100 TB this is the nightly backfill primitive: "
    "rewrite cost scales with the corrected days, not the table, and "
    "readers never see a half-written day (per-partition atomic "
    "directory swap)",
)
def events_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    busy = (
        ev.groupBy("day")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("day"))
        .limit(1)
        .collect()[0]
        .day
    )
    root = tempfile.mkdtemp(prefix="sparkroach_dynpart_")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        path = os.path.join(root, "events_by_day")
        base = ev.select("day", "event_id")
        base.write.partitionBy("day").parquet(path)

        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        correction = base.where(
            (F.col("day") == F.lit(busy)) & (F.col("event_id") % 2 == 0)
        )
        correction.write.mode("overwrite").partitionBy("day").parquet(path)

        out = (
            spark.read.parquet(path)
            .groupBy(F.col("day").cast("string").alias("day"))
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum("event_id").cast("long").alias("sum_event_id"),
            )
            .orderBy("day")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
