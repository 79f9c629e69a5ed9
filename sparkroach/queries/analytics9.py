"""Event-analytics breadth, round-4 continuation: built-in session
windows, pivot, and semi-structured (JSON) column extraction.

- ``events_session_window_builtin`` — Spark's native ``session_window``
  (dynamic gap-merged event-time windows), the built-in complement to the
  custom applyInPandasWithState sessionizer gated earlier.  The oracle
  mirrors the built-in's HALF-OPEN gap semantics (a gap of exactly the
  window duration starts a NEW session — `>=`, where the lag-based
  `events_user_sessions` oracle uses `>`), so the two sessionizations are
  deliberately distinct declared semantics, both value-checked.
- ``events_type_pivot``     — PIVOT: one row per user, one column per
  event type (explicit value list → deterministic schema; conditional
  aggregation under the hood, map-side combined).
- ``events_props_stats``    — semi-structured extraction: a JSON props
  column parsed per row (get_json_object / json_extract), aggregated with
  exact integer sums — the events-table analog of the chain plane's
  JSON-field filters.

Reference parity note: the reference's query surface has JSON field
predicates (txn JSON); these extend the same capability to the analytics
plane.  Registered gated=False (driver window full); r5 rotation
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

SESSION_GAP = "30 minutes"
_GAP_US = 1_800_000_000

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_session_window_builtin",
    oracle=f"""
        WITH us AS (
            SELECT user_id, event_id, ts,
                   epoch_us(ts::TIMESTAMP) AS t_us
            FROM events
        ),
        g AS (
            SELECT user_id, ts, t_us,
                   CASE WHEN t_us - lag(t_us) OVER (
                                PARTITION BY user_id ORDER BY t_us, event_id)
                             >= {_GAP_US}
                        OR lag(t_us) OVER (
                                PARTITION BY user_id ORDER BY t_us, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS ns
            FROM us
        ),
        s AS (
            SELECT user_id, ts, t_us,
                   SUM(ns) OVER (
                       PARTITION BY user_id ORDER BY t_us, ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM g
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    survey_ref="§2C streaming/windowing — BUILT-IN session_window (dynamic "
    "gap-merged event-time windows), complement of the custom "
    "applyInPandasWithState sessionizer",
    description="Spark's native session_window(ts, '30 minutes') grouped "
    "per user: windows within the gap merge, session_end = last event + "
    "gap (half-open semantics: a gap of exactly 30 min starts a NEW "
    "session — the oracle mirrors `>=`, where the custom sessionizer's "
    "declared semantics use `>`).  Works identically under readStream "
    "with a watermark; batch form gated here",
    gated=False,
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "events_type_pivot",
    oracle=f"""
        SELECT user_id,
               {", ".join(
                   f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
                   f" AS {t}" for t in EVENT_TYPES
               )},
               CAST(count(*) AS BIGINT) AS total
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    survey_ref="relational breadth: PIVOT — one column per category value "
    "(explicit value list, deterministic schema)",
    description="groupBy(user).pivot(event_type, [explicit values]) — "
    "the explicit list avoids the extra distinct-values job AND pins the "
    "output schema (a driver-side distinct scan at 100 TB is a full "
    "column pass; category dictionaries are known in production).  "
    "Compiles to conditional aggregation with map-side combine — one "
    "shuffle, same cost as a plain groupBy",
    gated=False,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pv = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )
    total = None
    for t in EVENT_TYPES:
        pv = pv.withColumn(t, F.col(t).cast("long"))
        total = F.col(t) if total is None else total + F.col(t)
    return pv.withColumn("total", total.cast("long")).orderBy("user_id")


@register(
    "events_props_stats",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS k_sum,
               CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS k_min,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS k_max,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS k_avg
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    survey_ref="semi-structured columns: JSON field extraction + "
    "aggregation over an event-properties column (the analytics-plane "
    "analog of the chain plane's txn-JSON predicates)",
    description="get_json_object per row (JVM-side JSON path, no Python), "
    "aggregated with exact integer sums and ONE final division.  At "
    "100 TB the extraction is map-side and the shuffle carries only the "
    "per-type partial aggregates; for hot paths the production move is "
    "materializing the extracted column at ingest (as the chain plane "
    "does for txn fields)",
    gated=False,
)
def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .select(
            "event_type",
            "n",
            "k_sum",
            "k_min",
            "k_max",
            (F.col("k_sum").cast("double") / F.col("n").cast("double")).alias(
                "k_avg"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_props_variant_hist",
    gated=False,  # r6 rotation candidate (window frozen this round)
    oracle="""
        WITH k AS (
            SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(k // 10 AS BIGINT) AS k_decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS k_sum
        FROM k
        GROUP BY event_type, k // 10
        ORDER BY event_type, k_decile
    """,
    survey_ref="semi-structured columns — the VARIANT type (Spark 4): "
    "props ingested ONCE via parse_json into the binary variant encoding, "
    "then typed field access via variant_get; the open-schema path that "
    "replaces per-query string re-parsing (get_json_object, "
    "events_props_stats) when the same JSON column feeds many extractions",
    description="decile histogram of the props.k field per event type, "
    "extracted through parse_json → variant_get('$.k', 'long') with "
    "integer division for the bucket — every aggregate an exact integer. "
    "At 100 TB VARIANT is the materialize-once answer: the cast to "
    "variant happens at ingest, downstream queries do typed path reads "
    "on the binary encoding without re-tokenizing JSON text, and "
    "shredding can push the hot fields to columnar storage",
)
def events_props_variant_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long").alias("k")
    return (
        ev.select("event_type", k)
        .select("event_type", "k", F.expr("k div 10").alias("k_decile"))
        .groupBy("event_type", "k_decile")
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
        .orderBy("event_type", "k_decile")
    )


# ---------------------------------------------------------------------------
# multi-grain aggregation (CUBE / GROUPING SETS) and UNPIVOT
# ---------------------------------------------------------------------------


@register(
    "docs_grouping_sets",
    oracle="""
        SELECT source, lang,
               CAST(GROUPING(source, lang) AS BIGINT) AS grouping_id,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY CUBE (source, lang)
        ORDER BY grouping_id, source, lang
    """,
    survey_ref="analytics breadth: multi-grain aggregation — CUBE / "
    "GROUPING SETS with grouping_id (the report-rollup SQL surface: all "
    "four grains of (source, lang) in one pass)",
    description="CUBE(source, lang) token/char totals with grouping_id "
    "disambiguating the grains (both engines put the leftmost column in "
    "the most significant bit).  Spark plans this as one Expand (4 "
    "replicas of each row, one per grain) + a single hash aggregate with "
    "map-side combine — one corpus pass for all grains.  At 100 TB the "
    "Expand factor is the cost dial: with G grouping sets the shuffle "
    "carries G× the distinct-group rows (not G× the corpus — partial "
    "aggregation collapses first), and a very wide cube should be split "
    "into unioned grouped aggs over a shared cached scan instead",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def docs_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = F.size(F.split("text", " "))
    return (
        d.select("source", "lang", tok.alias("_t"), "n_chars")
        .cube("source", "lang")
        .agg(
            F.grouping_id().alias("grouping_id"),
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            "source", "lang", "grouping_id", "n_docs", "n_tokens", "n_chars"
        )
        .orderBy("grouping_id", "source", "lang")
    )


UNPIVOT_VALUE_THR = 150  # "high-value" cut: every SF has (user, type)
# cells with zero qualifying events AND cells with many, so the melt's
# zero rows are non-vacuous at sf0.001, sf0.01 and sf0.1 alike


@register(
    "events_value_unpivot",
    oracle=f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        t(event_type) AS (
            VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')
        ),
        c AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events WHERE value > {UNPIVOT_VALUE_THR} GROUP BY 1, 2
        )
        SELECT u.user_id, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM u CROSS JOIN t
        LEFT JOIN c USING (user_id, event_type)
        ORDER BY user_id, event_type
    """,
    survey_ref="analytics breadth: UNPIVOT/melt — the wide→long inverse "
    "of events_type_pivot, producing an explicit zero row for every "
    "(user, type) with no qualifying event",
    description="pivot then unpivot: per-user HIGH-VALUE event counts "
    f"(value > {UNPIVOT_VALUE_THR}) into one column per event type (the "
    "events_type_pivot shape), melted back to (user_id, event_type, n) "
    "with DataFrame.unpivot.  The zero rows are the point — they exist "
    "only in the wide form, so the round trip is NOT the identity on the "
    "naive long aggregate (the oracle builds them with a dimension cross "
    "join).  Unpivot is a map-side Expand projection: no shuffle beyond "
    "the originating aggregation, row count multiplies by the (fixed, "
    "explicit) column list — never a data-dependent distinct scan",
    gated=False,  # r5 rotation candidate (driver window full this round)
)
def events_value_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        *[
            F.sum(
                F.when(
                    (F.col("event_type") == t)
                    & (F.col("value") > UNPIVOT_VALUE_THR),
                    1,
                ).otherwise(0)
            ).alias(t)
            for t in EVENT_TYPES
        ]
    )
    return (
        wide.unpivot("user_id", EVENT_TYPES, "event_type", "n")
        .orderBy("user_id", "event_type")
    )
