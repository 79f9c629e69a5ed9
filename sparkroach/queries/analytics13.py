"""Analytics breadth, round-4 continuation (wave 3): data-quality
expectations, time-series gap filling, and event-sequence transitions.

- ``documents_quality_expectations`` — the Deequ/expectations-style data
  quality report: one row per declared constraint (completeness,
  uniqueness, consistency, domain, range) with exact violation counts.
  At 100 TB this is the report every ingest partition runs BEFORE its
  data is admitted to the corpus; all checks fold into one scan.
- ``events_gap_fill`` — dense minute-grid gap filling per event type
  (sequence + explode + left join), reported as per-type aggregates so
  the output stays bounded while the zero-slot/nonzero-slot mix is
  visible (and asserted non-vacuous at every SF in tests).
- ``events_type_transitions`` — per-user event-type Markov transition
  counts (lag window + grouped count + exact-integer conditional
  probability), the funnel/behavior-model fit step.

All gated=False on registration: this round's 50 driver slots are frozen
on the third rotation wave; r5 rotation candidates, swept by the local
oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# documents_quality_expectations
# ---------------------------------------------------------------------------

MAX_CHARS_EXPECT = 500  # deliberately tight: the violation path must light up


@register(
    "documents_quality_expectations",
    oracle=f"""
        WITH m AS (
            SELECT COUNT(*) AS n,
                   SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS v_id,
                   SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                       AS v_text,
                   COUNT(*) - COUNT(DISTINCT doc_id) AS v_uniq,
                   SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                       AS v_cons,
                   SUM(CASE WHEN NOT lang SIMILAR TO '[a-z][a-z]'
                            THEN 1 ELSE 0 END) AS v_lang,
                   SUM(CASE WHEN n_chars > {MAX_CHARS_EXPECT}
                            THEN 1 ELSE 0 END) AS v_len
            FROM documents
        )
        SELECT c.check_name, CAST(m.n AS BIGINT) AS n_rows,
               CAST(c.v AS BIGINT) AS n_violations,
               (c.v = 0) AS passed
        FROM m, LATERAL (VALUES
            ('doc_id_not_null', m.v_id),
            ('text_not_empty', m.v_text),
            ('doc_id_unique', m.v_uniq),
            ('n_chars_matches_text', m.v_cons),
            ('lang_is_iso2', m.v_lang),
            ('n_chars_le_{MAX_CHARS_EXPECT}', m.v_len)
        ) AS c(check_name, v)
        ORDER BY check_name
    """,
    survey_ref="LLM ops / data quality: expectations report — declared "
    "constraints (completeness, uniqueness, consistency, domain, range) "
    "with exact violation counts, all folded into one corpus scan",
    description="the admission gate a training-data pipeline runs per "
    "ingest partition: six constraints evaluated as conditional sums in "
    "ONE aggregate over one scan (never one pass per check), unpivoted "
    "to a row per check.  The n_chars≤"
    f"{MAX_CHARS_EXPECT} range check is deliberately tighter than the "
    "data so the violation-counting path is exercised, not just the "
    "all-green path.  Uniqueness is the one non-algebraic check "
    "(count distinct); at 100 TB it degrades gracefully to the HLL "
    "sketch with the same report schema",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def documents_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    m = d.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0)).alias("v_id"),
        F.sum(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
        ).alias("v_text"),
        (F.count("*") - F.countDistinct("doc_id")).alias("v_uniq"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("v_cons"),
        F.sum(
            F.when(~F.col("lang").rlike("^[a-z][a-z]$"), 1).otherwise(0)
        ).alias("v_lang"),
        F.sum(
            F.when(F.col("n_chars") > MAX_CHARS_EXPECT, 1).otherwise(0)
        ).alias("v_len"),
    )
    checks = [
        ("doc_id_not_null", "v_id"),
        ("text_not_empty", "v_text"),
        ("doc_id_unique", "v_uniq"),
        ("n_chars_matches_text", "v_cons"),
        ("lang_is_iso2", "v_lang"),
        (f"n_chars_le_{MAX_CHARS_EXPECT}", "v_len"),
    ]
    stacked = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col("n").cast("long").alias("n_rows"),
                        F.col(v).cast("long").alias("n_violations"),
                    )
                    for name, v in checks
                ]
            )
        ).alias("c")
    ).select("c.*", (F.col("c.n_violations") == 0).alias("passed"))
    return stacked.orderBy("check_name")


# ---------------------------------------------------------------------------
# events_gap_fill — dense minute grid, zero-filled
# ---------------------------------------------------------------------------


@register(
    "events_gap_fill",
    oracle="""
        WITH bounds AS (
            SELECT CAST(date_trunc('minute', MIN(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('minute', MAX(ts)) AS TIMESTAMP) AS hi
            FROM events
        ),
        grid AS (
            SELECT t.event_type, g.slot
            FROM (SELECT DISTINCT event_type FROM events) t,
                 bounds,
                 LATERAL (
                     SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                                   INTERVAL 1 MINUTE)) AS slot
                 ) g
        ),
        counts AS (
            SELECT event_type, date_trunc('minute', ts) AS slot,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ),
        filled AS (
            SELECT g.event_type, g.slot, COALESCE(c.c, 0) AS c,
                   epoch(g.slot)::BIGINT // 60 AS slot_idx
            FROM grid g LEFT JOIN counts c
              ON c.event_type = g.event_type AND c.slot = g.slot
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_slots,
               CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_slots,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(SUM(slot_idx * c) AS BIGINT) AS alignment_checksum
        FROM filled
        GROUP BY event_type
        ORDER BY event_type
    """,
    survey_ref="analytics breadth: time-series gap filling — dense "
    "minute grid per series (sequence + explode + left join), the "
    "densification step before any rolling/forecast model",
    description="builds the complete minute grid spanning the feed for "
    "every event type (sequence() + explode — the grid is generated, "
    "never scanned), left-joins the per-minute counts, and zero-fills "
    "the gaps.  Reported per type: slot count, ZERO-slot count (the "
    "rows that exist only because of the fill), event total, and an "
    "alignment checksum (Σ slot_index·count) that breaks if the join "
    "misaligns a single slot.  Minute granularity keeps both zero and "
    "nonzero slots plentiful at every SF (test-pinned).  At 100 TB the "
    "grid is tiny (slots × series) and broadcasts; the counts side is "
    "the only corpus-sized input",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("minute", F.min("ts")).alias("lo"),
        F.date_trunc("minute", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))
            ).alias("slot"),
        )
    )
    counts = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("slot")
    ).agg(F.count("*").alias("c"))
    filled = (
        grid.join(counts, ["event_type", "slot"], "left")
        .select(
            "event_type",
            F.coalesce("c", F.lit(0)).alias("c"),
            (F.unix_timestamp("slot") / 60).cast("long").alias("slot_idx"),
        )
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_slots"),
            F.sum(F.when(F.col("c") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_zero_slots"),
            F.sum("c").cast("long").alias("n_events"),
            F.sum(F.col("slot_idx") * F.col("c"))
            .cast("long")
            .alias("alignment_checksum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_type_transitions — per-user Markov transition counts
# ---------------------------------------------------------------------------


@register(
    "events_type_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        t AS (
            SELECT COALESCE(prev_type, '_START') AS prev_type,
                   event_type AS next_type, COUNT(*) AS c
            FROM seq GROUP BY 1, 2
        ),
        tot AS (
            SELECT prev_type, SUM(c) AS n_from FROM t GROUP BY prev_type
        )
        SELECT t.prev_type, t.next_type,
               CAST(t.c AS BIGINT) AS n,
               CAST(tot.n_from AS BIGINT) AS n_from,
               CAST(t.c AS DOUBLE) / tot.n_from AS p
        FROM t JOIN tot ON tot.prev_type = t.prev_type
        ORDER BY t.prev_type, t.next_type
    """,
    survey_ref="analytics breadth: event-sequence transition matrix — "
    "per-user lag window + grouped counts, the Markov-model fit that "
    "generalizes the fixed two-step funnel (events_funnel_conversion)",
    description="orders each user's events by (ts, event_id), pairs "
    "each with its predecessor via lag() (first event transitions from "
    "the _START state), and counts every (prev, next) type pair; the "
    "conditional probability is ONE IEEE division of exact integers per "
    "output row.  Output is bounded by (types+1)×types regardless of "
    "corpus size.  At 100 TB: one shuffle to partition by user, the lag "
    "frame never crosses partitions, and the transition table is the "
    "whole reduce output",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.coalesce(F.lag("event_type").over(w), F.lit("_START")).alias(
            "prev_type"
        ),
    )
    t = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("c"))
    tot = t.groupBy("prev_type").agg(F.sum("c").alias("n_from"))
    return (
        t.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("c").cast("long").alias("n"),
            F.col("n_from").cast("long").alias("n_from"),
            (F.col("c").cast("double") / F.col("n_from")).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )
