"""Analytics breadth, round-4 continuation (wave 6): the remaining join
type (FULL OUTER), SQL null semantics as an explicit gate, and the
value-navigation window family (first/last/nth).

- ``user_daily_activity_full_outer`` — the one join type no other query
  exercised: FULL OUTER between per-(user, day) signup activity and
  purchase activity, with null-extended rows on BOTH sides and the
  coalesced classification real reports derive from it.
- ``events_null_semantics_report`` — SQL null behavior pinned as a hash:
  COUNT(*) vs COUNT(col), aggregates that skip nulls, and groups whose
  aggregate input is ENTIRELY null (SUM → NULL, not 0).  Cross-engine
  null-edge agreement is a classic silent-divergence trap; this gate
  makes it loud.
- ``events_session_bookends`` — first_value / last_value / nth_value
  over an explicit unbounded frame: the value-navigation windows no
  other query used (rank/lag families are covered elsewhere).

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
# user_daily_activity_full_outer
# ---------------------------------------------------------------------------


@register(
    "user_daily_activity_full_outer",
    oracle="""
        WITH s AS (
            SELECT user_id, EXTRACT(day FROM ts) AS day,
                   COUNT(*) AS n_signups
            FROM events WHERE event_type = 'signup'
            GROUP BY 1, 2
        ),
        p AS (
            SELECT user_id, EXTRACT(day FROM ts) AS day,
                   COUNT(*) AS n_purchases
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        )
        SELECT COALESCE(s.user_id, p.user_id) AS user_id,
               CAST(COALESCE(s.day, p.day) AS BIGINT) AS day,
               CAST(s.n_signups AS BIGINT) AS n_signups,
               CAST(p.n_purchases AS BIGINT) AS n_purchases,
               CASE WHEN s.user_id IS NULL THEN 'purchase_only'
                    WHEN p.user_id IS NULL THEN 'signup_only'
                    ELSE 'both' END AS activity
        FROM s FULL OUTER JOIN p
          ON p.user_id = s.user_id AND p.day = s.day
        ORDER BY user_id, day
    """,
    survey_ref="analytics breadth: FULL OUTER join — the one join type "
    "(inner/left/semi/anti/left-outer-stream all covered elsewhere) no "
    "other query exercised, with null-extended rows on BOTH sides",
    description="per-(user, day) signup activity FULL OUTER joined to "
    "purchase activity: a row survives when EITHER side exists, the "
    "missing side stays genuinely NULL (not zero — the n_signups/"
    "n_purchases columns hash as nulls, pinning outer-join null "
    "production cross-engine), and the coalesced classification "
    "('both'/'signup_only'/'purchase_only') is the report shape this "
    "join exists to feed.  At 100 TB both sides pre-aggregate before "
    "the join (the grouped tables are user×day, not events), and the "
    "full-outer shuffles on the same (user_id, day) key both aggs "
    "already produced — one exchange, reused",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def user_daily_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")

    def side(tp: str, out: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == tp)
            .groupBy("user_id", F.dayofmonth("ts").cast("long").alias("day"))
            .agg(F.count("*").cast("long").alias(out))
        )

    s = side("signup", "n_signups").alias("s")
    p = side("purchase", "n_purchases").alias("p")
    return (
        s.join(
            p,
            (F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("s.day") == F.col("p.day")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("s.user_id"), F.col("p.user_id")).alias("user_id"),
            F.coalesce(F.col("s.day"), F.col("p.day")).alias("day"),
            F.col("s.n_signups").alias("n_signups"),
            F.col("p.n_purchases").alias("n_purchases"),
            F.when(F.col("s.user_id").isNull(), "purchase_only")
            .when(F.col("p.user_id").isNull(), "signup_only")
            .otherwise("both")
            .alias("activity"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# events_null_semantics_report
# ---------------------------------------------------------------------------

# value > threshold at ~16% of rows, grouped at (type, user, day)
# granularity where groups hold only 1–3 rows: all-null and non-null
# groups are BOTH plentiful at every SF (the group density is invariant
# because users scale with events; a coarser (type, day) grouping made
# the non-null path vacuous at sf0.001 and the all-null path vanish at
# sf0.1 — verified against the data before settling here)
NULL_THRESHOLD = 100.0


@register(
    "events_null_semantics_report",
    oracle=f"""
        WITH d AS (
            SELECT event_type, user_id, EXTRACT(day FROM ts) AS day,
                   CASE WHEN value > {NULL_THRESHOLD} THEN value END AS hv
            FROM events
        ),
        g AS (
            SELECT event_type, user_id, day,
                   COUNT(*) AS n_rows,
                   COUNT(hv) AS n_nonnull,
                   CAST(SUM(CAST(hv AS DECIMAL(28,10))) AS DOUBLE) AS sum_hv
            FROM d GROUP BY event_type, user_id, day
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n_nonnull = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_all_null_groups,
               CAST(SUM(CASE WHEN sum_hv IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_sums,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               CAST(SUM(n_nonnull) AS BIGINT) AS n_nonnull,
               CAST(SUM(COALESCE(CAST(sum_hv AS DECIMAL(28,10)), 0))
                    AS DOUBLE) AS total_hv
        FROM g
        GROUP BY event_type
        ORDER BY event_type
    """,
    survey_ref="analytics breadth: SQL null semantics pinned as a gate — "
    "COUNT(*) vs COUNT(col), null-skipping aggregates, and SUM over an "
    "all-null group yielding NULL (not 0) — the classic cross-engine "
    "silent-divergence trap",
    description=f"derives a nullable column (value only when > "
    f"{NULL_THRESHOLD} — so many (type, user, day) micro-groups hold "
    "ONLY nulls), aggregates per group, then reports per type: group count, "
    "how many groups had zero non-null inputs, how many SUMs came back "
    "NULL (must equal the former — the engines agree SUM(all-null) is "
    "NULL, not 0), and the exact totals.  Both layers are DECIMAL-"
    "computed.  An engine that treated SUM(all-null) as 0, or "
    "COUNT(col) as COUNT(*), hash-diverges immediately",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_null_semantics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        "user_id",
        F.dayofmonth("ts").cast("long").alias("day"),
        F.when(F.col("value") > NULL_THRESHOLD, F.col("value")).alias("hv"),
    )
    g = d.groupBy("event_type", "user_id", "day").agg(
        F.count("*").alias("n_rows"),
        F.count("hv").alias("n_nonnull"),
        F.sum(F.col("hv").cast("decimal(28,10)")).cast("double").alias("sum_hv"),
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_nonnull") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_all_null_groups"),
            F.sum(F.when(F.col("sum_hv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_sums"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_nonnull").cast("long").alias("n_nonnull"),
            F.sum(F.coalesce(F.col("sum_hv").cast("decimal(28,10)"), F.lit(0)))
            .cast("double")
            .alias("total_hv"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_session_bookends — first_value / last_value / nth_value
# ---------------------------------------------------------------------------

# purchases per user range ~2–26 at every SF, so the nth is NULL for
# most users and non-NULL for some — both paths live at every SF
NTH_EVENT = 15


@register(
    "events_session_bookends",
    oracle=f"""
        SELECT DISTINCT user_id,
               first_value(value) OVER w AS first_purchase,
               last_value(value) OVER w AS last_purchase,
               nth_value(value, {NTH_EVENT}) OVER w AS nth_purchase,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_purchases
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
        ORDER BY user_id
    """,
    survey_ref="analytics breadth: value-navigation windows — "
    "first_value / last_value / nth_value over an explicit unbounded "
    "frame (the default frame ends at CURRENT ROW, which makes "
    "last_value a footgun both engines share; the explicit frame is "
    "the correct form and the gate pins it)",
    description=f"per user: the first, last, and {NTH_EVENT}th purchase "
    "value in (ts, event_id) order over an UNBOUNDED PRECEDING AND "
    "UNBOUNDED FOLLOWING frame — values pass through exactly (no "
    "arithmetic, so doubles hash bit-for-bit), and nth_value is NULL "
    f"for users with fewer than {NTH_EVENT} purchases while non-NULL "
    "for the heavy buyers, so both paths are exercised at every SF.  "
    "One window pass, deduplicated to a row per user; at 100 TB this "
    "is one shuffle by user and the frame never leaves the partition",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_session_bookends(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("value").over(w).alias("first_purchase"),
            F.last("value").over(w).alias("last_purchase"),
            F.nth_value("value", NTH_EVENT).over(w).alias("nth_purchase"),
            F.count("*").over(w).cast("long").alias("n_purchases"),
        )
        .distinct()
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# docs_null_safe_join — <=> (null-safe equality) as a JOIN key
# ---------------------------------------------------------------------------


@register(
    "docs_null_safe_join",
    gated=False,  # r6 rotation candidate (window frozen this round)
    oracle="""
        WITH ev AS (
            SELECT doc_id, NULLIF(lang, 'de') AS k FROM documents
            WHERE doc_id % 2 = 0
        ),
        od AS (
            SELECT doc_id, NULLIF(lang, 'de') AS k FROM documents
            WHERE doc_id % 2 = 1
        )
        SELECT COALESCE(ev.k, '<null>') AS join_key,
               CAST(COUNT(*) AS BIGINT) AS n_nullsafe_pairs,
               CAST(SUM(CASE WHEN ev.k IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_equals_pairs
        FROM ev JOIN od ON ev.k IS NOT DISTINCT FROM od.k
        GROUP BY COALESCE(ev.k, '<null>')
        ORDER BY join_key
    """,
    survey_ref="§2C joins — NULL-SAFE equality (<=> / IS NOT DISTINCT "
    "FROM) as the join condition: NULL keys MATCH each other, the "
    "semantic plain = can never produce; the contrast column counts "
    "what = would have kept",
    description="documents split into even/odd halves with lang "
    "nulled for one value (NULLIF), joined on eqNullSafe: the '<null>' "
    "group's pairs exist ONLY under null-safe semantics "
    "(n_equals_pairs = 0 there, = n_nullsafe_pairs everywhere else).  "
    "Spark hash-partitions <=> like any equi-key (NULL hashes as a "
    "value), so the plan is a standard shuffled hash/SMJ join — no "
    "nested loop — and the shape survives any corpus size; the "
    "aggregation collapses the pair blowup immediately",
)
def docs_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.nullif("lang", F.lit("de")).alias("k")
    )
    ev = d.where(F.col("doc_id") % 2 == 0).select(F.col("k").alias("ek"))
    od = d.where(F.col("doc_id") % 2 == 1).select(F.col("k").alias("ok"))
    return (
        ev.join(od, F.col("ek").eqNullSafe(F.col("ok")))
        .groupBy(F.coalesce("ek", F.lit("<null>")).alias("join_key"))
        .agg(
            F.count("*").alias("n_nullsafe_pairs"),
            F.sum(F.when(F.col("ek").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_equals_pairs"),
        )
        .orderBy("join_key")
    )


@register(
    "docs_explode_outer_census",
    gated=False,  # r6 rotation candidate (window frozen this round)
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '),
                               x -> length(x) >= 6) AS rare
            FROM documents
        )
        SELECT COALESCE(u.tok, '<none>') AS token,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM t LEFT JOIN LATERAL (SELECT unnest(rare) AS tok) u ON true
        GROUP BY COALESCE(u.tok, '<none>')
        ORDER BY token
    """,
    survey_ref="§2C generators — explode_outer NULL preservation: a "
    "document whose array is EMPTY must survive the explode as one "
    "null-extended row (plain explode silently drops it — the row-loss "
    "bug every per-token pipeline writes at least once)",
    description="census of long (>= 6-char) tokens via "
    "explode_outer: the '<none>' row counts documents with no such "
    "token, a number that exists ONLY under outer semantics.  Plan is "
    "scan → filter() HOF → Generate(explode_outer) → hash agg — one "
    "shuffle, and the empty-array rows cost one output row each "
    "instead of disappearing from downstream coverage accounting",
)
def docs_explode_outer_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rare = F.filter(
        F.split(F.col("text"), " "), lambda x: F.length(x) >= 6
    )
    return (
        d.select(F.explode_outer(rare).alias("tok"))
        .groupBy(F.coalesce("tok", F.lit("<none>")).alias("token"))
        .agg(F.count("*").alias("n"))
        .orderBy("token")
    )
