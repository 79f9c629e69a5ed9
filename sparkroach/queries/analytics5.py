"""Relational breadth set 5 (round 3): outer-join distribution reporting,
argmax-by-scalar-subquery, and correlated per-group threshold filtering.

TPC-H Q13/Q15/Q17 shapes adapted to the driver testdata's simplified
columns (no o_comment, so Q13 counts all orders; Q15's revenue window and
Q17's brand filter use values the synthetic data actually contains).
Registered gated=False — the driver's 50-entry window is full — but every
oracle runs in the local sweep (tests/test_oracle_gate.py,
`python -m sparkroach.oracle`); r4 rotation candidates.

Money math follows the integer-cents discipline of analytics.py; Q15's
max-revenue tie-break compares EXACT integer cents (no float-equality
trap), and Q17's 0.2·avg threshold is one double expression built from
exact integers identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.analytics import cents, cents_sql, dsum
from sparkroach.queries.registry import register
from sparkroach.tables import load


@register(
    "q13_order_distribution",
    # r4: rotated IN — first driver-gate recording this round
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    survey_ref="§2C aggregations — TPC-H Q13 shape: outer-join count "
    "distribution (customers with zero orders included)",
    description="orders-per-customer histogram: customer LEFT JOIN orders "
    "(count(o_orderkey) ignores the null-extension rows, so zero-order "
    "customers land in bucket 0), then a second tiny aggregation over the "
    "counts. At scale the first join shuffles on custkey once; the second "
    "groupBy moves only (count, 1) pairs",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    # r4: rotated IN — first driver-gate recording this round
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM({cents_sql("l_extendedprice")}
                       * (100 - {cents_sql("l_discount")})) AS total_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_cents AS DOUBLE) / 10000.0 AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_cents = (SELECT max(total_cents) FROM revenue)
        ORDER BY s_suppkey
    """,
    survey_ref="§2C aggregations + scalar subquery — TPC-H Q15 shape: "
    "top supplier by windowed revenue",
    description="revenue per supplier over a 3-month ship window, then the "
    "argmax supplier(s) via an exact integer-cents max compare (ties kept, "
    "no float-equality trap). The max is a 1-row broadcast against the "
    "per-supplier aggregate; supplier is a broadcast dim — the lineitem "
    "scan is the only big input and it is date-pruned",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
            "total_cents"
        )
    )
    mx = rev.agg(F.max("total_cents").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_cents"] == mx["mx"])
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_qty_revenue",
    # r4: rotated IN — first driver-gate recording this round
    oracle=f"""
        WITH li AS (
            SELECT l_partkey,
                   CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                   {cents_sql("l_extendedprice")} AS price_cents
            FROM lineitem
        ),
        pa AS (
            SELECT l_partkey,
                   0.2 * (CAST(SUM(qty) AS DOUBLE) / count(*)) AS threshold
            FROM li GROUP BY l_partkey
        )
        SELECT CAST(SUM(price_cents) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
        FROM li
        JOIN pa ON li.l_partkey = pa.l_partkey
        JOIN part ON p_partkey = li.l_partkey
        WHERE p_brand = 'Brand#23' AND qty < threshold
    """,
    survey_ref="§2C aggregations + correlated subquery — TPC-H Q17 shape: "
    "small-quantity-order revenue against a per-part average",
    description="lineitems below 0.2x their part's average quantity, "
    "restricted to one brand; the correlated scalar subquery decorrelates "
    "into a per-part aggregate joined back on partkey (one shuffle reused "
    "by both sides), the brand dim broadcasts, and the threshold is one "
    "double expression over exact integers on both engines",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        cents("l_extendedprice").alias("price_cents"),
    )
    pa = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2) * (F.sum("qty").cast("double") / F.count("*"))
        ).alias("threshold")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    return (
        li.join(pa, "l_partkey")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(F.col("qty") < F.col("threshold"))
        .agg(
            (dsum(F.col("price_cents")).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "events_retention_cohorts",
    # r4: rotated IN — first driver-gate recording this round
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_diff('week', TIMESTAMP '2024-01-01', min(ts))
                        AS BIGINT) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_diff('week', TIMESTAMP '2024-01-01', ts)
                        AS BIGINT) AS week
            FROM events
        )
        SELECT f.cohort_week,
               a.week - f.cohort_week AS week_offset,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM firsts f JOIN activity a ON a.user_id = f.user_id
        WHERE a.week >= f.cohort_week
        GROUP BY f.cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    survey_ref="§2C aggregations — retention cohort analysis (classic "
    "product-analytics shape: first-activity cohort × week offset)",
    description="weekly retention triangle: cohort = the user's first-event "
    "week, cells = distinct users active at each week offset. Two "
    "aggregations over the same user_id shuffle (min-week and "
    "distinct-activity reuse one exchange under AQE), then a join back on "
    "user_id and a tiny final rollup",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    # calendar weeks since the corpus epoch, DuckDB date_diff('week')
    # semantics: boundary-crossing count, weeks start Monday — 2024-01-01
    # IS a Monday, so floor(days/7) over date_diff agrees exactly
    week = F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7).cast(
        "long"
    )
    acts = ev.select("user_id", week.alias("week")).distinct()
    firsts = acts.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        acts.join(firsts, "user_id")
        .where(F.col("week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_salted_type_counts",
    # r4: rotated IN — first driver-gate recording this round
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    survey_ref="§2C aggregations + skew handling — salted two-stage "
    "aggregation (the hot-key pattern, executable)",
    description="counts per event_type computed through an explicit "
    "16-way salt: stage 1 groups by (event_type, salt) so a hot key's "
    "rows spread across 16 reducers, stage 2 folds the partials. Results "
    "are provably identical to the plain groupBy (the oracle IS the plain "
    "groupBy); count_distinct(user_id) uses the standard two-level "
    "distinct — dedup on (event_type, user_id) first, whose shuffle keys "
    "spread naturally by user, then count per type. This is the manual "
    "fallback when AQE skew-join splitting can't apply (single-key "
    "aggregation)",
)
def events_salted_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "user_id", "event_id")
    salt = F.pmod(F.col("event_id"), F.lit(16)).alias("salt")
    counts = (
        ev.select("event_type", salt)
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("pn"))
        .groupBy("event_type")
        .agg(F.sum("pn").cast("long").alias("n"))
    )
    # two-level distinct: the (type, user) dedup shuffle is keyed by the
    # pair, so a hot type spreads across reducers by user_id — no per-salt
    # user sets held in executor memory (collect_set would be the 100 TB
    # mistake)
    uniques = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    return counts.join(uniques, "event_type").orderBy("event_type")


@register(
    "events_funnel_conversion",
    # r4: rotated IN — first driver-gate recording this round
    oracle="""
        WITH signups AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        converted AS (
            SELECT DISTINCT s.user_id
            FROM signups s
            JOIN events e
              ON e.user_id = s.user_id
             AND e.event_type = 'purchase'
             AND e.ts > s.signup_ts
             AND e.ts <= s.signup_ts + INTERVAL 7 DAY
        )
        SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
               CAST((SELECT count(*) FROM converted) AS BIGINT)
                   AS n_converted,
               CAST((SELECT count(*) FROM converted) AS DOUBLE) / count(*)
                   AS conversion_rate
        FROM signups
    """,
    survey_ref="§2C aggregations + time-window join — funnel conversion "
    "(signup → purchase within 7 days)",
    description="two-step funnel: each user's first signup, then whether a "
    "purchase follows within 7 days. The purchase probe is a semi-join on "
    "user_id with the time-window predicate pushed into the join — at "
    "scale both sides shuffle once on user_id and the window bound keeps "
    "state finite in a streaming variant. Conversion rate is one double "
    "division of exact counts on both sides",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("signup_ts"))
        & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
        "left_semi",
    )
    return (
        signups.agg(F.count("*").alias("n_signup_users"))
        .crossJoin(converted.agg(F.count("*").alias("n_converted")))
        .select(
            "n_signup_users",
            "n_converted",
            (F.col("n_converted").cast("double") / F.col("n_signup_users")).alias(
                "conversion_rate"
            ),
        )
    )


@register(
    "events_anomaly_zscore",
    # r4: rotated IN — first driver-gate recording this round
    oracle="""
        WITH buckets AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, hour
        ),
        stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(n) AS BIGINT) AS s1,
                   CAST(SUM(n * n) AS BIGINT) AS s2
            FROM buckets GROUP BY event_type
        )
        SELECT b.event_type, b.hour, b.n,
               (CAST(b.n AS DOUBLE) - CAST(s1 AS DOUBLE) / n_buckets)
                   / sqrt(CAST(n_buckets AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                   * n_buckets AS zscore
        FROM buckets b JOIN stats s ON b.event_type = s.event_type
        WHERE (CAST(b.n AS DOUBLE) - CAST(s1 AS DOUBLE) / n_buckets)
                  * CAST(n_buckets AS DOUBLE)
              > 3.0 * sqrt(CAST(n_buckets AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
        ORDER BY b.event_type, b.hour
    """,
    survey_ref="§2C aggregations — hourly-count anomaly detection "
    "(z-score > 3 per event type)",
    description="hours whose event count sits more than 3 population "
    "standard deviations above the type's mean. The variance comes from "
    "EXACT integer sums (n·Σx² − (Σx)² — never a running stddev, whose "
    "accumulation order differs between engines), so the doubles compared "
    "against the threshold are bit-identical on both sides. Two grouped "
    "aggregations over the same (type, hour) shuffle plus a broadcast of "
    "the per-type stats",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    buckets = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )
    stats = buckets.groupBy("event_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    nb = F.col("n_buckets").cast("double")
    dev = F.col("n").cast("double") - F.col("s1").cast("double") / F.col("n_buckets")
    spread = F.sqrt(
        nb * F.col("s2") - F.col("s1").cast("double") * F.col("s1")
    )
    return (
        buckets.join(F.broadcast(stats), "event_type")
        .where(dev * nb > F.lit(3.0) * spread)
        .select(
            "event_type",
            "hour",
            "n",
            (dev / spread * F.col("n_buckets")).alias("zscore"),
        )
        .orderBy("event_type", "hour")
    )
