"""Analytics breadth, round-4 continuation (wave 7): the salted JOIN —
the join-side half of the skew playbook (the aggregation-side half is
``events_salted_type_counts``; the diagnostic that decides to salt is
``suppkey_skew_report``) — and the SQL front door
(``sql_front_door_pricing``: the oracle text itself through
spark.sql(), pinning textual-dialect parity).

``salted_hot_key_join`` manufactures a genuinely hot join key (10% of
the fact rows collapse onto key 0), then executes the join with the
explicit salting recipe: the fact side gets a random-but-deterministic
salt in [0, S), the dimension side is REPLICATED S times (one copy per
salt value), and the join runs on (key, salt) — so the hot key's rows
spread across S reducers instead of one straggler task.  The result is
hash-matched against the plain unsalted join, proving the rewrite is
semantics-preserving — which is the whole point: salting is a physical
rewrite, never a semantic one.

(AQE's skew-join splitting does this adaptively for sort-merge joins;
the explicit recipe is what you reach for when the skew is in an
aggregation upstream, the join is broadcast-ineligible, or the engine's
skew threshold misses — SCALE.md carries the decision table.)

gated=False on registration: r5 rotation candidate, swept by the local
oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.analytics11 import _th32_col, _th32_sql
from sparkroach.queries.registry import register
from sparkroach.tables import load

N_SALTS = 8


@register(
    "salted_hot_key_join",
    oracle="""
        WITH f AS (
            SELECT CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END
                       AS join_key,
                   value
            FROM events
        ),
        d AS (
            SELECT DISTINCT CASE WHEN user_id % 10 = 0 THEN 0
                                 ELSE user_id END AS join_key,
                   CASE WHEN user_id % 10 = 0 THEN 'hot' ELSE 'normal' END
                       AS key_class
            FROM events
        )
        SELECT d.key_class,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT f.join_key) AS BIGINT) AS n_keys,
               CAST(SUM(CAST(f.value AS DECIMAL(28,10))) AS DOUBLE)
                   AS total_value
        FROM f JOIN d ON d.join_key = f.join_key
        GROUP BY d.key_class
        ORDER BY d.key_class
    """,
    survey_ref="scale playbook: SALTED JOIN — the join-side skew recipe "
    "(fact side salted, dimension side replicated per salt, join on "
    "(key, salt)); result hash-matched against the plain join, proving "
    "the rewrite is semantics-preserving",
    description=f"a hot key is manufactured (10% of fact rows collapse "
    "onto key 0), the fact side gets salt = pmod(event_id, "
    f"{N_SALTS}), the dimension side is exploded {N_SALTS}× (one copy "
    "per salt value — dimension replication is the price, which is why "
    "salting suits small-dim/hot-fact joins), and the equi-join runs on "
    "(join_key, salt): the hot key's rows land on "
    f"{N_SALTS} reducers instead of one straggler.  The oracle computes "
    "the UNSALTED join — identical totals prove no row was lost, "
    "duplicated, or misrouted by the rewrite.  At 100 TB this exact "
    "shape (with the salt count sized from suppkey_skew_report's "
    "max/mean ratio) is the fallback when AQE skew-split cannot apply",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def salted_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    key = F.when(F.pmod("user_id", F.lit(10)) == 0, F.lit(0)).otherwise(
        F.col("user_id")
    )
    fact = ev.select(
        key.alias("join_key"),
        "value",
        F.pmod("event_id", F.lit(N_SALTS)).alias("salt"),
    )
    dim = (
        ev.select(
            key.alias("join_key"),
            F.when(F.pmod("user_id", F.lit(10)) == 0, "hot")
            .otherwise("normal")
            .alias("key_class"),
        )
        .distinct()
        # replicate: one dimension copy per salt value
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
        )
    )
    joined = fact.join(dim, ["join_key", "salt"])
    return (
        joined.groupBy("key_class")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("join_key").cast("long").alias("n_keys"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("key_class")
    )


@register(
    "sql_front_door_pricing",
    # integer-cents hot path (the q1 idiom): the decimal-typed form hit
    # Spark's decimal-precision-overflow scale reduction at sf0.01 —
    # (28,4)×(29,4) exceeds precision 38 and Spark silently rounds the
    # per-row product where DuckDB keeps it exact.  Long-cents math has
    # no such type-system divergence, and the text is dialect-shared.
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000.0 AS disc_revenue
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    survey_ref="API surface: the SQL FRONT DOOR — the identical query "
    "text executed via spark.sql() over registered temp views (every "
    "other gate drives the DataFrame API; a reference user migrating "
    "SQL workloads needs the textual dialect to agree too)",
    description="a Q1-shaped pricing summary whose Spark side is ONE "
    "literal SQL string run through spark.sql() against a temp view — "
    "the exact text the DuckDB oracle runs, modulo nothing: the SQL "
    "dialect subset used by this engine's gates (ANSI aggregates, "
    "DECIMAL casts, timestamp literals, GROUP BY/ORDER BY) parses and "
    "evaluates identically in both engines.  Catalyst treats the parsed "
    "text exactly like the DataFrame plans (same optimizer, same "
    "pushdown), which this gate makes checkable rather than assumed",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def sql_front_door_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.registry import QUERIES

    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sr_lineitem_view"
    )
    # run the ORACLE text itself, retargeted at the temp view — one
    # source of truth, zero drift between the two engines' query text
    sql = QUERIES["sql_front_door_pricing"].oracle.replace(
        "FROM lineitem", "FROM sr_lineitem_view"
    )
    return spark.sql(sql)


@register(
    "orders_priority_rollup",
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(GROUPING(o_orderpriority) * 2
                    + GROUPING(o_orderstatus) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY gid, priority, status
    """,
    survey_ref="analytics breadth: ROLLUP grouping sets — the "
    "hierarchical prefix-aggregation complement of docs_grouping_sets' "
    "CUBE (subtotals per priority, grand total; never the cross "
    "combinations CUBE adds)",
    description="ROLLUP(priority, status): detail rows, per-priority "
    "subtotals, and the grand total in ONE Expand + one hash aggregate "
    "over one scan (plan-shared with the CUBE gate), with grouping_id "
    "disambiguating genuine NULL groups from subtotal rows — both "
    "engines agree on the grouping bitmask.  Money sums in integer "
    "cents (the q1 idiom) with one final division.  At 100 TB, ROLLUP's "
    "expansion factor is levels+1 (3 here) vs CUBE's 2^levels — the "
    "reason hierarchical reports prefer it",
    gated=False,  # r6 rotation candidate (r5 window is fully committed)
)
def orders_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_orders"),
            (F.sum(cents).cast("double") / 100.0).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n_orders",
            "total_price",
        )
        .orderBy("gid", "priority", "status")
    )


@register(
    "events_interarrival_stats",
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS mean_gap_us
        FROM gaps
        WHERE gap_us IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id
    """,
    survey_ref="analytics breadth: inter-arrival statistics — per-user "
    "event-gap distribution from a lag window (the activity-cadence "
    "profile sessionization thresholds are tuned from)",
    description="per user: gaps between consecutive events (lag over "
    "(ts, event_id) order, microsecond-exact integers), aggregated to "
    "count/min/max and a mean that is ONE division of exact integers.  "
    "This is the empirical distribution the sessionizer's 1800 s gap "
    "threshold comes from — run it BEFORE choosing the threshold, not "
    "after.  One shuffle by user; the lag frame never crosses "
    "partitions",
    gated=False,  # r6 rotation candidate (r5 window is fully committed)
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            (F.sum("gap_us").cast("double") / F.count("gap_us")).alias(
                "mean_gap_us"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "documents_schema_evolution",
    oracle=f"""
        WITH old_gen AS (
            SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0
        ),
        new_gen AS (
            SELECT doc_id, text, lang, source, n_chars
            FROM documents WHERE doc_id % 2 = 1
        ),
        unified AS (
            SELECT doc_id, lang, NULL AS source, NULL AS n_chars,
                   {_th32_sql("text")} AS th
            FROM old_gen
            UNION ALL
            SELECT doc_id, lang, source, n_chars, {_th32_sql("text")} AS th
            FROM new_gen
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_old_generation,
               CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS n_chars_known,
               CAST(SUM(th) AS BIGINT) AS text_hash_sum
        FROM unified
        GROUP BY lang
        ORDER BY lang
    """,
    survey_ref="source formats / storage: SCHEMA EVOLUTION on the read "
    "path — an old-generation file set lacking columns later added is "
    "read together with the new generation under the superset schema, "
    "missing columns surfacing as NULLs (the additive-evolution "
    "contract every long-lived corpus relies on)",
    description="half the corpus is written as an OLD-generation "
    "parquet set (doc_id, text, lang only — as if source/n_chars were "
    "added later), the other half with the full schema; both are read "
    "back in ONE spark.read with the explicit superset schema, so the "
    "old files' missing columns come back as genuine NULLs and the "
    "per-lang report counts them (n_old_generation) next to "
    "content checksums proving no row was altered by the widening.  At "
    "100 TB schema changes are additive-by-append exactly like this — "
    "rewriting history is the thing this read path exists to avoid",
    gated=False,  # r6 rotation candidate (r5 window is fully committed)
)
def documents_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    d = load(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="sparkroach_evo_")
    try:
        old_path = os.path.join(root, "gen_old")
        new_path = os.path.join(root, "gen_new")
        d.where(F.pmod("doc_id", F.lit(2)) == 0).select(
            "doc_id", "text", "lang"
        ).write.parquet(old_path)
        d.where(F.pmod("doc_id", F.lit(2)) == 1).select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).write.parquet(new_path)
        superset = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        back = spark.read.schema(superset).parquet(old_path, new_path)
        out = (
            back.groupBy("lang")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum(F.when(F.col("source").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_old_generation"),
                F.sum(F.coalesce("n_chars", F.lit(0)))
                .cast("long")
                .alias("n_chars_known"),
                F.sum(_th32_col(F.col("text")))
                .cast("long")
                .alias("text_hash_sum"),
            )
            .orderBy("lang")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "events_sliding_window_rollup",
    oracle="""
        WITH ex AS (
            -- each event belongs to exactly TWO 2-hour windows sliding
            -- by 1 hour: the one starting at its own hour and the one
            -- starting an hour earlier
            SELECT event_type,
                   unnest([date_trunc('hour', ts),
                           date_trunc('hour', ts) - INTERVAL 1 HOUR])
                       AS window_start,
                   value
            FROM events
        )
        SELECT window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   AS total_value
        FROM ex
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    survey_ref="§2C streaming windowed agg family: SLIDING windows "
    "(window duration > slide) — the overlapping-window shape the "
    "tumbling gates (events_minute_rollup, the rollup stream gates) "
    "never exercised",
    description="2-hour windows sliding by 1 hour over the event feed: "
    "Spark's window(ts, '2 hours', '1 hour') assigns each event to "
    "duration/slide = 2 overlapping windows (an internal explode), and "
    "the oracle mirrors that assignment explicitly (each event unnests "
    "into its two window starts).  Counts double relative to the "
    "tumbling rollup — by design; the overlap is what gives sliding "
    "dashboards their smoothness, and the 2× state/output cost is the "
    "scale trade the duration/slide ratio controls.  Same watermark and "
    "partial-agg behavior as tumbling at 100 TB",
    gated=False,  # r6 rotation candidate (r5 window is fully committed)
)
def events_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# lineitem_zorder_read — Z-ordered layout: multi-dimensional file pruning
# ---------------------------------------------------------------------------

Z_DATE_BITS = 8  # 16-day buckets over the TPC-H date range (< 256)
Z_SUPP_BITS = 4  # supplier bucket (pmod 16 — suppliers are FEW at low SF)


def _z_value_expr(date_col: str, supp_col: str) -> str:
    """Bit-interleave the two bucket ids into a Z-value, weaving the
    supplier's bits among the HIGH date bits (MSB-down:
    d7 s3 d6 s2 d5 s1 d4 s0 d3 d2 d1 d0).  A naive low-bit interleave
    degenerates to a plain date sort when the supplier dimension has few
    distinct values (at sf0.001 there are 10 suppliers — their high bits
    are always zero), which silently destroys exactly the 2-dim locality
    the curve exists for; weaving into the high bits keeps both
    dimensions influential at every fill level.  Pure integer bit ops —
    used only for the physical sort order, so cross-engine exactness is
    not even required (content is what the gate hashes)."""
    lo = Z_DATE_BITS - Z_SUPP_BITS  # low date bits kept contiguous
    terms = [f"((({date_col} >> {i}) & 1) << {i})" for i in range(lo)]
    for i in range(Z_SUPP_BITS):
        terms.append(f"((({supp_col} >> {i}) & 1) << {lo + 2 * i})")
        terms.append(f"((({date_col} >> {lo + i}) & 1) << {lo + 2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@register(
    "lineitem_zorder_read",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1995-04-01'
          AND l_suppkey % 16 < 4
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    survey_ref="physical layout: Z-ORDER clustering — bit-interleaved "
    "sort over (ship-date bucket, supplier bucket) so file-level min/max "
    "stats prune on BOTH dimensions (a single-key sort prunes only its "
    "own dimension; the multi-dim pruning factor is test-pinned against "
    "the linear layout)",
    description="lineitem is rewritten sorted by the Z-value of "
    "(date bucket, suppkey bucket) — bit-interleaving keeps rows close "
    "in BOTH dimensions inside each file, so a two-dimensional "
    "predicate admits only the files whose min/max rectangles intersect "
    "it.  The gate re-reads the Z-ordered copy under a date-range + "
    "supplier-bucket predicate and hash-matches the aggregate against "
    "the raw table, proving the rewrite is content-preserving; the "
    "pruning advantage itself (files admissible under Z-order vs under "
    "a date-only sort, from real parquet footer stats) is pinned in "
    "tests.  At 100 TB Z-ordering is THE answer when two access "
    "patterns share one table and neither can own the sort key",
    gated=False,  # r6 rotation candidate (r5 window is fully committed)
)
def lineitem_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    li = load(spark, sf_dir, "lineitem")
    root = tempfile.mkdtemp(prefix="sparkroach_zorder_")
    try:
        path = os.path.join(root, "lineitem_z")
        write_zordered_lineitem(li, path)
        back = spark.read.parquet(path)
        out = (
            back.where(
                (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
                & (F.pmod("l_suppkey", F.lit(16)) < 4)
            )
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("long").alias("n_items"),
                (
                    F.sum(
                        F.round(F.col("l_extendedprice") * 100).cast("long")
                    ).cast("double")
                    / 100.0
                ).alias("total_price"),
            )
            .orderBy("l_returnflag")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def write_zordered_lineitem(li: DataFrame, path: str, max_rows: int = 4000) -> None:
    """Write lineitem Z-ordered by (date bucket, supplier bucket) into
    bounded files — shared by the gate and the pruning test."""
    zb = (
        # date bucket must be MONOTONE (16-day buckets, ~160 < 2^8 over
        # the TPC-H date range) — a modulo bucket would wrap and destroy
        # exactly the locality Z-ordering exists to preserve
        li.withColumn(
            "z_date",
            F.floor(
                F.datediff("l_shipdate", F.lit("1992-01-01")) / 16
            ).cast("int"),
        )
        .withColumn("z_supp", F.pmod("l_suppkey", F.lit(16)).cast("int"))
        .withColumn("z", F.expr(_z_value_expr("z_date", "z_supp")))
    )
    (
        zb.repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .write.option("maxRecordsPerFile", max_rows)
        .parquet(path)
    )
