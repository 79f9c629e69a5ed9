"""Analytics breadth, round-4 continuation (wave 8c): sequence-pattern
mining over per-user event paths and a cross-table data-quality audit.

- ``events_path_signature``: per-user event-type PATH (the full ordered
  journey as one ``>``-joined string, (ts, event_id)-total-ordered so
  construction is deterministic) with length, purchase count and a
  view-then-purchase conversion flag — the MATCH_RECOGNIZE /
  sequence-pattern shape expressed with portable primitives: Spark
  builds the path with array_sort-over-collect_list (grouped, no
  window), DuckDB with ``string_agg(... ORDER BY)``.  The two engines
  use entirely different aggregation orders internally; the total order
  on (ts, event_id) is what makes the hash match.  The conversion test
  is a LIKE pattern, not regex — LIKE's two-wildcard dialect is
  identical everywhere, and the event-type alphabet makes substring
  collisions impossible.  At 100 TB: one shuffle on user_id; per-user
  paths are bounded by per-user activity, the same envelope every
  sessionization query in the repo already assumes.

- ``orders_lineitem_dq_audit``: the referential-integrity /
  constraint-audit report every warehouse load runs before publishing —
  orphan foreign keys both directions, date-order violations
  (shipdate < orderdate), domain violations (non-positive amounts,
  discount out of range), duplicate (orderkey, linenumber) "primary
  keys", and the base cardinalities the ratios read against.  The
  testdata genuinely violates two of these (2 815 date inversions and
  1 161 duplicate line keys at sf0.001) and is clean on the rest, so the
  audit gates non-vacuously in BOTH directions: real violations counted
  exactly, clean checks proven zero.  Each check is one aggregate or
  anti-join on the join key — no new shuffle shapes.

Both gated=False on registration: r5/r6 rotation candidates, swept by
the local oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# per-user event path signature
# ---------------------------------------------------------------------------

PATH_USER_CAP = 100  # bounded driver-gate output, same idiom as top_per_user


@register(
    "events_path_signature",
    gated=False,
    oracle=f"""
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               CAST(COUNT(*) AS BIGINT) AS path_len,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(CASE WHEN string_agg(event_type, '>' ORDER BY ts, event_id)
                              LIKE '%view%purchase%'
                         THEN 1 ELSE 0 END AS BIGINT) AS converted
        FROM events
        WHERE user_id < {PATH_USER_CAP}
        GROUP BY user_id
        ORDER BY user_id
    """,
    survey_ref="§2C sequence analytics — MATCH_RECOGNIZE-style per-user "
    "path signature via order-pinned string aggregation (array_sort over "
    "collect_list vs string_agg ORDER BY; total order makes them equal)",
    description="per-user ordered event-type path with purchase count "
    "and a view-then-purchase conversion flag (LIKE, not regex — the "
    "portable pattern dialect); deterministic because (ts, event_id) is "
    "a total order — one user_id shuffle, no windows",
)
def events_path_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < PATH_USER_CAP)
    rows = ev.select(
        "user_id",
        F.struct(F.unix_micros("ts").alias("t"), "event_id", "event_type").alias("e"),
    )
    agg = rows.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("e")), lambda s: s["event_type"]),
            ">",
        ).alias("path"),
        F.count("*").alias("path_len"),
        F.sum(F.when(F.col("e")["event_type"] == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
    )
    return agg.select(
        "user_id",
        "path",
        "path_len",
        "n_purchases",
        F.when(F.col("path").like("%view%purchase%"), 1)
        .otherwise(0)
        .cast("long")
        .alias("converted"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# cross-table data-quality audit
# ---------------------------------------------------------------------------


@register(
    "orders_lineitem_dq_audit",
    gated=False,
    oracle="""
        SELECT * FROM (
            SELECT 'dup_line_pk' AS check_name,
                   CAST((SELECT COUNT(*) FROM (
                        SELECT l_orderkey, l_linenumber FROM lineitem
                        GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
                     AS BIGINT) AS n
            UNION ALL
            SELECT 'discount_out_of_range',
                   CAST((SELECT COUNT(*) FROM lineitem
                         WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
            UNION ALL
            SELECT 'nonpositive_amounts',
                   CAST((SELECT COUNT(*) FROM lineitem
                         WHERE l_extendedprice <= 0 OR l_quantity <= 0) AS BIGINT)
            UNION ALL
            SELECT 'orphan_lineitems',
                   CAST((SELECT COUNT(*) FROM lineitem l
                         WHERE NOT EXISTS (SELECT 1 FROM orders o
                                           WHERE o.o_orderkey = l.l_orderkey))
                     AS BIGINT)
            UNION ALL
            SELECT 'orphan_orders_custkey',
                   CAST((SELECT COUNT(*) FROM orders o
                         WHERE NOT EXISTS (SELECT 1 FROM customer c
                                           WHERE c.c_custkey = o.o_custkey))
                     AS BIGINT)
            UNION ALL
            SELECT 'ship_before_order',
                   CAST((SELECT COUNT(*) FROM lineitem l JOIN orders o
                           ON l.l_orderkey = o.o_orderkey
                         WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
            UNION ALL
            SELECT 'total_lineitems',
                   CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
            UNION ALL
            SELECT 'total_orders',
                   CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
        ) ORDER BY check_name
    """,
    survey_ref="§2C data quality — cross-table referential/constraint "
    "audit (orphan FKs both directions, date inversions, domain checks, "
    "duplicate PKs) with base cardinalities; the pre-publish gate shape",
    description="constraint audit over orders/lineitem/customer: the "
    "testdata genuinely violates ship_before_order and dup_line_pk and "
    "is clean elsewhere, so both the counting and the proving-zero "
    "directions are non-vacuous; each check is one aggregate or "
    "key-join — anti-joins for orphans, no new shuffle shapes",
)
def orders_lineitem_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n")).select(
            F.lit(name).alias("check_name"), "n"
        )

    dup_pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
    )
    checks = [
        one("dup_line_pk", dup_pk),
        one(
            "discount_out_of_range",
            li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ),
        one(
            "nonpositive_amounts",
            li.where((F.col("l_extendedprice") <= 0) | (F.col("l_quantity") <= 0)),
        ),
        one(
            "orphan_lineitems",
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"),
        ),
        one(
            "orphan_orders_custkey",
            orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"),
        ),
        one(
            "ship_before_order",
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).where(
                F.col("l_shipdate") < F.col("o_orderdate")
            ),
        ),
        one("total_lineitems", li),
        one("total_orders", orders),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")
