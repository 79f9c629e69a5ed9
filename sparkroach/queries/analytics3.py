"""Relational breadth set 3: EXISTS semi-join, HAVING + IN-subquery,
multi-way top-k report, exact cumulative windows.

These are the remaining classic OLAP shapes the upstream Indexer's SQL
generation leans on CockroachDB for (SURVEY §2C joins/aggregations/sorts):
the reference declares the filter surface and delegates execution; at
100 TB these plans are Catalyst's to own.  Adapted to the driver testdata's
simplified TPC-H columns (no l_commitdate/l_receiptdate/o_shippriority).

Scale notes inline per query.  Money math follows the integer-cents
discipline of analytics.py (exact long hot path, decimal(38,0) sums,
double only at the very end) so value hashes match the DuckDB oracle
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.analytics import cents, cents_sql, dsum
from sparkroach.queries.registry import register
from sparkroach.tables import load


@register(
    "q4_order_priority",
    gated=False,  # near-duplicate shape; local-oracle-swept, driver slot yielded
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    survey_ref="§2C joins: EXISTS → left-semi (participation semi-join "
    "shape, idb.go:188-190 generalized); TPC-H Q4 adapted to testdata "
    "columns (l_shipdate vs o_orderdate + 60d for late shipment)",
    description="EXISTS semi-join: orders in a quarter with a late-shipped "
    "lineitem, counted per priority",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shape: date-filtered orders (partition-prunable at scale) LEFT SEMI
    # lineitem on key + non-equi residual.  The equi key keeps it a hash
    # semi-join (one shuffle pair); the date comparison rides along as the
    # join residual, never materializing matches (first-match short-circuit
    # beats EXISTS-as-aggregate).  Group count is ~5 groups, partial-agg'd.
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q10_returned_revenue",
    gated=False,  # near-duplicate shape; local-oracle-swept, driver slot yielded
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({cents_sql("l_extendedprice")}
                        * (100 - {cents_sql("l_discount")})) AS DOUBLE) / 10000.0
                   AS revenue,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND l_returnflag = 'R'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    survey_ref="§2C joins + top-k: 4-way join, grouped revenue, "
    "orderBy().limit() (TakeOrderedAndProject) — TPC-H Q10 adapted",
    description="returned-item revenue report: top 20 customers by revenue "
    "from R-flagged lineitems over a half-year window",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join order at scale: lineitem (biggest, filtered to R) ⋈ orders
    # (date-pruned) shuffles on orderkey; the grouped result (≤ |customer|
    # rows) then joins customer, and nation BROADCASTS onto it.  Grouping
    # on custkey FIRST shrinks the fact stream before the dimension joins —
    # the agg-pushdown Catalyst can't do automatically across joins.
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", cents("l_extendedprice").alias("pc"), cents("l_discount").alias("dc")
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg((dsum(F.col("pc") * (100 - F.col("dc"))).cast("double") / 10000.0).alias("revenue"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        per_cust.join(c, per_cust["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    gated=False,  # near-duplicate shape; local-oracle-swept, driver slot yielded
    oracle="""
        SELECT c_name, c_custkey, o_orderkey,
               o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey
              HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 210
          )
          AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey
        LIMIT 100
    """,
    survey_ref="§2C aggregations + joins: HAVING-gated IN-subquery "
    "(grouped semi-filter), then re-join and re-aggregate — TPC-H Q18",
    description="large-volume orders: orders whose summed lineitem "
    "quantity exceeds 210, with customer, top 100 by price",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HAVING subquery and the outer aggregate both group lineitem by
    # orderkey — computing the per-order qty ONCE and filtering serves as
    # both the IN-list and the total_qty column: one lineitem shuffle
    # instead of two, and the survivors (rare at any SF) broadcast-join
    # into orders/customer.
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("qty")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 210)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "events_cumulative_value",
    gated=False,  # near-duplicate shape; local-oracle-swept, driver slot yielded
    oracle="""
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE)
                   / 100.0 AS running_value,
               CAST(COALESCE(
                   CAST(ROUND(value * 100) AS BIGINT)
                   - LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER w,
                   0) AS DOUBLE) / 100.0 AS value_delta
        FROM events
        WHERE event_type = 'purchase' AND user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts, event_id
    """,
    survey_ref="§2C window functions (row_number precedent, SURVEY A14) "
    "extended: cumulative frame + lag over event time",
    description="per-user running purchase total and step delta — "
    "cumulative window + lag, exact integer-cents accumulation",
)
def events_cumulative_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on user_id serves both window functions (same partition
    # + order spec).  Accumulation is integer cents: a running double sum
    # would be order-sensitive in the last ulp and could diverge from the
    # oracle; longs are exact and stay in codegen.  (ts, event_id) ordering
    # makes the frame total under ts ties.
    ev = load(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    vc = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            (F.sum(vc).over(w).cast("double") / 100.0).alias("running_value"),
            (
                F.coalesce(vc - F.lag(vc).over(wl), F.lit(0)).cast("double") / 100.0
            ).alias("value_delta"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "part_min_price_supplier",
    gated=False,  # r4: rotated OUT — driver-green r1–r3; local-oracle-swept
    oracle=f"""
        WITH mp AS (
            SELECT l_partkey,
                   MIN({cents_sql("l_extendedprice")}) AS min_cents
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p_partkey, p_name,
               CAST(mp.min_cents AS DOUBLE) / 100.0 AS min_price,
               MIN(l.l_suppkey) AS s_suppkey,
               MIN(s.s_name) AS s_name
        FROM part p
        JOIN mp ON mp.l_partkey = p.p_partkey
        JOIN lineitem l ON l.l_partkey = p.p_partkey
              AND {cents_sql("l.l_extendedprice")} = mp.min_cents
        JOIN supplier s ON s.s_suppkey = (
            SELECT MIN(l2.l_suppkey) FROM lineitem l2
            WHERE l2.l_partkey = p.p_partkey
              AND {cents_sql("l2.l_extendedprice")} = mp.min_cents
        )
        WHERE p.p_brand = 'Brand#13'
        GROUP BY p_partkey, p_name, mp.min_cents
        ORDER BY p_partkey
    """,
    survey_ref="§2C joins + aggregations: correlated-scalar-subquery argmin "
    "(TPC-H Q2's min-cost-supplier shape, adapted: no partsupp table — "
    "lineitem links part to supplier)",
    description="per Brand#33 part: the cheapest offered price and the "
    "lowest-keyed supplier offering it — argmin via a single struct-min",
)
def part_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle needs a grouped-min CTE plus a correlated scalar subquery
    # to break ties; Spark expresses the whole argmin as ONE aggregate —
    # min(struct(price, suppkey)) — so lineitem is shuffled once on
    # partkey, and both the minimum price and its deterministic witness
    # fall out of the same partial-aggregable min.  part (filtered to one
    # brand) and supplier then BROADCAST onto the small grouped result.
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("pc")
    )
    best = (
        li.groupBy("l_partkey")
        .agg(F.min(F.struct("pc", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            (F.col("b.pc").cast("double") / 100.0).alias("min_price"),
            F.col("b.l_suppkey").alias("s_suppkey"),
        )
    )
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), "s_suppkey")
        .select("p_partkey", "p_name", "min_price", "s_suppkey", "s_name")
        .orderBy("p_partkey")
    )
