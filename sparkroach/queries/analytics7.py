"""Relational breadth set 7 (round 4): the last six TPC-H shapes.

With these six, every TPC-H query shape (Q1–Q22) is represented over the
driver testdata schema (Q1/3/5 analytics.py, Q6 analytics2.py, Q4/10/18
analytics3.py, Q7/14/16/19 analytics4.py, Q13/15/17 analytics5.py, Q22
analytics6.py, Q2-as-min-cost-supplier relational.py's
part_min_price_supplier).  All six here are adapted because the synthetic
schema has no partsupp / shipmode / commit-receipt dates (each docstring
states exactly what was substituted and why the plan shape is preserved):

- Q8  national market share           — verbatim shape
- Q9  product-type profit             — adapted: no ps_supplycost, profit
                                        = discounted revenue
- Q11 important stock                 — adapted: partsupp value →
                                        lineitem revenue per part from
                                        one nation's suppliers; the
                                        GROUP BY + HAVING-over-global-
                                        scalar-subquery shape is intact
- Q12 late shipping priority mix      — adapted: shipmode → returnflag
                                        categorical, commit/receipt
                                        lateness → shipdate ≥ orderdate
                                        + 90 days; the conditional-count
                                        join shape is intact
- Q20 dominant-supplier selection     — adapted: ps_availqty threshold →
                                        supplier's shipped-qty share of
                                        the part's total (same
                                        aggregate-then-correlated-
                                        threshold semi-join plan)
- Q21 suppliers who kept orders open  — adapted: no commit/receipt dates;
                                        "late" = supplier's line still
                                        'O' on an o_orderstatus='F' order
                                        (same EXISTS + NOT EXISTS
                                        anti-join shape)

Registered gated=False — the driver's 50-entry window is full this round —
but every oracle runs in the local sweep (tests/test_oracle_gate.py,
`python -m sparkroach.oracle`); r5 rotation candidates.

Money math follows the integer-cents discipline of analytics.py (exact
long cents per row inside codegen, decimal(38,0) sums, one final double
division identically on both engines).

Reference parity note: the reference (algorand/conduit-cockroachdb)
delegates all analytical SQL to CockroachDB (idb.go:153-387 exposes the
query surface; the warehouse side is out-of-engine).  These shapes are the
engine-side analytical coverage a CockroachDB user would run directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.analytics import cents, cents_sql, dsum
from sparkroach.queries.registry import register
from sparkroach.tables import load


def _rev_cents() -> F.Column:
    """Exact discounted-revenue cents·100: price_cents * (100 - disc_cents)."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


_REV_SQL = f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"


@register(
    "q8_market_share",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle=f"""
        WITH flat AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {_REV_SQL} AS vol_cents,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n1.n_regionkey
            JOIN nation n2 ON n2.n_nationkey = s_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'MEDIUM'
              AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                  AND TIMESTAMP '1996-12-31'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                             THEN vol_cents ELSE 0 END) AS DOUBLE)
               / CAST(SUM(vol_cents) AS DOUBLE) AS mkt_share
        FROM flat GROUP BY o_year ORDER BY o_year
    """,
    survey_ref="§2C aggregations — TPC-H Q8: national market share "
    "(conditional-aggregate ratio) within a region/part-type segment",
    description="8-way join where every dim side broadcasts (part filtered "
    "to one type, customer semi-joined to one region) and lineitem⋈orders "
    "is the only shuffle; the share is a conditional-sum ratio computed "
    "in one grouped pass — exact integer cents until the final division",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_nations = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == "MEDIUM")
        .select("p_partkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    )
    li = load(spark, sf_dir, "lineitem")
    vol = _rev_cents()
    flat = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("vol_cents"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_7", F.col("vol_cents")).otherwise(
        F.lit(0)
    )
    return (
        flat.groupBy("o_year")
        .agg(
            (
                dsum(nation_vol).cast("double")
                / dsum(F.col("vol_cents")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle=f"""
        WITH flat AS (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {_REV_SQL} AS amount_cents
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_name LIKE '%widget%'
        )
        SELECT nation, o_year,
               CAST(SUM(amount_cents) AS DOUBLE) / 10000.0 AS sum_profit
        FROM flat GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    survey_ref="§2C aggregations — TPC-H Q9 shape (adapted: testdata has "
    "no ps_supplycost, so profit = discounted revenue; join tree and "
    "grouping preserved)",
    description="part-name substring filter broadcasts into the lineitem "
    "scan; supplier⋈nation broadcasts; lineitem⋈orders shuffles once on "
    "orderkey for the order-year column. Adaptation: amount omits the "
    "ps_supplycost·l_quantity term (no partsupp table in testdata) — the "
    "plan shape (filtered fact ⋈ fact ⋈ three broadcast dims → grouped "
    "agg) is Q9's",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_cents().alias("amount_cents"),
        )
        .groupBy("nation", "o_year")
        .agg((dsum(F.col("amount_cents")).cast("double") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q20_dominant_supplier",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle="""
        WITH shipped AS (
            SELECT l_suppkey, l_partkey,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
        ),
        tot AS (
            SELECT l_partkey AS pk, SUM(qty) AS total_qty
            FROM shipped GROUP BY l_partkey
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM shipped
        JOIN tot ON pk = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE CAST(qty AS DOUBLE) > 0.6 * CAST(total_qty AS DOUBLE)
        ORDER BY s_suppkey
    """,
    survey_ref="§2C aggregations + correlated threshold semi-join — TPC-H "
    "Q20 shape (adapted: ps_availqty > 0.5·shipped-qty becomes supplier's "
    "shipped share > 0.6 of the part's total — same aggregate-then-"
    "correlated-threshold plan)",
    description="one grouped pass builds per-(supplier, part) shipped "
    "quantity for the name-filtered parts; the per-part total reuses that "
    "aggregate (AQE reuses the exchange); the threshold compare is a "
    "partkey-local join; supplier names broadcast in at the end. "
    "Selects suppliers dominating ≥1 red part's 1996 supply",
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        shipped.join(tot, shipped["l_partkey"] == tot["pk"])
        .where(F.col("qty").cast("double") > 0.6 * F.col("total_qty").cast("double"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle="""
        WITH l1 AS (
            SELECT DISTINCT l_orderkey, l_suppkey, l_linestatus FROM lineitem
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE l1.l_linestatus = 'O' AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM l1 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l1 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_linestatus = 'O')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    survey_ref="§2C aggregations + EXISTS/NOT-EXISTS anti-join — TPC-H "
    "Q21 shape (adapted: no commit/receipt dates; the sole-blocking-"
    "supplier condition uses l_linestatus='O' on o_orderstatus='F' "
    "orders)",
    description="the hardest TPC-H join shape: per (order, supplier) "
    "pairs, keep those where ANOTHER supplier exists on the order (semi-"
    "join) but NO other supplier is also still-open (anti-join). Both "
    "correlations decorrelate into per-order aggregates over one "
    "DISTINCT (orderkey, suppkey, status) relation — a single orderkey "
    "shuffle feeds the pair relation, both exists-aggregates, and the "
    "final join; orders and supplier broadcast",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_linestatus")
        .distinct()
    )
    # per-order stats: distinct suppliers overall and distinct OPEN suppliers
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_linestatus") == "O", F.col("l_suppkey"))
        ).alias("n_open_supp"),
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # l1.l_linestatus='O', ≥2 suppliers on the order, and this supplier is
    # the ONLY open one (n_open_supp == 1 and this row is open)
    return (
        li.where(F.col("l_linestatus") == "O")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(per_order, li["l_orderkey"] == per_order["po_key"])
        .where((F.col("n_supp") >= 2) & (F.col("n_open_supp") == 1))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q11_important_stock",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle=f"""
        WITH value_per_part AS (
            SELECT l_partkey,
                   SUM({cents_sql("l_extendedprice")}) AS value_cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey,
               CAST(value_cents AS DOUBLE) / 100.0 AS part_value
        FROM value_per_part
        WHERE CAST(value_cents AS DOUBLE) >
              0.001 * (SELECT CAST(SUM(value_cents) AS DOUBLE)
                       FROM value_per_part)
        ORDER BY part_value DESC, p_partkey
    """,
    survey_ref="§2C aggregations + HAVING-over-global-scalar-subquery — "
    "TPC-H Q11 shape (adapted: partsupp supplycost·availqty value becomes "
    "revenue per part from one nation's suppliers — testdata has no "
    "partsupp)",
    description="per-part value for one nation's suppliers (nation semi-"
    "join broadcasts into the fact scan), then keep parts above a "
    "fraction of the GLOBAL total: the scalar subquery is a 1-row "
    "aggregate broadcast against the per-part aggregate, and AQE reuses "
    "the per-part exchange for both sides — the fact table shuffles once",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("price_cents")
    )
    per_part = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(dsum(F.col("price_cents")).alias("value_cents"))
    )
    total = per_part.agg(
        F.sum("value_cents").cast("double").alias("total_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("value_cents").cast("double") > 0.001 * F.col("total_value")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q12_late_shipping",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate >  o_orderdate + INTERVAL 90 DAY
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    survey_ref="§2C aggregations + conditional counts — TPC-H Q12 shape "
    "(adapted: shipmode → returnflag categorical, commit/receipt lateness "
    "→ shipped ≥90 days after order date — testdata has no "
    "shipmode/commitdate/receiptdate)",
    description="lineitem⋈orders on orderkey is the single shuffle; the "
    "lateness predicate (shipdate > orderdate + 90d) is evaluated post-"
    "join as pure codegen date math; both priority classes count in one "
    "grouped pass (no second scan, no pivot shuffle)",
)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
