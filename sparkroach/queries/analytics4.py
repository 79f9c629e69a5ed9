"""Relational breadth set 4: multi-nation join chains, conditional-share
aggregation, anti-join + count-distinct reporting, disjunctive-predicate
scans.

TPC-H Q7/Q14/Q16/Q19 shapes adapted to the driver testdata's simplified
columns (no partsupp/l_shipmode/p_container; lineitem links part→supplier,
a negative supplier balance stands in for Q16's complaint filter).  Like
analytics3.py these are registered gated=False — the driver's 50-entry
window is full — but every oracle runs in the local sweep
(tests/test_oracle_gate.py, `python -m sparkroach.oracle`).

Money math follows the integer-cents discipline of analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.analytics import cents, cents_sql, dsum
from sparkroach.queries.registry import register
from sparkroach.tables import load


@register(
    "q7_volume_shipping",
    # r3: rotated INTO the driver gate window (never driver-recorded in r1/r2)
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM({cents_sql("l_extendedprice")}
                        * (100 - {cents_sql("l_discount")})) AS DOUBLE) / 10000.0
                   AS revenue
        FROM lineitem, orders, customer, supplier, nation n1, nation n2
        WHERE l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_11')
            OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_7'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    survey_ref="§2C joins: 6-way chain with a symmetric nation-pair "
    "predicate — TPC-H Q7 adapted (supplier linked via l_suppkey)",
    description="bilateral shipping volume NATION_7↔NATION_11 by year: the fact "
    "table shuffles once per fact-fact join; all four dimension joins "
    "broadcast, and the nation-pair disjunction prunes both dim sides "
    "before the join",
    gated=False,  # rotated out r4: driver-recorded green in r1-r3, oracle unchanged
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join order at scale: lineitem (date-pruned scan) ⋈ orders is the one
    # big shuffle pair; customer joins the result on custkey (second
    # shuffle).  supplier and both nation copies BROADCAST — and the
    # nation filter is applied BEFORE the join, so the supplier/customer
    # broadcast sides carry only the two nations' keys (semi-join
    # reduction of the fact stream for free).
    n = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_7", "NATION_11")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("disc"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((dsum(F.col("disc")).cast("double") / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q14_promo_revenue",
    # r3: rotated INTO the driver gate window (never driver-recorded in r1/r2)
    oracle=f"""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN {cents_sql("l_extendedprice")}
                                  * (100 - {cents_sql("l_discount")})
                             ELSE 0 END) AS DOUBLE) * 100.0
               / CAST(SUM({cents_sql("l_extendedprice")}
                          * (100 - {cents_sql("l_discount")})) AS DOUBLE)
                   AS promo_pct,
               CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN {cents_sql("l_extendedprice")}
                                  * (100 - {cents_sql("l_discount")})
                             ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
               CAST(SUM({cents_sql("l_extendedprice")}
                        * (100 - {cents_sql("l_discount")})) AS DOUBLE) / 10000.0
                   AS total_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    survey_ref="§2C aggregations: conditional share-of-total in one pass — "
    "TPC-H Q14 adapted (p_type equality, testdata types are single words)",
    description="promo revenue share for one month: date-pruned lineitem "
    "scan, part broadcast, both the conditional and total sum computed in "
    "the same partial-agg pass — no second scan for the denominator",
    gated=False,  # rotated out r4: driver-recorded green in r1-r3, oracle unchanged
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).select(
        "l_partkey",
        (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("disc"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = dsum(
        F.when(F.col("p_type") == "PROMO", F.col("disc")).otherwise(F.lit(0))
    ).cast("double")
    total = dsum(F.col("disc")).cast("double")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (promo * 100.0 / total).alias("promo_pct"),
            (promo / 10000.0).alias("promo_revenue"),
            (total / 10000.0).alias("total_revenue"),
        )
    )


_Q16_SIZES = (1, 9, 17, 25, 33, 41, 49)


@register(
    "q16_supplier_part_count",
    # r3: rotated INTO the driver gate window (never driver-recorded in r1/r2)
    oracle=f"""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part, lineitem
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#13'
          AND p_size IN {_Q16_SIZES}
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    survey_ref="§2C set ops + aggregations: NOT-IN anti-join + grouped "
    "count-distinct — TPC-H Q16 adapted (lineitem links part→supplier, "
    "negative acctbal stands in for the complaints filter)",
    description="supplier diversity per (brand, type, size): filtered part "
    "broadcast onto lineitem, bad suppliers removed by a broadcast "
    "anti-join, count-distinct expands to Spark's two-phase partial "
    "distinct (skew-safe for low-cardinality groups)",
    gated=False,  # rotated out r4: driver-recorded green in r1-r3, oracle unchanged
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Anti-join side (suppliers with negative balance) is tiny → broadcast
    # left_anti keeps lineitem unshuffled until the distinct.  The grouped
    # COUNT(DISTINCT) plans as expand → partial-distinct → final agg, so a
    # hot (brand,type,size) cell never funnels raw rows to one reducer.
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size").isin(*_Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q19_disjunctive_revenue",
    # r3: rotated INTO the driver gate window (never driver-recorded in r1/r2)
    oracle=f"""
        SELECT CAST(SUM({cents_sql("l_extendedprice")}
                        * (100 - {cents_sql("l_discount")})) AS DOUBLE) / 10000.0
                   AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity >= 1 AND l_quantity <= 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity >= 10 AND l_quantity <= 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity >= 20 AND l_quantity <= 30))
    """,
    survey_ref="§2C predicates: three-branch disjunction across both join "
    "sides — TPC-H Q19 adapted (no p_container/l_shipmode in testdata)",
    description="disjunctive-predicate revenue: Catalyst factors the "
    "cross-side OR into per-table residuals (part scan keeps only the "
    "three brands, lineitem only the quantity hull) before the broadcast "
    "join evaluates the full disjunction",
    gated=False,  # rotated out r4: driver-recorded green in r1-r3, oracle unchanged
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("disc"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg((dsum(F.col("disc")).cast("double") / 10000.0).alias("revenue"))
    )
