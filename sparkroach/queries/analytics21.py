"""Round-4 continuation (wave 11): certified approximate quantiles,
containment (overlap-coefficient) dedup scoring, contrastive triplet
mining, and calendar seasonality.

- ``events_approx_quantile_check``: gates Spark's NATIVE
  ``percentile_approx`` (the Greenwald-Khanna sketch the engine offers
  for quantiles too hot for exact computation) with a CERTIFIED claim:
  the approximate median of value-cents must land inside the exact
  [p40, p60] rank band, where p40/p60 are computed by integer-rank
  selection (rank ceil(0.4 n) / ceil(0.6 n) per group — no float
  percentile math anywhere).  At accuracy=100 the GK guarantee is a
  1 % rank error, 25x tighter than the band, so the claim is a
  theorem; the DuckDB oracle computes the same exact band and asserts
  the claim as a constant — if the sketch ever returned a value
  outside the band, the hash breaks.  Same property-gate pattern as
  est >= exact in ``cms_join_size_estimate``.

- ``doc_containment_pairs``: overlap-coefficient scoring over the
  capped LSH candidates — containment = |A ∩ B| / min(|A|, |B|) on
  distinct shingle sets.  This is the near-CONTAINMENT detector
  (a short doc quoted whole inside a long one scores low Jaccard but
  containment 1.0 — the case pure-Jaccard dedup systematically
  misses).  The flag is integer cross-multiplied (inter*10 >=
  9*min(na,nb)), so no float literal crosses the engine boundary.

- ``embedding_triplet_mining``: the contrastive-training artifact —
  per anchor vector, (hardest positive, easiest negative) from the
  same capped within-IVF-cluster scored pairs that feed the kNN graph
  and DBSCAN: positive = max-cosine partner, negative = min-cosine
  partner (ties broken by id), kept only when the margin is strictly
  positive.  One symmetrized pair table, two rank windows — nothing
  quadratic, and the pair stage is shared (materialized) with the
  graph operators.

- ``orders_monthly_seasonality``: month-truncated revenue with a
  year-over-year comparison — lag(1) over PARTITION BY month-of-year
  ORDER BY year (no global-order single-task window).  Revenue is
  exact integer cents (round(o_totalprice*100), the analytics15
  discipline); the YoY ratio is one IEEE division of exact integers.

All gated=False on registration (window full): r5/r6 rotation
candidates, swept by the local oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.llm_ops import (
    _lsh_candidate_pairs,
    _lsh_candidates_cte,
    _with_shingles,
)
from sparkroach.queries.llm_ops4 import _knn_pairs_sql, _knn_scored_pairs
from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# certified approximate quantiles
# ---------------------------------------------------------------------------

PA_ACCURACY = 100  # percentile_approx accuracy: 1% rank-error guarantee


@register(
    "events_approx_quantile_check",
    gated=False,
    oracle="""
        WITH e AS (SELECT event_type,
                          CAST(floor(value * 100) AS BIGINT) AS cents
                   FROM events),
        r AS (SELECT event_type, cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY cents) AS rn
              FROM e),
        n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
        q AS (SELECT r.event_type,
                     MAX(CASE WHEN rn = (4 * n.n + 9) // 10
                              THEN cents END) AS p40,
                     MAX(CASE WHEN rn = (6 * n.n + 9) // 10
                              THEN cents END) AS p60
              FROM r JOIN n USING (event_type) GROUP BY 1)
        SELECT q.event_type,
               CAST(n.n AS BIGINT) AS n_events,
               CAST(q.p40 AS BIGINT) AS p40_cents,
               CAST(q.p60 AS BIGINT) AS p60_cents,
               CAST(1 AS BIGINT) AS approx_in_band
        FROM q JOIN n USING (event_type)
        ORDER BY event_type
    """,
    survey_ref="§2C sketches — certified approximate quantiles: Spark's "
    "native percentile_approx (GK sketch) pinned inside the exact "
    "integer-rank [p40, p60] band; the oracle asserts the claim as a "
    "constant, so a wild sketch breaks the hash (the est>=exact "
    "property-gate pattern)",
    description=f"per event type: exact p40/p60 of value-cents by "
    "integer-rank selection (rank ceil(0.4n)/ceil(0.6n) — ties share "
    "the value, so tie order cannot change the result) and the claim "
    f"that percentile_approx(cents, 0.5, {PA_ACCURACY}) lands inside "
    "the band. The GK guarantee at this accuracy is a 1% rank error, "
    "25x tighter than the 10% band — the claim is a theorem, and the "
    "gate certifies the engine honors it",
)
def events_approx_quantile_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    r = e.withColumn("rn", F.row_number().over(w))
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile_approx("cents", 0.5, PA_ACCURACY).alias("approx"),
    )
    q = (
        r.join(stats.select("event_type", "n"), "event_type")
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.floor((4 * F.col("n") + 9) / 10),
                    F.col("cents"),
                )
            ).alias("p40"),
            F.max(
                F.when(
                    F.col("rn") == F.floor((6 * F.col("n") + 9) / 10),
                    F.col("cents"),
                )
            ).alias("p60"),
        )
    )
    return (
        q.join(stats, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("p40").cast("long").alias("p40_cents"),
            F.col("p60").cast("long").alias("p60_cents"),
            (
                (F.col("approx") >= F.col("p40"))
                & (F.col("approx") <= F.col("p60"))
            )
            .cast("long")
            .alias("approx_in_band"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# containment (overlap coefficient) over LSH candidates
# ---------------------------------------------------------------------------


@register(
    "doc_containment_pairs",
    gated=False,
    oracle=f"""
        {_lsh_candidates_cte()},
        sz AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n
               FROM shing),
        i AS (SELECT c.doc_a, c.doc_b,
                     CAST(len(list_filter(sa.shingles,
                              x -> list_contains(sb.shingles, x)))
                          AS BIGINT) AS inter
              FROM cand c JOIN shing sa ON sa.doc_id = c.doc_a
                          JOIN shing sb ON sb.doc_id = c.doc_b)
        SELECT i.doc_a, i.doc_b, i.inter,
               na.n AS n_a, nb.n AS n_b,
               CAST(i.inter AS DOUBLE) / LEAST(na.n, nb.n) AS containment,
               CAST(CASE WHEN i.inter * 10 >= 9 * LEAST(na.n, nb.n)
                         THEN 1 ELSE 0 END AS BIGINT) AS near_containment
        FROM i JOIN sz na ON na.doc_id = i.doc_a
               JOIN sz nb ON nb.doc_id = i.doc_b
        ORDER BY doc_a, doc_b
    """,
    survey_ref="§2C dedup — containment / overlap coefficient on LSH "
    "candidates: |A∩B| / min(|A|,|B|) flags near-containment (short doc "
    "quoted inside a long one) that symmetric Jaccard misses",
    description="overlap coefficient on distinct shingle sets for every "
    "capped LSH candidate pair: exact integer intersection and set "
    "sizes, one IEEE division for the score, and the >=90% flag "
    "cross-multiplied in integers (inter*10 >= 9*min) so no float "
    "literal crosses engines. Candidates always have >=1 shingle (docs "
    "without shingles emit no bands), so min(n_a, n_b) > 0",
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cand = _lsh_candidate_pairs(d)
    sh = _with_shingles(d).localCheckpoint(eager=True)
    sa = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    na = F.size("sh_a").cast("long")
    nb = F.size("sh_b").cast("long")
    mn = F.least(na, nb)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("inter"),
            na.alias("n_a"),
            nb.alias("n_b"),
            (inter.cast("double") / mn).alias("containment"),
            (inter.cast("long") * 10 >= 9 * mn)
            .cast("long")
            .alias("near_containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# contrastive triplet mining over the within-cluster scored pairs
# ---------------------------------------------------------------------------


@register(
    "embedding_triplet_mining",
    gated=False,
    oracle=f"""
        WITH {_knn_pairs_sql().strip()},
        sym AS (
            SELECT a_id AS vec_id, b_id AS nbr_id, cosine FROM pairs
            UNION ALL
            SELECT b_id, a_id, cosine FROM pairs
        ),
        rk AS (SELECT vec_id, nbr_id, cosine,
                      row_number() OVER (PARTITION BY vec_id
                          ORDER BY cosine DESC, nbr_id) AS rpos,
                      row_number() OVER (PARTITION BY vec_id
                          ORDER BY cosine ASC, nbr_id) AS rneg
               FROM sym),
        pos AS (SELECT vec_id, nbr_id AS pos_id, cosine AS pos_cos
                FROM rk WHERE rpos = 1),
        neg AS (SELECT vec_id, nbr_id AS neg_id, cosine AS neg_cos
                FROM rk WHERE rneg = 1)
        SELECT p.vec_id AS anchor_id, p.pos_id, n.neg_id,
               p.pos_cos, n.neg_cos,
               p.pos_cos - n.neg_cos AS margin
        FROM pos p JOIN neg n ON n.vec_id = p.vec_id
        WHERE p.pos_cos > n.neg_cos
        ORDER BY anchor_id
    """,
    survey_ref="LLM ops: contrastive triplet mining — per anchor vector "
    "the (hardest positive, easiest negative) pair from the capped "
    "within-IVF-cluster scored pairs (the kNN-graph/DBSCAN stage, "
    "shared and materialized)",
    description="(anchor, positive, negative) training triplets: "
    "positive = the anchor's max-cosine within-cluster partner, "
    "negative = its min-cosine partner (ties -> min id), kept only "
    "when margin = pos_cos - neg_cos is strictly positive (an anchor "
    "whose partners all tie yields no triplet). Cosines are the "
    "ROUND(.,6) exact-match values; the margin is one IEEE "
    "subtraction of them. Two rank windows over one symmetrized "
    "pair table — nothing quadratic at any corpus size",
)
def embedding_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _knn_scored_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("a_id").alias("vec_id"), F.col("b_id").alias("nbr_id"), "cosine"
    ).unionByName(
        pairs.select(
            F.col("b_id").alias("vec_id"),
            F.col("a_id").alias("nbr_id"),
            "cosine",
        )
    )
    wpos = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id")
    )
    wneg = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").asc(), F.col("nbr_id")
    )
    rk = sym.select(
        "vec_id",
        "nbr_id",
        "cosine",
        F.row_number().over(wpos).alias("rpos"),
        F.row_number().over(wneg).alias("rneg"),
    )
    pos = rk.where(F.col("rpos") == 1).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("nbr_id").alias("pos_id"),
        F.col("cosine").alias("pos_cos"),
    )
    neg = rk.where(F.col("rneg") == 1).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("nbr_id").alias("neg_id"),
        F.col("cosine").alias("neg_cos"),
    )
    return (
        pos.join(neg, "anchor_id")
        .where(F.col("pos_cos") > F.col("neg_cos"))
        .select(
            "anchor_id",
            "pos_id",
            "neg_id",
            "pos_cos",
            "neg_cos",
            (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# calendar seasonality: month revenue + year-over-year lag
# ---------------------------------------------------------------------------


@register(
    "orders_monthly_seasonality",
    gated=False,
    oracle="""
        WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                          CAST(month(o_orderdate) AS BIGINT) AS mo,
                          CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        rev AS (SELECT yr, mo,
                       CAST(COUNT(*) AS BIGINT) AS n_orders,
                       CAST(SUM(cents) AS BIGINT) AS revenue_cents
                FROM m GROUP BY yr, mo),
        l AS (SELECT yr, mo, n_orders, revenue_cents,
                     lag(revenue_cents) OVER (PARTITION BY mo ORDER BY yr)
                         AS prev_year_cents
              FROM rev)
        SELECT yr, mo, n_orders, revenue_cents, prev_year_cents,
               CASE WHEN prev_year_cents IS NULL THEN NULL
                    ELSE CAST(revenue_cents AS DOUBLE) / prev_year_cents
               END AS yoy_ratio
        FROM l ORDER BY yr, mo
    """,
    survey_ref="§2C time series — calendar seasonality: month-truncated "
    "revenue with a year-over-year lag partitioned BY month-of-year "
    "(no global-order single-task window)",
    description="monthly order revenue in exact integer cents "
    "(round(o_totalprice*100), the analytics15 discipline) with the "
    "same month's prior-year revenue via lag(1) over PARTITION BY "
    "month ORDER BY year, and the YoY ratio as one IEEE division of "
    "exact integers (NULL for first-seen months)",
)
def orders_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rev = o.groupBy("yr", "mo").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w = Window.partitionBy("mo").orderBy("yr")
    return (
        rev.withColumn(
            "prev_year_cents", F.lag("revenue_cents").over(w).cast("long")
        )
        .withColumn(
            "yoy_ratio",
            F.col("revenue_cents").cast("double") / F.col("prev_year_cents"),
        )
        .orderBy("yr", "mo")
    )
