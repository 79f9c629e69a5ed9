"""Warehouse/governance breadth, round-4 continuation (wave 9):
gaps-and-islands streaks, bitmap-index day intersection, exact dyadic
EWMA smoothing, changed-bucket table diff (the delta-sync primitive),
a k-anonymity generalization ladder, and CMS inner-product join-size
estimation.

- ``events_active_day_streaks``: the classic gaps-and-islands shape —
  per-user runs of CONSECUTIVE active calendar days via the
  day_idx − row_number() grouping trick.  Two windowed passes over one
  user_id shuffle; day indexing is integer epoch-day so both engines
  bucket identically.

- ``user_activity_bitmap_pairs``: the bitmap-index pattern — each
  user's active days packed into ONE BIGINT (62-day wheel; the corpus
  spans 30 days, so no folding occurs at any SF and the bitmap is
  lossless), per-user bitmaps OR-merged map-side, then day-overlap of
  the top-8 most-active users computed with pure bit arithmetic
  (AND/OR + popcount).  This is how engines like Druid/Pinot evaluate
  audience-overlap queries without touching raw rows: the 100 TB story
  is one 8-byte word per (user, 62-day window) instead of one row per
  event, mergeable by OR.

- ``events_ewma_dyadic``: trailing exponentially weighted moving
  average with dyadic weights 1/2, 1/4, …, 1/256 over the last 8
  events per user.  Every weight is a power of two, so each scaled
  term is IEEE-EXACT (mantissa unchanged, exponent shifted), and the
  8-term addition order is fixed syntactically on both sides — the
  whole smoother is bit-identical across engines with no decimal
  detour.  Rows without 8 predecessors are excluded (no renormalized
  partial weights — renormalization would divide by non-powers of
  two and break exactness).

- ``table_diff_buckets``: the delta-sync / anti-entropy primitive
  (rsync in table space): version B of the corpus is derived from A by
  deterministic hash rules (drop ~1/97, rewrite ~1/101, insert ~1/103
  re-keyed), both versions reduce to per-bucket (row-hash sum, count)
  checksums, and ROW-LEVEL diffing is performed only inside buckets
  whose checksums disagree — clean buckets are certified by 16 bytes
  of state and never rejoined.  At 100 TB this is the shape of
  incremental replication between the chain store and a mirror: the
  reference ships every round (conduit exporter); this operator is how
  a columnar deployment would RECONCILE after a missed window.

- ``customer_k_anonymity_ladder``: privacy-governance shape — rows at
  risk (equivalence class < k=5 over quasi-identifiers) across four
  generalization levels of (nation, segment, acctbal-bucket), computed
  in ONE scan by exploding each row into its per-level QI key.  The
  bucket ladders are nested (500-buckets union into 2000-buckets), so
  risk is provably monotone non-increasing up the ladder — pinned in
  tests.

- ``cms_join_size_estimate``: join-cardinality estimation from
  mergeable sketches — the Count-Min INNER PRODUCT Σ_b cmsA[j][b] ×
  cmsB[j][b] upper-bounds |A ⋈ B| for every hash row j (take the min).
  All counters are exact integers, so both engines agree bit-for-bit,
  and est ≥ exact is a theorem (collisions only add).  This is the
  statistic a distributed optimizer computes from per-partition
  sketches (merged by ADDITION) without ever joining the tables.

All gated=False on registration: r5/r6 rotation candidates, swept by
the local oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.analytics11 import _th32_col, _th32_sql
from sparkroach.queries.registry import register
from sparkroach.tables import load

US_PER_DAY = 86_400_000_000

# ---------------------------------------------------------------------------
# gaps-and-islands: consecutive active-day streaks
# ---------------------------------------------------------------------------


@register(
    "events_active_day_streaks",
    gated=False,
    oracle=f"""
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts::TIMESTAMP) // {US_PER_DAY} AS day
                   FROM events),
        r AS (SELECT user_id, day,
                     row_number() OVER (PARTITION BY user_id ORDER BY day)
                         AS rn
              FROM d),
        s AS (SELECT user_id, day - rn AS grp, COUNT(*) AS len
              FROM r GROUP BY user_id, day - rn)
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS active_days,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               CAST(MAX(len) AS BIGINT) AS longest_streak
        FROM s GROUP BY user_id ORDER BY user_id
    """,
    survey_ref="§2C event analytics — gaps-and-islands: per-user runs of "
    "consecutive active days via the day − row_number() grouping trick",
    description="per-user activity streaks: distinct active epoch-days, "
    "islands found as day − row_number() constancy, then per-island "
    "lengths rolled up to (active_days, n_streaks, longest_streak). "
    "Integer day indexing; one user_id shuffle feeds both windows",
)
def events_active_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    s = (
        d.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id", (F.col("day") - F.col("rn")).alias("grp"))
        .agg(F.count("*").alias("len"))
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("active_days"),
            F.count("*").cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# bitmap index: per-user day bitmaps, top-8 pairwise overlap
# ---------------------------------------------------------------------------

WHEEL = 62  # < 63 so 1::BIGINT << w never touches the sign bit
TOP_USERS = 8


@register(
    "user_activity_bitmap_pairs",
    gated=False,
    oracle=f"""
        WITH d AS (SELECT DISTINCT user_id,
                          CAST(epoch_us(ts::TIMESTAMP) // {US_PER_DAY}
                               AS BIGINT) % {WHEEL} AS wheel
                   FROM events),
        bm AS (SELECT user_id,
                      bit_or(1::BIGINT << CAST(wheel AS INT)) AS bmp
               FROM d GROUP BY user_id),
        top8 AS (SELECT user_id FROM events GROUP BY user_id
                 ORDER BY COUNT(*) DESC, user_id LIMIT {TOP_USERS}),
        t AS (SELECT bm.user_id, bm.bmp FROM bm JOIN top8 USING (user_id))
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               CAST(bit_count(a.bmp) AS BIGINT) AS days_a,
               CAST(bit_count(b.bmp) AS BIGINT) AS days_b,
               CAST(bit_count(a.bmp & b.bmp) AS BIGINT) AS common_days,
               CAST(bit_count(a.bmp | b.bmp) AS BIGINT) AS union_days,
               CAST(bit_count(a.bmp & b.bmp) AS DOUBLE)
                   / bit_count(a.bmp | b.bmp) AS day_jaccard
        FROM t a JOIN t b ON a.user_id < b.user_id
        ORDER BY user_a, user_b
    """,
    survey_ref="§2C bitmap index — per-user day-activity bitmaps packed "
    "into one BIGINT, OR-merged, audience overlap via AND/popcount "
    "(Druid/Pinot audience-overlap shape)",
    description=f"active days per user packed into a {WHEEL}-day-wheel "
    "BIGINT bitmap (corpus spans 30 days: lossless at every SF), bitmaps "
    "bit_or-merged map-side, then the top-8 most-active users' pairwise "
    "day overlap/Jaccard computed with pure bit arithmetic — 28 pairs "
    "from 8 words instead of a row-level self-join",
)
def user_activity_bitmap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        (F.expr(f"unix_micros(ts) div {US_PER_DAY}") % WHEEL).alias("wheel"),
    ).distinct()
    bm = d.select(
        "user_id",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(wheel AS INT))").alias(
            "bit"
        ),
    ).groupBy("user_id").agg(F.bit_or("bit").alias("bmp"))
    top8 = (
        ev.groupBy("user_id")
        .count()
        .orderBy(F.desc("count"), "user_id")
        .limit(TOP_USERS)
        .select("user_id")
    )
    t = bm.join(F.broadcast(top8), "user_id")
    a = t.select(F.col("user_id").alias("user_a"), F.col("bmp").alias("ba"))
    b = t.select(F.col("user_id").alias("user_b"), F.col("bmp").alias("bb"))
    inter = F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))).cast("long")
    union = F.bit_count(F.col("ba").bitwiseOR(F.col("bb"))).cast("long")
    # 8 x 8 broadcast pair join: BNLJ over a constant-bounded build side
    # (documented in tests/test_plans.py _SCALAR_BNLJ_OK)
    return (
        a.join(F.broadcast(b), F.col("user_a") < F.col("user_b"))
        .select(
            "user_a",
            "user_b",
            F.bit_count("ba").cast("long").alias("days_a"),
            F.bit_count("bb").cast("long").alias("days_b"),
            inter.alias("common_days"),
            union.alias("union_days"),
            (inter.cast("double") / union).alias("day_jaccard"),
        )
        .orderBy("user_a", "user_b")
    )


# ---------------------------------------------------------------------------
# exact dyadic EWMA
# ---------------------------------------------------------------------------

EWMA_TAPS = 8  # weights 1/2 .. 1/256


@register(
    "events_ewma_dyadic",
    gated=False,
    oracle=f"""
        WITH e AS (SELECT event_id, user_id, value,
                          epoch_us(ts::TIMESTAMP) AS t_us FROM events),
        l AS (SELECT event_id, user_id,
                     value AS v0,
                     lag(value, 1) OVER w AS v1,
                     lag(value, 2) OVER w AS v2,
                     lag(value, 3) OVER w AS v3,
                     lag(value, 4) OVER w AS v4,
                     lag(value, 5) OVER w AS v5,
                     lag(value, 6) OVER w AS v6,
                     lag(value, 7) OVER w AS v7,
                     row_number() OVER w AS rn
              FROM e
              WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
        SELECT event_id, user_id,
               v0/2 + v1/4 + v2/8 + v3/16 + v4/32 + v5/64 + v6/128 + v7/256
                   AS ewma
        FROM l WHERE rn >= {EWMA_TAPS} ORDER BY event_id
    """,
    survey_ref="§2C time series — trailing EWMA smoother with dyadic "
    "weights: every term is an exact power-of-two scaling, so the float "
    "result is bit-identical across engines",
    description="per-user trailing-8 exponentially weighted moving "
    "average, weights 1/2..1/256: dividing a double by a power of two "
    "only shifts the exponent (IEEE-exact), and the 8-term addition "
    "order is fixed syntactically on both sides, so no decimal detour "
    "is needed. Rows with fewer than 8 predecessors are excluded rather "
    "than renormalized (renormalization divides by non-powers-of-two)",
)
def events_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    lagged = e.select(
        "event_id",
        "user_id",
        F.col("value").alias("v0"),
        *[
            F.lag("value", i).over(w).alias(f"v{i}")
            for i in range(1, EWMA_TAPS)
        ],
        F.row_number().over(w).alias("rn"),
    )
    ewma = F.col("v0") / 2
    for i in range(1, EWMA_TAPS):
        ewma = ewma + F.col(f"v{i}") / (2 ** (i + 1))
    return (
        lagged.where(F.col("rn") >= EWMA_TAPS)
        .select("event_id", "user_id", ewma.alias("ewma"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# changed-bucket table diff (delta-sync)
# ---------------------------------------------------------------------------

DIFF_BUCKETS = 64
REMOVE_MOD = 97
MODIFY_MOD = 101
ADD_MOD = 103
ADD_OFFSET = 10_000_000


def _diff_oracle() -> str:
    h_id = _th32_sql("CAST(doc_id AS VARCHAR)")
    h_bkt = _th32_sql("CAST(doc_id AS VARCHAR) || '#b'")
    h_row = _th32_sql("CAST(doc_id AS VARCHAR) || '|' || text")
    return f"""
        WITH a0 AS (SELECT doc_id, text, {h_id} AS hmut FROM documents),
        a AS (SELECT doc_id, text, {h_bkt} % {DIFF_BUCKETS} AS bucket,
                     {h_row} AS rh, hmut
              FROM a0),
        braw AS (
            SELECT doc_id,
                   CASE WHEN hmut % {MODIFY_MOD} = 0
                        THEN text || ' (rev2)' ELSE text END AS text
            FROM a WHERE hmut % {REMOVE_MOD} <> 0
            UNION ALL
            SELECT doc_id + {ADD_OFFSET}, text
            FROM a WHERE hmut % {ADD_MOD} = 0
        ),
        b AS (SELECT doc_id, text, {h_bkt} % {DIFF_BUCKETS} AS bucket,
                     {h_row} AS rh
              FROM braw),
        ca AS (SELECT bucket, SUM(rh) AS s, COUNT(*) AS n
               FROM a GROUP BY bucket),
        cb AS (SELECT bucket, SUM(rh) AS s, COUNT(*) AS n
               FROM b GROUP BY bucket),
        ch AS (SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
                      CASE WHEN ca.s IS DISTINCT FROM cb.s
                             OR ca.n IS DISTINCT FROM cb.n
                           THEN 1 ELSE 0 END AS changed
               FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
        aa AS (SELECT a.doc_id, a.rh, a.bucket FROM a
               JOIN ch ON a.bucket = ch.bucket AND ch.changed = 1),
        bb AS (SELECT b.doc_id, b.rh, b.bucket FROM b
               JOIN ch ON b.bucket = ch.bucket AND ch.changed = 1),
        diff AS (SELECT COALESCE(aa.bucket, bb.bucket) AS bucket,
                        CASE WHEN aa.doc_id IS NULL THEN 'added'
                             WHEN bb.doc_id IS NULL THEN 'removed'
                             WHEN aa.rh <> bb.rh THEN 'modified'
                        END AS st
                 FROM aa FULL OUTER JOIN bb ON aa.doc_id = bb.doc_id)
        SELECT ch.bucket,
               CASE WHEN ch.changed = 1 THEN 'changed' ELSE 'clean' END
                   AS status,
               CAST(COALESCE(SUM(CASE WHEN st = 'added' THEN 1 END), 0)
                    AS BIGINT) AS n_added,
               CAST(COALESCE(SUM(CASE WHEN st = 'removed' THEN 1 END), 0)
                    AS BIGINT) AS n_removed,
               CAST(COALESCE(SUM(CASE WHEN st = 'modified' THEN 1 END), 0)
                    AS BIGINT) AS n_modified
        FROM ch LEFT JOIN diff ON ch.bucket = diff.bucket
        GROUP BY ch.bucket, ch.changed ORDER BY ch.bucket
    """


@register(
    "table_diff_buckets",
    gated=False,
    oracle=_diff_oracle(),
    survey_ref="§2C replication — changed-bucket table diff: per-bucket "
    "checksum comparison certifies clean buckets from 16 bytes of state; "
    "row-level reconciliation only inside disagreeing buckets (the "
    "delta-sync primitive behind incremental mirror repair)",
    description=f"version B of the corpus derives from A by hash rules "
    f"(drop 1/{REMOVE_MOD}, rewrite 1/{MODIFY_MOD}, insert re-keyed "
    f"1/{ADD_MOD}); both versions reduce to {DIFF_BUCKETS} per-bucket "
    "(row-hash sum, count) checksums, and the full-outer row diff runs "
    "ONLY over buckets whose checksums disagree — per-bucket "
    "added/removed/modified counts, clean buckets certified untouched",
)
def table_diff_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def hashed(df: DataFrame) -> DataFrame:
        sid = F.col("doc_id").cast("string")
        return df.select(
            "doc_id",
            "text",
            F.pmod(_th32_col(F.concat(sid, F.lit("#b"))), DIFF_BUCKETS).alias(
                "bucket"
            ),
            _th32_col(F.concat(sid, F.lit("|"), F.col("text"))).alias("rh"),
        )

    a0 = d.withColumn(
        "hmut", _th32_col(F.col("doc_id").cast("string"))
    ).localCheckpoint(eager=True)  # feeds both B derivation and A checksums
    a = hashed(a0)
    b = hashed(
        a0.where(F.col("hmut") % REMOVE_MOD != 0)
        .select(
            "doc_id",
            F.when(
                F.col("hmut") % MODIFY_MOD == 0,
                F.concat(F.col("text"), F.lit(" (rev2)")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionAll(
            a0.where(F.col("hmut") % ADD_MOD == 0).select(
                (F.col("doc_id") + ADD_OFFSET).alias("doc_id"), "text"
            )
        )
    )

    def checks(df: DataFrame) -> DataFrame:
        return df.groupBy("bucket").agg(
            F.sum("rh").alias("s"), F.count("*").alias("n")
        )

    ca, cb = checks(a), checks(b)
    ch = (
        ca.alias("ca")
        .join(cb.alias("cb"), F.col("ca.bucket") == F.col("cb.bucket"), "full")
        .select(
            F.coalesce(F.col("ca.bucket"), F.col("cb.bucket")).alias("bucket"),
            F.when(
                F.col("ca.s").eqNullSafe(F.col("cb.s"))
                & F.col("ca.n").eqNullSafe(F.col("cb.n")),
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("changed"),
        )
        .localCheckpoint(eager=True)  # small; gates the row-level diff twice
    )
    changed = F.broadcast(ch.where(F.col("changed") == 1).select("bucket"))
    aa = a.join(changed, "bucket").select("bucket", "doc_id", "rh")
    bb = b.join(changed, "bucket").select("bucket", "doc_id", "rh")
    diff = (
        aa.alias("aa")
        .join(bb.alias("bb"), F.col("aa.doc_id") == F.col("bb.doc_id"), "full")
        .select(
            F.coalesce(F.col("aa.bucket"), F.col("bb.bucket")).alias("bucket"),
            F.when(F.col("aa.doc_id").isNull(), F.lit("added"))
            .when(F.col("bb.doc_id").isNull(), F.lit("removed"))
            .when(F.col("aa.rh") != F.col("bb.rh"), F.lit("modified"))
            .alias("st"),
        )
    )
    return (
        ch.join(diff, "bucket", "left")
        .groupBy("bucket", "changed")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("st") == "added", 1)), F.lit(0)
            ).cast("long").alias("n_added"),
            F.coalesce(
                F.sum(F.when(F.col("st") == "removed", 1)), F.lit(0)
            ).cast("long").alias("n_removed"),
            F.coalesce(
                F.sum(F.when(F.col("st") == "modified", 1)), F.lit(0)
            ).cast("long").alias("n_modified"),
        )
        .select(
            "bucket",
            F.when(F.col("changed") == 1, F.lit("changed"))
            .otherwise(F.lit("clean"))
            .alias("status"),
            "n_added",
            "n_removed",
            "n_modified",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder
# ---------------------------------------------------------------------------

K_ANON = 5


def _kanon_oracle() -> str:
    levels = {
        0: "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' || "
        "CAST(CAST(floor(c_acctbal / 500) AS BIGINT) AS VARCHAR)",
        1: "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' || "
        "CAST(CAST(floor(c_acctbal / 2000) AS BIGINT) AS VARCHAR)",
        2: "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment",
        3: "CAST(c_nationkey AS VARCHAR)",
    }
    selects = " UNION ALL ".join(
        f"SELECT {lvl} AS level, {qi} AS qi FROM customer"
        for lvl, qi in levels.items()
    )
    return f"""
        WITH q AS ({selects}),
        cls AS (SELECT level, qi, COUNT(*) AS n FROM q GROUP BY level, qi)
        SELECT level,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(COALESCE(SUM(CASE WHEN n < {K_ANON} THEN 1 END), 0)
                    AS BIGINT) AS n_violating_classes,
               CAST(COALESCE(SUM(CASE WHEN n < {K_ANON} THEN n END), 0)
                    AS BIGINT) AS rows_at_risk,
               CAST(MIN(n) AS BIGINT) AS min_class_size
        FROM cls GROUP BY level ORDER BY level
    """


@register(
    "customer_k_anonymity_ladder",
    gated=False,
    oracle=_kanon_oracle(),
    survey_ref="§2C governance — k-anonymity audit across a nested "
    "generalization ladder of quasi-identifiers; risk is provably "
    "monotone non-increasing up the ladder (test-pinned)",
    description=f"rows at risk (QI equivalence class < k={K_ANON}) over "
    "four generalization levels of (nation, segment, acctbal-bucket): "
    "one scan explodes each customer into its per-level QI key, one "
    "grouped count per (level, class). Bucket ladders are nested "
    "(500-buckets union into 2000-buckets), so coarsening can only "
    "merge classes and rows_at_risk never increases up the ladder",
)
def customer_k_anonymity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    nat = F.col("c_nationkey").cast("string")
    seg = F.col("c_mktsegment")

    def bucket(width: int):
        return F.floor(F.col("c_acctbal") / width).cast("long").cast("string")

    qis = [
        F.concat_ws("|", nat, seg, bucket(500)),
        F.concat_ws("|", nat, seg, bucket(2000)),
        F.concat_ws("|", nat, seg),
        nat,
    ]
    q = c.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(lvl).alias("level"), qi.alias("qi"))
                    for lvl, qi in enumerate(qis)
                ]
            )
        ).alias("e")
    ).select("e.level", "e.qi")
    cls = q.groupBy("level", "qi").agg(F.count("*").alias("n"))
    small = F.col("n") < K_ANON
    return (
        cls.groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.coalesce(F.sum(F.when(small, 1)), F.lit(0))
            .cast("long")
            .alias("n_violating_classes"),
            F.coalesce(F.sum(F.when(small, F.col("n"))), F.lit(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.min("n").cast("long").alias("min_class_size"),
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation
# ---------------------------------------------------------------------------

JS_W = 256
JS_D = 3


def _js_h32(j_expr: str, key_expr: str) -> str:
    return _th32_sql(f"CAST({j_expr} AS VARCHAR) || '|' || {key_expr}")


@register(
    "cms_join_size_estimate",
    gated=False,
    oracle=f"""
        WITH co AS (SELECT CAST(o_orderkey AS VARCHAR) AS k, COUNT(*) AS c
                    FROM orders GROUP BY 1),
        cl AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS c
               FROM lineitem GROUP BY 1),
        exact AS (SELECT SUM(co.c * cl.c) AS e
                  FROM co JOIN cl ON co.k = cl.k),
        js AS (SELECT unnest([0, 1, 2]) AS j),
        po AS (SELECT j, {_js_h32("j", "k")} % {JS_W} AS bucket,
                      SUM(c) AS s
               FROM co CROSS JOIN js GROUP BY 1, 2),
        pl AS (SELECT j, {_js_h32("j", "k")} % {JS_W} AS bucket,
                      SUM(c) AS s
               FROM cl CROSS JOIN js GROUP BY 1, 2),
        est AS (SELECT po.j, SUM(po.s * pl.s) AS ip
                FROM po JOIN pl ON po.j = pl.j AND po.bucket = pl.bucket
                GROUP BY po.j)
        SELECT CAST(exact.e AS BIGINT) AS exact_rows,
               CAST(MIN(est.ip) AS BIGINT) AS cms_est,
               CAST(MIN(est.ip) - exact.e AS BIGINT) AS overestimate,
               CAST(MIN(est.ip) - exact.e AS DOUBLE) / exact.e AS rel_err
        FROM est CROSS JOIN exact GROUP BY exact.e
    """,
    survey_ref="§2C sketches — Count-Min inner product as a join-size "
    "estimator: Σ_b cmsA[j][b]·cmsB[j][b] ≥ |A ⋈ B| for every hash row; "
    "sketches merge by addition, so a distributed optimizer computes "
    "this without joining the tables",
    description=f"|orders ⋈ lineitem| estimated from two {JS_D}x{JS_W} "
    "Count-Min sketches via the inner-product bound (min over hash "
    "rows), alongside the exact join size — integer counters end to "
    "end, est >= exact by construction, one IEEE division for rel_err",
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k")
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    co = o.groupBy("k").agg(F.count("*").alias("c"))
    cl = li.groupBy("k").agg(F.count("*").alias("c"))
    exact = (
        co.alias("co")
        .join(cl.alias("cl"), "k")
        .agg(F.sum(F.col("co.c") * F.col("cl.c")).alias("e"))
    )

    def partials(counts: DataFrame) -> DataFrame:
        j = F.explode(F.array(*[F.lit(i) for i in range(JS_D)])).alias("j")
        keyed = counts.select("k", "c", j)
        bucket = F.pmod(
            _th32_col(F.concat(F.col("j").cast("string"), F.lit("|"), "k")),
            JS_W,
        )
        return keyed.groupBy("j", bucket.alias("bucket")).agg(
            F.sum("c").alias("s")
        )

    po, pl = partials(co), partials(cl)
    est = (
        po.alias("po")
        .join(
            pl.alias("pl"),
            (F.col("po.j") == F.col("pl.j"))
            & (F.col("po.bucket") == F.col("pl.bucket")),
        )
        .groupBy("po.j")
        .agg(F.sum(F.col("po.s") * F.col("pl.s")).alias("ip"))
        .agg(F.min("ip").alias("est"))
    )
    # scalar x scalar crossJoin (1 row each side) — documented BNLJ shape
    return est.crossJoin(exact).select(
        F.col("e").cast("long").alias("exact_rows"),
        F.col("est").cast("long").alias("cms_est"),
        (F.col("est") - F.col("e")).cast("long").alias("overestimate"),
        ((F.col("est") - F.col("e")).cast("double") / F.col("e")).alias(
            "rel_err"
        ),
    )
