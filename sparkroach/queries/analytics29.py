"""Round-8 wave 4: time-series diagnostics — autocorrelation function
and the Theil–Sen robust trend estimator.

Registered ``gated=False`` with DELEGATED twins (rotation.DELEGATED) —
the R8 window is full at 50; these are R9-window candidates, swept by
the local oracle at three SFs like every registry entry.

Float discipline (the lineitem_corr_matrix construction, hardened):
every statistic is an EXACT integer (Spark DECIMAL(38,0) sums mirrored
in driver-side python ints / DuckDB HUGEINT).  DuckDB's HUGEINT→DOUBLE
cast is NOT correctly rounded for all negative int128 values (observed
1-ulp: it splits upper·2^64 + lower with two roundings), so quotients
of huge exact integers are taken as scaled integer FLOOR divisions —
(num·10^10) // den — with DuckDB's toward-zero truncation (verified:
-7 // 2 = -3) mirrored explicitly, followed by one exact-operand
double division.

Reference parity: none — §2C analytic breadth per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# events_minute_acf — exact autocorrelation over the minute grid
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 8

_ACF_ORACLE = f"""
    WITH m AS (
        SELECT epoch_us(ts::TIMESTAMP) // 60000000 AS t,
               SUM(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(t) AS t0, MAX(t) AS t1, MAX(t) - MIN(t) + 1 AS n FROM m),
    s AS (
        SELECT CAST(SUM(x) AS HUGEINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
        FROM m
    ),
    c AS (
        SELECT k.k,
               CAST(SUM(CAST(a.x AS HUGEINT) * b2.x) AS HUGEINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM m a
        JOIN range(1, {ACF_MAX_LAG + 1}) k(k) ON TRUE
        JOIN m b2 ON b2.t = a.t + k.k
        GROUP BY k.k
    ),
    ht AS (
        SELECT k.k,
               CAST(SUM(CASE WHEN a.t <= (SELECT t1 FROM b) - k.k
                             THEN a.x ELSE 0 END) AS HUGEINT) AS h,
               CAST(SUM(CASE WHEN a.t >= (SELECT t0 FROM b) + k.k
                             THEN a.x ELSE 0 END) AS HUGEINT) AS tl
        FROM m a JOIN range(1, {ACF_MAX_LAG + 1}) k(k) ON TRUE
        GROUP BY k.k
    )
    SELECT c.k AS lag,
           (SELECT CAST(n AS BIGINT) FROM b) AS n_grid,
           c.n_pairs,
           -- exact scaled floor quotient (both engines floor), then an
           -- exact-operand double division: DuckDB's HUGEINT→DOUBLE
           -- cast is 1-ulp-unsafe for some negative values, so the
           -- huge integers never meet a double directly
           CAST(CAST(((CAST((SELECT n FROM b) AS HUGEINT)
                           * (SELECT n FROM b) * c.c
                       - CAST((SELECT n FROM b) AS HUGEINT)
                           * (SELECT s FROM s) * (ht.h + ht.tl)
                       + (CAST((SELECT n FROM b) AS HUGEINT) - c.k)
                           * (SELECT s FROM s) * (SELECT s FROM s))
                      * CAST(10000000000 AS HUGEINT))
                     // (CAST((SELECT n FROM b) AS HUGEINT)
                             * (SELECT n FROM b) * (SELECT ss FROM s)
                         - CAST((SELECT n FROM b) AS HUGEINT)
                             * (SELECT s FROM s) * (SELECT s FROM s))
                AS BIGINT) AS DOUBLE) / 10000000000.0 AS acf
    FROM c JOIN ht ON ht.k = c.k
    ORDER BY lag
"""


@register(
    "events_minute_acf",
    # R9-window candidate: registered gated=False, DELEGATED to
    # orders_monthly_seasonality (time-series lag-structure diagnostics
    # over an exact integer-cents rollup — the recorded r7 plan
    # family); the zero-filled-grid algebra is pinned against a
    # literal-series numpy reference in tests/test_analytics29.py.
    gated=False,
    oracle=_ACF_ORACLE,
    survey_ref="§2C analytic breadth / time series — the "
    "autocorrelation function: ACF at lags 1..8 over the per-minute "
    "value series (zero-filled grid), the diagnostic that decides "
    "seasonality periods and drift-detector window sizes",
    description=f"r_k for k=1..{ACF_MAX_LAG} over per-minute cents "
    "sums on the [min,max] minute grid (absent minutes are exact "
    "zeros, so only present-present pairs enter Σx_t·x_t+k — an "
    "id-keyed equi-join on minute+lag, never a range join).  All "
    "sufficient statistics are exact integers: the grid algebra "
    "n²·C_k − n·S·(H_k+T_k) + (n−k)·S² over DECIMAL(38,0)/HUGEINT, "
    "the quotient taken as a scaled integer division with DuckDB's "
    "toward-zero truncation mirrored explicitly (DuckDB's "
    "HUGEINT→DOUBLE cast is 1-ulp-unsafe for some negative values, so "
    "huge ints never meet a double) and ONE exact-operand double "
    "division at the end.  "
    "The heavy work (rollup, 8-lag explode join, 18 conditional sums) "
    "is distributed; only ≤9 aggregate rows reach the driver — the §9 "
    "bookkeeping shape.  At 100 TB the minute grid is time-bounded: "
    "a year is 526k rows regardless of corpus size",
)
def events_minute_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.analytics import cents

    m = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.unix_micros("ts") / F.lit(60_000_000))
            .cast("long")
            .alias("t")
        )
        .agg(F.sum(cents("value")).alias("x"))
        .localCheckpoint(eager=True)  # reused: bounds, stats, both join sides
    )
    b = m.agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    ).collect()[0]
    t0, t1 = b["t0"], b["t1"]
    if t0 is None:
        raise ValueError("events_minute_acf: empty input")
    n = t1 - t0 + 1
    if n <= ACF_MAX_LAG:
        raise ValueError(f"events_minute_acf: grid of {n} too short")
    aggs = [
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("x").cast("decimal(18,0)") * F.col("x").cast("decimal(18,0)")
        ).alias("ss"),
    ]
    for k in range(1, ACF_MAX_LAG + 1):
        aggs.append(
            F.sum(
                F.when(F.col("t") <= t1 - k, F.col("x")).otherwise(0).cast(
                    "decimal(38,0)"
                )
            ).alias(f"h{k}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("t") >= t0 + k, F.col("x")).otherwise(0).cast(
                    "decimal(38,0)"
                )
            ).alias(f"t{k}")
        )
    stats = m.agg(*aggs).collect()[0]
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))
    ).alias("k")
    a = m.select(F.col("t"), F.col("x").alias("xa")).select("*", lags)
    bb = m.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    c_rows = (
        a.join(bb, a.t + a.k == bb.tb)  # equi-join on (minute + lag)
        .groupBy("k")
        .agg(
            F.sum(
                F.col("xa").cast("decimal(18,0)")
                * F.col("xb").cast("decimal(18,0)")
            ).alias("c"),
            F.count("*").cast("long").alias("n_pairs"),
        )
        .collect()
    )
    c_by_k = {int(r["k"]): (int(r["c"]), r["n_pairs"]) for r in c_rows}
    s, ss = int(stats["s"]), int(stats["ss"])
    out = []
    den = n * n * ss - n * s * s  # exact python int, mirrors HUGEINT
    for k in range(1, ACF_MAX_LAG + 1):
        ck, n_pairs = c_by_k.get(k, (0, 0))
        h = int(stats[f"h{k}"])
        tl = int(stats[f"t{k}"])
        num = n * n * ck - n * s * (h + tl) + (n - k) * s * s
        # scaled exact quotient, TRUNCATED toward zero — DuckDB's
        # integer // truncates (verified: -7 // 2 = -3) while python //
        # floors, so negatives go through abs(); then an exact-operand
        # double division — the huge ints never meet a double directly
        scaled = num * 10_000_000_000
        q = -(-scaled // den) if scaled < 0 else scaled // den
        out.append((k, n, n_pairs, float(q) / 10_000_000_000.0))
    return spark.createDataFrame(
        out, "lag long, n_grid long, n_pairs long, acf double"
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# events_hourly_theil_sen — robust trend: median of pairwise slopes
# ---------------------------------------------------------------------------

TS_MAX_POINTS = 2000  # hourly grid guard (720 at the 30-day corpus)

_TS_ORACLE = """
    WITH h AS (
        SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS t,
               SUM(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(t) AS t0, CAST(COUNT(*) AS BIGINT) AS m FROM h),
    p AS (
        SELECT a.t AS ta, b2.t AS tb,
               CAST(b2.y - a.y AS DOUBLE) / CAST(b2.t - a.t AS DOUBLE)
                   AS slope
        FROM h a JOIN h b2 ON a.t < b2.t
    ),
    rs AS (
        SELECT slope,
               row_number() OVER (ORDER BY slope, ta, tb) AS rn
        FROM p
    ),
    sl AS (
        SELECT ROUND(slope, 6) AS s6 FROM rs
        WHERE rn = ((SELECT m * (m - 1) // 2 FROM b) + 1) // 2
    ),
    dev AS (
        SELECT t,
               CAST(y AS DOUBLE)
                   - ROUND((SELECT s6 FROM sl)
                           * (t - (SELECT t0 FROM b)), 6) AS d
        FROM h
    ),
    di AS (SELECT d, row_number() OVER (ORDER BY d, t) AS rn FROM dev)
    SELECT (SELECT m FROM b) AS n_points,
           (SELECT m * (m - 1) // 2 FROM b) AS n_pairs,
           (SELECT s6 FROM sl) AS sen_slope_r6,
           ROUND((SELECT d FROM di
                  WHERE rn = ((SELECT m FROM b) + 1) // 2), 6)
               AS sen_intercept_r6
"""


@register(
    "events_hourly_theil_sen",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_value_median_udaf (exact lower-median semantics through a
    # recorded lane, r6 gate); the increment — the median taken over
    # the pairwise-slope set and the Siegel-style intercept — is
    # pinned against a numpy reference in tests/test_analytics29.py.
    gated=False,
    oracle=_TS_ORACLE,
    survey_ref="§2C analytic breadth / robust statistics — the "
    "Theil–Sen trend estimator: the median of all pairwise slopes "
    "(29% breakdown point — the trend line that survives the outliers "
    "a least-squares fit chases), with a median-residual intercept",
    description="lower median of (y_j−y_i)/(t_j−t_i) over all hour "
    "pairs of the per-hour cents series: each slope is ONE IEEE "
    "division of exact integers, the median is a total order over "
    "(slope, t_i, t_j) — bit-identical in both engines.  The pair "
    "join is bounded BY TIME, not by data: 720 hours at the 30-day "
    f"corpus (guarded ≤ {TS_MAX_POINTS}), so ~260k pair rows whether "
    "the corpus is 1 GB or 100 TB — the hourly rollup in front is the "
    "scale wall, and it is map-side.  Intercept = lower median of "
    "y − round(slope·Δt, 6), the rounding pinning both engines to the "
    "same post-multiply double.  The single-partition windows run "
    "over the time-bounded pair/point sets (whitelisted)",
)
def events_hourly_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sparkroach.queries.analytics import cents

    h = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.unix_micros("ts") / F.lit(3_600_000_000))
            .cast("long")
            .alias("t")
        )
        .agg(F.sum(cents("value")).alias("y"))
        .localCheckpoint(eager=True)  # reused: bounds + both pair sides
    )
    b = h.agg(
        F.min("t").alias("t0"), F.count("*").cast("long").alias("m")
    ).collect()[0]
    t0, m = b["t0"], b["m"]
    if m < 2:
        raise ValueError("events_hourly_theil_sen: need >= 2 hours")
    if m > TS_MAX_POINTS:
        raise ValueError(
            f"events_hourly_theil_sen: {m} hourly points exceeds the "
            f"{TS_MAX_POINTS} guard — widen the bucket, not the window"
        )
    a = h.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    bb = h.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    # time-bounded all-pairs: broadcast side is the <=TS_MAX_POINTS
    # hourly aggregate (whitelisted) — BNLJ over ~260k pairs, constant
    # in corpus size
    pairs = F.broadcast(a).join(bb, F.col("ta") < F.col("tb"))
    slope = (
        (F.col("yb") - F.col("ya")).cast("double")
        / (F.col("tb") - F.col("ta")).cast("double")
    ).alias("slope")
    n_pairs = m * (m - 1) // 2
    w_slope = Window.orderBy("slope", "ta", "tb")
    sen = (
        pairs.select("ta", "tb", slope)
        .withColumn("rn", F.row_number().over(w_slope))
        .where(F.col("rn") == (n_pairs + 1) // 2)
        .select(F.round("slope", 6).alias("s6"))
        .collect()[0]["s6"]
    )
    dev = h.select(
        "t",
        (
            F.col("y").cast("double")
            - F.round(F.lit(sen) * (F.col("t") - t0), 6)
        ).alias("d"),
    )
    w_dev = Window.orderBy("d", "t")
    intercept = (
        dev.withColumn("rn", F.row_number().over(w_dev))
        .where(F.col("rn") == (m + 1) // 2)
        .select(F.round("d", 6).alias("i6"))
        .collect()[0]["i6"]
    )
    return spark.createDataFrame(
        [(m, n_pairs, float(sen), float(intercept))],
        "n_points long, n_pairs long, sen_slope_r6 double, "
        "sen_intercept_r6 double",
    )


# ---------------------------------------------------------------------------
# events_sax_quantile_words — symbolic time-series words (PAA + aSAX)
# ---------------------------------------------------------------------------

SAX_SEG_HOURS = 6  # PAA segment width → 4 symbols per day

_SAX_ORACLE = f"""
    WITH h AS (
        SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS hr,
               SUM(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(hr) AS h0 FROM h),
    seg AS (
        SELECT (hr - (SELECT h0 FROM b)) // {SAX_SEG_HOURS} AS s,
               (hr - (SELECT h0 FROM b)) // 24 AS day,
               ((hr - (SELECT h0 FROM b)) % 24) // {SAX_SEG_HOURS}
                   AS slot,
               CAST(SUM(y) AS BIGINT) AS v
        FROM h GROUP BY 1, 2, 3
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seg),
    r AS (SELECT v, row_number() OVER (ORDER BY v, s) AS rk FROM seg),
    cuts AS (
        SELECT MAX(CASE WHEN rk = ((SELECT n FROM n) + 3) // 4
                        THEN v END) AS c1,
               MAX(CASE WHEN rk = (2 * (SELECT n FROM n) + 3) // 4
                        THEN v END) AS c2,
               MAX(CASE WHEN rk = (3 * (SELECT n FROM n) + 3) // 4
                        THEN v END) AS c3
        FROM r
    )
    SELECT seg.day,
           string_agg(CASE WHEN seg.v <= cuts.c1 THEN 'a'
                           WHEN seg.v <= cuts.c2 THEN 'b'
                           WHEN seg.v <= cuts.c3 THEN 'c'
                           ELSE 'd' END, '' ORDER BY seg.slot) AS word,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM seg, cuts
    GROUP BY seg.day
    ORDER BY seg.day
"""


@register(
    "events_sax_quantile_words",
    # R9-window candidate: registered gated=False, DELEGATED to
    # orders_monthly_seasonality (time-bucketed series summarization
    # over exact integer cents — the recorded r7 time-series plan
    # family); the PAA/alphabet semantics (quartile cuts as exact
    # order statistics, per-day word assembly) are pinned against a
    # pure-python reference in tests/test_analytics29.py.
    gated=False,
    oracle=_SAX_ORACLE,
    survey_ref="§2C analytic breadth / time series — symbolic "
    "aggregate approximation (SAX family, adaptive-quantile "
    "alphabet): the per-day symbolic words motif/anomaly miners run "
    "on — piecewise aggregation + a 4-letter empirical-quartile "
    "alphabet, fully exact",
    description=f"hourly cents series → {SAX_SEG_HOURS}-hour PAA "
    "segments (exact integer sums; 4 segments/day) → alphabet cuts = "
    "the exact ¼/½/¾ order statistics of the segment values "
    "(ceil-rank over the time-bounded segment table — no Gaussian "
    "breakpoints, no doubles ANYWHERE) → per-day 4-letter words "
    "assembled in slot order.  Everything beyond the hourly rollup "
    "is bounded by TIME (≤120 segments at the 30-day corpus), so the "
    "ordering window is constant-size at any corpus scale",
)
def events_sax_quantile_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sparkroach.queries.analytics import cents

    h = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.unix_micros("ts") / F.lit(3_600_000_000))
            .cast("long")
            .alias("hr")
        )
        .agg(F.sum(cents("value")).alias("y"))
    )
    h0 = h.agg(F.min("hr")).collect()[0][0]
    if h0 is None:
        raise ValueError("events_sax_quantile_words: empty input")
    seg = (
        h.selectExpr(
            f"(hr - {h0}) DIV {SAX_SEG_HOURS} AS s",
            f"(hr - {h0}) DIV 24 AS day",
            f"((hr - {h0}) % 24) DIV {SAX_SEG_HOURS} AS slot",
            "y",
        )
        .groupBy("s", "day", "slot")
        .agg(F.sum("y").cast("long").alias("v"))
        .localCheckpoint(eager=True)  # reused: count, ranks, symbols
    )
    n_seg = seg.count()
    w = Window.orderBy("v", "s")  # time-bounded: ≤ ~120 rows ever
    r = seg.select("v", "s").withColumn("rk", F.row_number().over(w))
    ranks = {
        "c1": (n_seg + 3) // 4,
        "c2": (2 * n_seg + 3) // 4,
        "c3": (3 * n_seg + 3) // 4,
    }
    cuts = r.agg(
        *[
            F.max(F.when(F.col("rk") == rk, F.col("v"))).alias(name)
            for name, rk in ranks.items()
        ]
    )
    sym = F.when(F.col("v") <= F.col("c1"), "a").when(
        F.col("v") <= F.col("c2"), "b"
    ).when(F.col("v") <= F.col("c3"), "c").otherwise("d")
    return (
        seg.crossJoin(F.broadcast(cuts))  # 1-row cuts scalar
        .select("day", "slot", sym.alias("sym"))
        .groupBy("day")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("slot", "sym"))),
                    lambda x: x.sym,
                ),
            ).alias("word"),
            F.count("*").cast("long").alias("n_segments"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# user_activity_gini — inequality of per-user value via distributed rank
# ---------------------------------------------------------------------------

_GINI_SCALE = 1_000_000_000

_GINI_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               SUM(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT)
                      AS i
        FROM u
    ),
    s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT) AS six
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS total_cents,
           CAST(((2 * six - (n + 1) * sx) * {_GINI_SCALE}) // (n * sx)
                AS BIGINT) AS gini_q9,
           CAST(CAST(((2 * six - (n + 1) * sx) * {_GINI_SCALE}) // (n * sx)
                     AS BIGINT) AS DOUBLE) / {_GINI_SCALE}.0 AS gini
    FROM s
"""


@register(
    "user_activity_gini",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_user_value_ntiles (global total-order statistics over the
    # per-user value distribution — the recorded inequality/rank plan
    # family); the Gini identity and edge behavior (uniform → 0,
    # one-hot → (n−1)/n) are pinned against a numpy reference in
    # tests/test_analytics29.py.
    gated=False,
    oracle=_GINI_ORACLE,
    survey_ref="§2C analytic breadth / inequality statistics — the "
    "Gini coefficient of per-user value (the 0=uniform, →1=one-user-"
    "owns-everything skew summary data-balance audits report), "
    "computed exactly from the sorted-rank identity",
    description="G = (2Σi·x_(i) − (n+1)Σx)/(n·Σx) over ascending "
    "(value, user_id) ranks — ranks come from the DISTRIBUTED "
    "global_row_number recipe (range partition + broadcast offsets, "
    "no single-partition window over the user dimension), the sums "
    "are exact integers, and the quotient is a scaled integer "
    "division (positive operands: floor == truncation on both "
    f"engines) quantized at 1/{_GINI_SCALE} with one exact-operand "
    "double division for the reported value",
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.analytics import cents
    from sparkroach.queries.analytics16 import global_row_number

    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(cents("value")).alias("x"))
    )
    r = global_row_number(u, [F.col("x"), F.col("user_id")], out="i")
    s = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum(
            (F.col("i").cast("decimal(19,0)") * F.col("x")).cast(
                "decimal(38,0)"
            )
        ).alias("six"),
    ).collect()[0]
    n, sx, six = int(s["n"]), int(s["sx"]), int(s["six"])
    if n == 0 or sx == 0:
        raise ValueError("user_activity_gini: empty or zero-total input")
    num = (2 * six - (n + 1) * sx) * _GINI_SCALE
    q = num // (n * sx)  # positive operands: floor == DuckDB truncation
    return spark.createDataFrame(
        [(n, sx, q, float(q) / _GINI_SCALE)],
        "n_users long, total_cents long, gini_q9 long, gini double",
    )


# ---------------------------------------------------------------------------
# events_markov_stationary — quantized power iteration on the 5-state
# event-type transition matrix
# ---------------------------------------------------------------------------

MK_SCALE = 100_000_000
MK_ITERS = 30


def _markov_oracle() -> str:
    ctes = [
        """pairs AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts::TIMESTAMP), event_id
                   ) AS nxt
            FROM events
        )""",
        """cnt AS (
            SELECT event_type AS src, nxt AS dst,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM pairs WHERE nxt IS NOT NULL
            GROUP BY event_type, nxt
        )""",
        """rt AS (
            SELECT src, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY src
        )""",
        f"""p AS MATERIALIZED (
            SELECT cnt.src, cnt.dst,
                   (cnt.c * {MK_SCALE}) // rt.tot AS pq
            FROM cnt JOIN rt ON rt.src = cnt.src
        )""",
        f"""states AS MATERIALIZED (
            SELECT src AS state,
                   {MK_SCALE} // (SELECT COUNT(*) FROM rt) AS v
            FROM rt
        )""",
        "v0 AS MATERIALIZED (SELECT state, v FROM states)",
    ]
    for t in range(1, MK_ITERS + 1):
        ctes.append(
            f"""v{t} AS MATERIALIZED (
            SELECT p.dst AS state,
                   CAST(SUM(v.v * p.pq) // {MK_SCALE} AS BIGINT) AS v
            FROM v{t - 1} v JOIN p ON p.src = v.state
            GROUP BY p.dst
        )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT cur.state, rt.tot AS n_transitions,
               cur.v AS stationary_q8,
               CAST(ABS(cur.v - prev.v) AS BIGINT) AS last_delta_q8
        FROM v{MK_ITERS} cur
        JOIN v{MK_ITERS - 1} prev ON prev.state = cur.state
        JOIN rt ON rt.src = cur.state
        ORDER BY cur.state
    """
    )


@register(
    "events_markov_stationary",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_type_transitions (the recorded per-user lead/lag
    # transition extraction — the heavy distributed stage here; the
    # 5-state quantized power iteration on top is driver-side
    # bookkeeping); fixed-point behavior is pinned against a numpy
    # eigenvector in tests/test_analytics29.py.
    gated=False,
    oracle=_markov_oracle(),
    survey_ref="§2C analytic breadth / stochastic processes — the "
    "stationary distribution of the event-type Markov chain "
    "(long-run state occupancy) by power iteration over the "
    "transition matrix, the user-journey summary next to the raw "
    "transition counts and the funnel operators",
    description="transition counts from per-user (ts, event_id)-"
    "ordered lead pairs (the distributed stage — per-user windows, "
    "one groupBy); the 5×5 row-normalized matrix is quantized at "
    f"1/{MK_SCALE} by mirrored integer division, and {MK_ITERS} "
    "power-iteration steps run in EXACT quantized arithmetic "
    "(v·P summed exactly, re-quantized each step — positive "
    "operands, identical truncation both engines), so both engines "
    "land on the bit-identical fixed point; last_delta_q8 exposes "
    "convergence.  The state space is the literal event-type "
    "dimension — the iteration is driver-side bookkeeping at any "
    "corpus scale, mirrored by the oracle's unrolled MATERIALIZED "
    "CTEs",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    cnt = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy("event_type", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
        .collect()
    )
    counts: dict[tuple[str, str], int] = {
        (r["event_type"], r["nxt"]): r["c"] for r in cnt
    }
    states = sorted({s for s, _ in counts} | {d for _, d in counts})
    tot = {s: sum(c for (a, _), c in counts.items() if a == s) for s in states}
    pq = {
        (a, b): (c * MK_SCALE) // tot[a] for (a, b), c in counts.items()
    }  # positive: floor == DuckDB truncation
    v = {s: MK_SCALE // len(states) for s in states}
    prev = dict(v)
    for _t in range(MK_ITERS):
        prev = v
        v = {
            d: sum(prev[s] * pq.get((s, d), 0) for s in states) // MK_SCALE
            for d in states
        }
    return spark.createDataFrame(
        [
            (s, tot[s], v[s], abs(v[s] - prev[s]))
            for s in states
        ],
        "state string, n_transitions long, stationary_q8 long, "
        "last_delta_q8 long",
    ).orderBy("state")


# ---------------------------------------------------------------------------
# events_hilbert_locality_report — Hilbert vs Z-order layout locality
# ---------------------------------------------------------------------------


def _hilbert_oracle() -> str:
    from sparkroach.functions.hilbert import hilbert_ctes, morton_sql

    z = morton_sql("x0", "y0", div="//")
    return f"""
        WITH g AS (
            SELECT user_id % 256 AS hx, user_id % 256 AS x0,
                   (epoch_us(ts::TIMESTAMP) // 60000000) % 256 AS hy,
                   (epoch_us(ts::TIMESTAMP) // 60000000) % 256 AS y0,
                   0 AS hd, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY 1, 2, 3, 4
        ),
        {hilbert_ctes("g")},
        keyed AS (SELECT x0, y0, cnt, hd, {z} AS zd FROM hfin),
        hpath AS (
            SELECT ABS(x0 - lag(x0) OVER (ORDER BY hd)) +
                   ABS(y0 - lag(y0) OVER (ORDER BY hd)) AS step
            FROM keyed
        ),
        zpath AS (
            SELECT ABS(x0 - lag(x0) OVER (ORDER BY zd)) +
                   ABS(y0 - lag(y0) OVER (ORDER BY zd)) AS step
            FROM keyed
        ),
        hs AS (
            SELECT CAST(SUM(step) AS BIGINT) AS total,
                   CAST(SUM(CASE WHEN step = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS adj
            FROM hpath WHERE step IS NOT NULL
        ),
        zs AS (
            SELECT CAST(SUM(step) AS BIGINT) AS total,
                   CAST(SUM(CASE WHEN step = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS adj
            FROM zpath WHERE step IS NOT NULL
        ),
        st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(cnt) AS BIGINT) AS n_events
            FROM keyed
        )
        SELECT st.n_cells, st.n_events,
               hs.total AS hilbert_path_manhattan,
               zs.total AS zorder_path_manhattan,
               hs.adj AS hilbert_adjacent_pairs,
               zs.adj AS zorder_adjacent_pairs,
               CAST(hs.total AS DOUBLE) / CAST(zs.total AS DOUBLE)
                   AS locality_ratio
        FROM st, hs, zs
    """


@register(
    "events_hilbert_locality_report",
    # R9-window candidate: registered gated=False, DELEGATED to
    # lineitem_zorder_read (space-filling-curve layout machinery over
    # the same key-interleave idea — the recorded r6 gate); the curve
    # construction is pinned EXHAUSTIVELY (all 65536 cells vs the
    # python reference, inverse roundtrip, the consecutive-index
    # adjacency property) in tests/test_analytics29.py.
    gated=False,
    oracle=_hilbert_oracle(),
    survey_ref="§2C storage layout — Hilbert-curve clustering vs "
    "Z-order: the locality diagnostic (total Manhattan travel and "
    "adjacent-step fraction along each curve over the occupied "
    "(user, minute) cells) that justifies choosing Hilbert file "
    "ordering for multi-dimensional range scans",
    description="occupied 256×256 (user % 256, minute % 256) cells "
    "keyed by BOTH curves: Morton by bit-interleave arithmetic, "
    "Hilbert by the 8 unrolled xy2d stages — ONE portable integer-"
    "arithmetic construction (DIV/%/CASE) generated from the same "
    "code for both engines and verified cell-exhaustively against "
    "the python reference.  Along each curve order: Σ Manhattan "
    "distance of consecutive occupied cells + the adjacent-pair "
    "count; Hilbert travels less (consecutive indices are ALWAYS "
    "grid-adjacent — pinned).  The cell table is literal-bounded "
    "(≤ 2^16 rows), so the ordering windows are constant-size at "
    "any corpus scale",
)
def events_hilbert_locality_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from sparkroach.functions.hilbert import hilbert_stages, morton_sql

    g = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "user_id % 256 AS x0",
            "(unix_micros(ts) DIV 60000000) % 256 AS y0",
        )
        .groupBy("x0", "y0")
        .agg(F.count("*").cast("long").alias("cnt"))
        .selectExpr("x0", "y0", "cnt", "x0 AS hx", "y0 AS hy", "0 AS hd")
    )
    for st in hilbert_stages(div="DIV"):
        g = g.selectExpr(
            "x0",
            "y0",
            "cnt",
            f"({st['hx']}) AS hx",
            f"({st['hy']}) AS hy",
            f"({st['hd']}) AS hd",
        )
    keyed = g.selectExpr(
        "x0", "y0", "cnt", "hd", f"{morton_sql('x0', 'y0')} AS zd"
    ).localCheckpoint(eager=True)  # consumed by both path orderings

    def path(order_col: str):
        w = Window.orderBy(order_col)
        step = (
            F.abs(F.col("x0") - F.lag("x0").over(w))
            + F.abs(F.col("y0") - F.lag("y0").over(w))
        ).alias("step")
        return (
            keyed.select(step)
            .where(F.col("step").isNotNull())
            .agg(
                F.sum("step").cast("long").alias("total"),
                F.sum(F.when(F.col("step") == 1, 1).otherwise(0))
                .cast("long")
                .alias("adj"),
            )
        )

    hs = path("hd").withColumnsRenamed({"total": "ht", "adj": "ha"})
    zs = path("zd").withColumnsRenamed({"total": "zt", "adj": "za"})
    st_ = keyed.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("cnt").cast("long").alias("n_events"),
    )
    return (
        st_.crossJoin(hs)  # 1-row × 1-row bookkeeping joins
        .crossJoin(zs)
        .select(
            "n_cells",
            "n_events",
            F.col("ht").alias("hilbert_path_manhattan"),
            F.col("zt").alias("zorder_path_manhattan"),
            F.col("ha").alias("hilbert_adjacent_pairs"),
            F.col("za").alias("zorder_adjacent_pairs"),
            (F.col("ht").cast("double") / F.col("zt").cast("double")).alias(
                "locality_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# lineitem_ols_cramer — exact two-feature OLS via normal equations
# ---------------------------------------------------------------------------

_OLS_SCALE = 1_000_000  # betas quantized at 1e-6


def _ols_oracle() -> str:
    det = (
        "(n * (sxx * szz - sxz * sxz) "
        "- sx * (sx * szz - sxz * sz) "
        "+ sz * (sx * sxz - sxx * sz))"
    )
    det0 = (
        "(sy * (sxx * szz - sxz * sxz) "
        "- sx * (sxy * szz - sxz * szy) "
        "+ sz * (sxy * sxz - sxx * szy))"
    )
    det1 = (
        "(n * (sxy * szz - sxz * szy) "
        "- sy * (sx * szz - sxz * sz) "
        "+ sz * (sx * szy - sxy * sz))"
    )
    det2 = (
        "(n * (sxx * szy - sxy * sxz) "
        "- sx * (sx * szy - sxy * sz) "
        "+ sy * (sx * sxz - sxx * sz))"
    )
    return f"""
        WITH q AS (
            SELECT CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_discount * 100) AS BIGINT) AS z,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        s AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   CAST(SUM(z) AS HUGEINT) AS sz,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(x * x) AS HUGEINT) AS sxx,
                   CAST(SUM(x * z) AS HUGEINT) AS sxz,
                   CAST(SUM(z * z) AS HUGEINT) AS szz,
                   CAST(SUM(x * y) AS HUGEINT) AS sxy,
                   CAST(SUM(z * y) AS HUGEINT) AS szy
            FROM q
        ),
        b AS (
            SELECT CAST(({det0} * {_OLS_SCALE}) // {det} AS BIGINT) AS b0,
                   CAST(({det1} * {_OLS_SCALE}) // {det} AS BIGINT) AS b1,
                   CAST(({det2} * {_OLS_SCALE}) // {det} AS BIGINT) AS b2,
                   CAST(n AS BIGINT) AS n_rows
            FROM s
        )
        SELECT b.n_rows, b.b0 AS beta0_q6, b.b1 AS beta1_q6,
               b.b2 AS beta2_q6,
               CAST(SUM(ABS(CAST({_OLS_SCALE} AS HUGEINT) * q.y
                            - (b.b0 + b.b1 * q.x + b.b2 * q.z)))
                    AS BIGINT) AS sae_q6
        FROM q, b
        GROUP BY b.n_rows, b.b0, b.b1, b.b2
    """


@register(
    "lineitem_ols_cramer",
    # R9-window candidate: registered gated=False, DELEGATED to
    # lineitem_corr_matrix → recorded twin orders_profile_report (one-
    # pass exact sufficient statistics, the recorded profiling plan
    # family); the Cramer solution is pinned against numpy.linalg
    # least squares in tests/test_analytics29.py.
    gated=False,
    oracle=_ols_oracle(),
    survey_ref="§2C analytic breadth / statistics — EXACT multiple "
    "linear regression at scale: the 3×3 normal equations solved by "
    "integer Cramer determinants over one-pass sufficient statistics "
    "— regression with zero floating-point in the fit itself",
    description="extendedprice-cents on (quantity, discount-pct): one "
    "scan collects the 9 exact sums; the 3×3 determinants are exact "
    "integer arithmetic (python ints / HUGEINT — the Gram matrix "
    f"keeps det > 0), betas quantized at 1/{_OLS_SCALE} by mirrored "
    "toward-zero truncation, then a SECOND distributed pass scores "
    "Σ|residual| against the quantized fit — every reported value an "
    "exact integer, no doubles anywhere.  The §9 shape: two scans, "
    "one 9-value bookkeeping row through the driver",
)
def lineitem_ols_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("x"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("z"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("y"),
    ).localCheckpoint(eager=True)  # reused: stats pass + residual pass
    s = q.agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.sum(F.expr(e).cast("decimal(38,0)")).alias(a)
            for e, a in [
                ("x", "sx"), ("z", "sz"), ("y", "sy"),
                ("x * x", "sxx"), ("x * z", "sxz"), ("z * z", "szz"),
                ("x * y", "sxy"), ("z * y", "szy"),
            ]
        ],
    ).collect()[0]
    n = int(s["n"])
    if n < 3:
        raise ValueError("lineitem_ols_cramer: need >= 3 rows")
    sx, sz, sy = int(s["sx"]), int(s["sz"]), int(s["sy"])
    sxx, sxz, szz = int(s["sxx"]), int(s["sxz"]), int(s["szz"])
    sxy, szy = int(s["sxy"]), int(s["szy"])
    det = (
        n * (sxx * szz - sxz * sxz)
        - sx * (sx * szz - sxz * sz)
        + sz * (sx * sxz - sxx * sz)
    )
    if det <= 0:
        raise ValueError("lineitem_ols_cramer: singular normal equations")
    det0 = (
        sy * (sxx * szz - sxz * sxz)
        - sx * (sxy * szz - sxz * szy)
        + sz * (sxy * sxz - sxx * szy)
    )
    det1 = (
        n * (sxy * szz - sxz * szy)
        - sy * (sx * szz - sxz * sz)
        + sz * (sx * szy - sxy * sz)
    )
    det2 = (
        n * (sxx * szy - sxy * sxz)
        - sx * (sx * szy - sxy * sz)
        + sy * (sx * sxz - sxx * sz)
    )

    def truncdiv(a: int, b: int) -> int:
        # DuckDB's // truncates toward zero; python // floors
        return -((-a) // b) if a < 0 else a // b

    b0 = truncdiv(det0 * _OLS_SCALE, det)
    b1 = truncdiv(det1 * _OLS_SCALE, det)
    b2 = truncdiv(det2 * _OLS_SCALE, det)
    sae = q.agg(
        F.sum(
            F.abs(
                F.lit(_OLS_SCALE).cast("decimal(38,0)") * F.col("y")
                - (
                    F.lit(b0)
                    + F.lit(b1) * F.col("x")
                    + F.lit(b2) * F.col("z")
                ).cast("decimal(38,0)")
            )
        )
        .cast("long")
        .alias("sae")
    ).collect()[0]["sae"]
    return spark.createDataFrame(
        [(n, b0, b1, b2, int(sae))],
        "n_rows long, beta0_q6 long, beta1_q6 long, beta2_q6 long, "
        "sae_q6 long",
    )


# ---------------------------------------------------------------------------
# events_ams_f2_sketch — tug-of-war second-moment (F2) estimation
# ---------------------------------------------------------------------------

AMS_GROUPS = 6
AMS_PER_GROUP = 4
_AMS_K = AMS_GROUPS * AMS_PER_GROUP


def _ams_oracle() -> str:
    from sparkroach.queries.llm_ops10 import _th32_sql

    h = _th32_sql(
        "md5('ams:' || CAST(j.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))"
    )
    return f"""
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        f2 AS (
            SELECT CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS BIGINT) AS f2,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM c
        ),
        x AS (
            SELECT j.j,
                   CAST(SUM(CASE WHEN ({h}) % 2 = 0 THEN cnt
                                 ELSE -cnt END) AS BIGINT) AS sk
            FROM c JOIN range(0, {_AMS_K}) j(j) ON TRUE
            GROUP BY j.j
        ),
        grp AS (
            SELECT j // {AMS_PER_GROUP} AS g,
                   CAST(SUM(CAST(sk AS HUGEINT) * sk) AS BIGINT) AS gs
            FROM x GROUP BY j // {AMS_PER_GROUP}
        ),
        med AS (
            SELECT MAX(gs) AS est FROM (
                SELECT gs FROM grp ORDER BY gs, g
                LIMIT {(AMS_GROUPS + 1) // 2}
            )
        )
        SELECT f2.n_users, f2.f2 AS f2_exact,
               CAST({AMS_GROUPS} AS BIGINT) AS k_groups,
               med.est AS est_group_sum,
               CAST(ABS(med.est - {AMS_PER_GROUP} * f2.f2) AS DOUBLE)
                   / CAST({AMS_PER_GROUP} * f2.f2 AS DOUBLE) AS rel_err
        FROM f2, med
    """


@register(
    "events_ams_f2_sketch",
    # R9-window candidate: registered gated=False, DELEGATED to
    # hll_distinct_sketch (md5-deterministic mergeable moment sketch
    # with exact integer registers, recorded bench headline); the AMS
    # estimator's unbiasedness and concentration are pinned over many
    # hash salts in tests/test_analytics29.py.
    gated=False,
    oracle=_ams_oracle(),
    survey_ref="§2C mergeable sketches — the AMS 'tug-of-war' F2 "
    "sketch (Alon-Matias-Szegedy): second frequency moment (self-join "
    "size / skew) estimation from ±1 hash projections, median-of-"
    "means over 6 groups of 4 — the moment-estimation member of the "
    "sketch matrix next to HLL (F0), CMS (point/join) and KMV",
    description=f"per user the event count; {_AMS_K} estimators "
    "S_j = Σ_u s_j(u)·cnt(u) with s_j the md5-derived ±1 sign — "
    "EXACT integers (map-side combinable sums), squared exactly; "
    f"groups of {AMS_PER_GROUP} summed exactly, the median group sum "
    "taken by orderBy+limit (no window, no floats until the one "
    "reported relative-error division of BIGINT-ranged exact ints).  "
    "E[S²] = F2 exactly; the sketch is mergeable by adding S_j "
    "vectors.  Sign table is computed per (user, j) on the fly — "
    "nothing corpus-scale is ever broadcast",
)
def events_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.llm_ops10 import _th32

    c = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # reused: exact F2 + sketch build
    )
    f2 = c.agg(
        F.sum(
            (F.col("cnt").cast("decimal(19,0)") * F.col("cnt")).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("f2"),
        F.count("*").cast("long").alias("n_users"),
    )
    h = _th32(
        F.concat(
            F.lit("ams:"),
            F.col("j").cast("string"),
            F.lit(":"),
            F.col("user_id").cast("string"),
        )
    )
    x = (
        c.select(
            "user_id",
            "cnt",
            F.explode(F.sequence(F.lit(0), F.lit(_AMS_K - 1))).alias("j"),
        )
        .groupBy("j")
        .agg(
            F.sum(
                F.when(h % 2 == 0, F.col("cnt")).otherwise(-F.col("cnt"))
            )
            .cast("long")
            .alias("sk")
        )
    )
    grp = x.groupBy((F.col("j") / AMS_PER_GROUP).cast("long").alias("g")).agg(
        F.sum(
            (F.col("sk").cast("decimal(19,0)") * F.col("sk")).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("gs")
    )
    med = (
        grp.orderBy("gs", "g")
        .limit((AMS_GROUPS + 1) // 2)
        .agg(F.max("gs").alias("est"))
    )
    return f2.crossJoin(med).select(  # 1-row × 1-row bookkeeping join
        "n_users",
        F.col("f2").alias("f2_exact"),
        F.lit(AMS_GROUPS).cast("long").alias("k_groups"),
        F.col("est").alias("est_group_sum"),
        (
            F.abs(F.col("est") - AMS_PER_GROUP * F.col("f2")).cast("double")
            / (F.lit(AMS_PER_GROUP) * F.col("f2")).cast("double")
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# dup_graph_kcore — k-core peeling over the near-dup graph
# ---------------------------------------------------------------------------

KCORE_KS = (2, 3)
KCORE_ROUNDS = 12  # peeling rounds per k (paths shed 2 nodes/round)


def _kcore_oracle() -> str:
    from sparkroach.queries.llm_ops import (
        _JACC_SQL,
        _JACCARD_TAU,
        _lsh_candidates_cte,
    )

    lsh = _lsh_candidates_cte().strip()
    assert lsh.startswith("WITH ")
    ctes = [
        lsh[len("WITH "):],
        f"""edges AS MATERIALIZED (
            SELECT c.doc_a, c.doc_b FROM cand c
            JOIN shing sa ON sa.doc_id = c.doc_a
            JOIN shing sb ON sb.doc_id = c.doc_b
            WHERE {_JACC_SQL} >= {_JACCARD_TAU}
        )""",
    ]
    selects = []
    for k in KCORE_KS:
        ctes.append(
            f"core{k}_0 AS MATERIALIZED (SELECT doc_a, doc_b FROM edges)"
        )
        for i in range(1, KCORE_ROUNDS + 1):
            # MATERIALIZED throughout: each round is referenced by the
            # next round twice plus the final stats — DuckDB's default
            # inlining would re-expand the chain exponentially
            ctes.append(
                f"""keep{k}_{i} AS MATERIALIZED (
                SELECT node FROM (
                    SELECT doc_a AS node FROM core{k}_{i - 1}
                    UNION ALL SELECT doc_b FROM core{k}_{i - 1}
                ) GROUP BY node HAVING COUNT(*) >= {k}
            )"""
            )
            ctes.append(
                f"""core{k}_{i} AS MATERIALIZED (
                SELECT e.doc_a, e.doc_b FROM core{k}_{i - 1} e
                JOIN keep{k}_{i} ka ON ka.node = e.doc_a
                JOIN keep{k}_{i} kb ON kb.node = e.doc_b
            )"""
            )
        selects.append(
            f"""SELECT {k} AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                    SELECT doc_a AS n FROM core{k}_{KCORE_ROUNDS}
                    UNION SELECT doc_b FROM core{k}_{KCORE_ROUNDS}))
                   AS n_core_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM core{k}_{KCORE_ROUNDS}) AS n_core_edges,
               (SELECT COUNT(*) FROM core{k}_{KCORE_ROUNDS}) =
               (SELECT COUNT(*) FROM core{k}_{KCORE_ROUNDS - 1})
                   AS converged"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + " UNION ALL ".join(selects) + " ORDER BY k"
    )


@register(
    "dup_graph_kcore",
    # R9-window candidate: registered gated=False, DELEGATED to
    # pagerank_dup_graph (bounded-iteration loop of joins/aggregations
    # over the identical verified near-dup edge set — the recorded
    # iteration plan family); the peeling semantics (paths dissolve,
    # cliques survive, convergence) are pinned on controlled graphs in
    # tests/test_analytics29.py.
    gated=False,
    oracle=_kcore_oracle(),
    survey_ref="§2C graph statistics — k-core decomposition over the "
    "near-dup graph (the subgraph-density ladder: 2-core strips "
    "chain/tree duplication, 3-core isolates clique-shaped template "
    "floods), completing the graph matrix next to CC, BFS, triangles "
    "and PageRank",
    description=f"iterative peeling for k ∈ {KCORE_KS}: each round "
    "drops nodes of current degree < k (one degree aggregate + two "
    "semi-join shuffles over EDGE-shaped data — the standard "
    f"distributed peeling), {KCORE_ROUNDS} rounds unrolled with the "
    "fixpoint REPORTED as a `converged` column (chains shed two nodes "
    "per round, so depth covers paths of ~2·rounds; an unconverged "
    "run is visible, never silent).  The oracle replays the identical "
    "rounds as MATERIALIZED CTEs.  Per-round cost is linear in "
    "surviving edges; the LSH cap bounds the edge set upstream",
)
def dup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.llm_ops import _JACCARD_TAU, _verified_pairs

    d = load(spark, sf_dir, "documents")
    edges = (
        _verified_pairs(d)
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    out = []
    for k in KCORE_KS:
        cur = edges
        prev_cnt = None
        for _i in range(KCORE_ROUNDS):
            prev_cnt = cur.count()
            keep = (
                # one scan + map-side explode instead of two union'd scans
                cur.select(
                    F.explode(F.array("doc_a", "doc_b")).alias("node")
                )
                .groupBy("node")
                .agg(F.count("*").alias("dg"))
                .where(F.col("dg") >= k)
                .select("node")
            )
            cur = (
                cur.join(
                    keep.withColumnsRenamed({"node": "doc_a"}),
                    "doc_a",
                    "left_semi",
                )
                .join(
                    keep.withColumnsRenamed({"node": "doc_b"}),
                    "doc_b",
                    "left_semi",
                )
                .localCheckpoint(eager=True)  # truncate per-round lineage
            )
        n_edges = cur.count()
        n_nodes = (
            cur.select(F.col("doc_a").alias("n"))
            .union(cur.select("doc_b"))
            .distinct()
            .count()
        )
        out.append((k, n_nodes, n_edges, n_edges == prev_cnt))
    return spark.createDataFrame(
        out, "k long, n_core_nodes long, n_core_edges long, converged boolean"
    ).orderBy("k")


def _rank2_table(g: DataFrame, key: str) -> DataFrame:
    """Per-distinct-value doubled midranks WITHOUT a single-partition
    window: ``g`` is (key, cnt, ...); appends rank2 = 2·(#smaller) +
    (cnt + 1) — the tie midrank in doubled (integer) units — via the
    distributed prefix-scan recipe (range partition + local sums +
    broadcast offsets)."""
    from sparkroach.queries.analytics16 import running_global_sum

    r = running_global_sum(g, key, "cnt")
    return r.withColumn(
        "rank2",
        (F.lit(2) * (F.col("running") - F.col("cnt")) + F.col("cnt") + 1)
        .cast("long"),
    ).drop("running")


# ---------------------------------------------------------------------------
# events_mann_whitney_u — exact rank-sum test with tie correction
# ---------------------------------------------------------------------------

MW_TYPE_A = "click"
MW_TYPE_B = "purchase"
MW_MAX_N = 2_000_000  # keeps (n+1)n(n-1) inside exactly-casted BIGINT

_MW_ORACLE = f"""
    WITH s AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type IN ('{MW_TYPE_A}', '{MW_TYPE_B}')
    ),
    g AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN event_type = '{MW_TYPE_A}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt1
        FROM s GROUP BY v
    ),
    r AS (SELECT *, SUM(cnt) OVER (ORDER BY v) AS run FROM g),
    a AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt1) AS BIGINT) AS n1,
               CAST(SUM(cnt1 * (2 * (run - cnt) + cnt + 1)) AS BIGINT)
                   AS r1_sum2,
               CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cubes
        FROM r
    )
    SELECT n, n1, n - n1 AS n2, r1_sum2,
           r1_sum2 - n1 * (n1 + 1) AS u1_2,
           tie_cubes,
           CAST(r1_sum2 - n1 * (n1 + 1) - n1 * (n - n1) AS DOUBLE)
           / (2.0 * sqrt(CAST(n1 * (n - n1) AS DOUBLE)
                         * CAST((n + 1) * n * (n - 1) - tie_cubes AS DOUBLE)
                         / CAST(12 * n * (n - 1) AS DOUBLE))) AS z
    FROM a
"""


@register(
    "events_mann_whitney_u",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_value_ks_drift (two-sample distribution comparison over
    # exact integer cents through the distributed prefix-scan recipe —
    # the recorded r7 plan family); the midrank/tie-correction algebra
    # is pinned against scipy conventions via a numpy reference in
    # tests/test_analytics29.py.
    gated=False,
    oracle=_MW_ORACLE,
    survey_ref="§2C analytic breadth / statistics — the Mann-Whitney U "
    "rank-sum test (two-sample location shift, tie-corrected normal "
    "approximation): the nonparametric complement to the KS and χ² "
    "drift detectors",
    description=f"'{MW_TYPE_A}' vs '{MW_TYPE_B}' values as exact "
    "integer cents: tie midranks in DOUBLED units (2·#smaller + cnt + "
    "1 — integers, no .5), rank sums and the tie term Σ(t³−t) as "
    "exact aggregates over the distinct-value table, whose cumulative "
    "counts come from the distributed prefix-scan recipe (range "
    "partition + broadcast offsets — no single-partition window over "
    "the value domain).  z is ONE fixed-shape double expression whose "
    "every cast input stays inside BIGINT (correctly-rounded 64-bit "
    f"casts on both engines; pooled n guarded ≤ {MW_MAX_N} so "
    "(n+1)n(n−1) cannot leave that range — beyond it the documented "
    "promotion is DECIMAL statistics, not silent drift)",
)
def events_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from sparkroach.queries.analytics import cents

    s = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(MW_TYPE_A, MW_TYPE_B))
        .select("event_type", cents("value").alias("v"))
    )
    g = s.groupBy("v").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.when(F.col("event_type") == MW_TYPE_A, 1).otherwise(0))
        .cast("long")
        .alias("cnt1"),
    )
    r = _rank2_table(g, "v")
    row = r.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum(
            (F.col("cnt1") * F.col("rank2")).cast("decimal(38,0)")
        ).alias("r1_sum2"),
        F.sum(
            (
                F.col("cnt").cast("decimal(18,0)")
                * F.col("cnt")
                * F.col("cnt")
                - F.col("cnt")
            )
        ).alias("tie_cubes"),
    ).collect()[0]
    n, n1 = row["n"], row["n1"]
    if n is None or n < 3:
        raise ValueError("events_mann_whitney_u: too few pooled rows")
    if n > MW_MAX_N:
        raise ValueError(
            f"events_mann_whitney_u: pooled n={n} exceeds the "
            f"{MW_MAX_N} exact-BIGINT guard — promote the statistics "
            "to DECIMAL before raising it"
        )
    n2 = n - n1
    r1_sum2 = int(row["r1_sum2"])
    ties = int(row["tie_cubes"])
    u1_2 = r1_sum2 - n1 * (n1 + 1)
    u_delta = u1_2 - n1 * n2
    m = (n + 1) * n * (n - 1) - ties
    # identical expression tree to the oracle: three BIGINT→double
    # casts (correctly rounded), multiply, divide, sqrt, scale, divide
    z = float(u_delta) / (
        2.0 * math.sqrt(float(n1 * n2) * float(m) / float(12 * n * (n - 1)))
    )
    return spark.createDataFrame(
        [(n, n1, n2, r1_sum2, u1_2, ties, z)],
        "n long, n1 long, n2 long, r1_sum2 long, u1_2 long, "
        "tie_cubes long, z double",
    )


# ---------------------------------------------------------------------------
# lineitem_spearman_corr — Spearman's rho via centered doubled midranks
# ---------------------------------------------------------------------------

SP_X = "l_quantity"
SP_Y = "l_extendedprice"
SP_MAX_N = 2_000_000  # keeps |Σc·c| ≤ n³ inside BIGINT


def _spearman_oracle() -> str:
    return f"""
        WITH q AS (
            SELECT CAST(round({SP_X} * 100) AS BIGINT) AS x,
                   CAST(round({SP_Y} * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
        gx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY x),
        rx AS (
            SELECT x, 2 * (SUM(cnt) OVER (ORDER BY x) - cnt) + cnt + 1
                       AS rank2
            FROM gx
        ),
        gy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY y),
        ry AS (
            SELECT y, 2 * (SUM(cnt) OVER (ORDER BY y) - cnt) + cnt + 1
                       AS rank2
            FROM gy
        ),
        c AS (
            SELECT rx.rank2 - ((SELECT n FROM nn) + 1) AS cx,
                   ry.rank2 - ((SELECT n FROM nn) + 1) AS cy
            FROM q JOIN rx ON rx.x = q.x JOIN ry ON ry.y = q.y
        ),
        s AS (
            SELECT CAST(SUM(cx * cy) AS BIGINT) AS sxy,
                   CAST(SUM(cx * cx) AS BIGINT) AS sxx,
                   CAST(SUM(cy * cy) AS BIGINT) AS syy
            FROM c
        )
        SELECT (SELECT n FROM nn) AS n_rows, sxy, sxx, syy,
               CAST(sxy AS DOUBLE)
                   / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
                   AS spearman_rho
        FROM s
    """


@register(
    "lineitem_spearman_corr",
    # R9-window candidate: registered gated=False, DELEGATED to
    # lineitem_corr_matrix → recorded twin orders_profile_report (one-
    # pass exact sufficient statistics with fixed-shape double tails —
    # the recorded profiling plan family); the centered-midrank
    # identity (Σ rank2 = n(n+1) exactly, ties included) and agreement
    # with scipy conventions are pinned in tests/test_analytics29.py.
    gated=False,
    oracle=_spearman_oracle(),
    survey_ref="§2C analytic breadth / statistics — Spearman rank "
    "correlation (monotone association, tie-midranked): the robust "
    "companion to the Pearson correlation matrix",
    description=f"ρ between {SP_X} and {SP_Y}: doubled tie midranks "
    "per column from the distributed prefix-scan recipe, CENTERED by "
    "the exact doubled mean n+1 (Σ rank2 = n(n+1) regardless of "
    "ties), so ρ = Σcxcy/√(Σcx²·Σcy²) over integers bounded by n³ — "
    f"inside correctly-rounded BIGINT casts (n guarded ≤ {SP_MAX_N}; "
    "no 128-bit integers ever meet a double).  Two value-keyed rank "
    "joins + one aggregate; the rank tables are distinct-value-sized",
)
def lineitem_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.expr(f"CAST(round({SP_X} * 100) AS BIGINT)").alias("x"),
        F.expr(f"CAST(round({SP_Y} * 100) AS BIGINT)").alias("y"),
    )
    q = li.localCheckpoint(eager=True)  # reused: n, both rank builds, join
    n = q.count()
    if n < 2:
        raise ValueError("lineitem_spearman_corr: too few rows")
    if n > SP_MAX_N:
        raise ValueError(
            f"lineitem_spearman_corr: n={n} exceeds the {SP_MAX_N} "
            "exact-BIGINT guard — promote the statistics to DECIMAL "
            "before raising it"
        )
    rx = _rank2_table(
        q.groupBy("x").agg(F.count("*").cast("long").alias("cnt")), "x"
    ).select("x", (F.col("rank2") - (n + 1)).alias("cx"))
    ry = _rank2_table(
        q.groupBy("y").agg(F.count("*").cast("long").alias("cnt")), "y"
    ).select("y", (F.col("rank2") - (n + 1)).alias("cy"))
    s = (
        q.join(rx, "x")
        .join(ry, "y")
        .agg(
            F.sum((F.col("cx") * F.col("cy")).cast("decimal(38,0)"))
            .cast("long")
            .alias("sxy"),
            F.sum((F.col("cx") * F.col("cx")).cast("decimal(38,0)"))
            .cast("long")
            .alias("sxx"),
            F.sum((F.col("cy") * F.col("cy")).cast("decimal(38,0)"))
            .cast("long")
            .alias("syy"),
        )
    )
    return s.selectExpr(
        f"CAST({n} AS BIGINT) AS n_rows",
        "sxy",
        "sxx",
        "syy",
        "CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) "
        "* sqrt(CAST(syy AS DOUBLE))) AS spearman_rho",
    )
