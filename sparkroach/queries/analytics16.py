"""Analytics breadth, round-4 continuation (wave 8): the grouped-agg
pandas UDAF lane and a distributed prefix-sum interval sweep.

- ``events_value_median_udaf``: per-type median + MAD (median absolute
  deviation) through ``pandas_udf`` GROUPED_AGG — the one Python-UDF API
  lane the repo had not yet exercised (scalar pandas UDFs run in the
  chain plane, applyInPandas/mapInPandas/mapInArrow/UDTF in streaming +
  multimodal).  MAD is the robust-statistics complement to
  ``events_anomaly_zscore``'s mean/stddev — and a genuine UDAF case: no
  single-pass built-in computes a median of absolute deviations *from
  the group's own median*.  Float discipline: numpy's even-count median
  is ``(a+b)/2`` on the two middle elements and DuckDB's interpolated
  median is the same single IEEE op, so both engines emit bit-identical
  doubles (verified element-wise before registration; the subtraction
  inside MAD is likewise one correctly-rounded op per element).
  At-scale caveat, by design of the lane: GROUPED_AGG materializes one
  group per Arrow batch, so groups must fit an executor — the
  corpus-scale exact-quantile path is ``token_quantiles_by_source``'s
  two-pass shape; THIS op is the API-lane gate.

- ``sessions_concurrency_peak``: peak concurrent user sessions and the
  first instant it is reached — the classic interval boundary sweep
  (+1 at session start, −1 at end, running sum over the time-ordered
  boundary stream).  A running sum over one global order is the
  textbook "inherently sequential" trap; the Spark side executes it as
  a DISTRIBUTED PREFIX SUM: range-partition the boundary stream on the
  sort key, per-partition running sums (window within partition id),
  then per-partition totals — one tiny row per partition — collected,
  exclusive-prefix-summed on the driver, and broadcast back as
  partition offsets.  ``repartitionByRange`` guarantees ascending
  partition ids hold ascending key ranges, so offset(pid) + local
  running sum IS the global running sum.  The driver collect is O(shuffle
  partitions) bookkeeping rows, never data.  Tie rule: starts sort
  before ends at the same microsecond (delta DESC), so touching
  sessions count as concurrent; the peak value and its first timestamp
  are invariant to the remaining intra-tie order (the max prefix lands
  after all +1s of an instant regardless of their order).

Both gated=False on registration: r5/r6 rotation candidates, swept by
the local oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# grouped-agg pandas UDAF: median + MAD per event type
# ---------------------------------------------------------------------------


@pandas_udf(T.DoubleType())
def _median_udaf(v: pd.Series) -> float:  # Series -> scalar = GROUPED_AGG
    import numpy as np

    return float(np.median(v.to_numpy()))


@pandas_udf(T.DoubleType())
def _mad_udaf(v: pd.Series) -> float:
    import numpy as np

    a = v.to_numpy()
    return float(np.median(np.abs(a - np.median(a))))


# Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates in one
# agg() ([INVALID_PANDAS_UDF_PLACEMENT]), so the row count rides the same
# lane instead of F.count
@pandas_udf(T.LongType())
def _count_udaf(v: pd.Series) -> int:
    return int(len(v))


@register(
    "events_value_median_udaf",
    gated=False,
    oracle="""
        WITH m AS (SELECT event_type, median(value) AS med
                   FROM events GROUP BY event_type)
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               any_value(m.med) AS med_value,
               median(abs(e.value - m.med)) AS mad_value
        FROM events e JOIN m USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    survey_ref="§2C aggregation — user-defined aggregate through the "
    "pandas_udf GROUPED_AGG lane (Arrow-batched, one group per call); "
    "robust median/MAD statistics no single-pass built-in expresses",
    description="per-type median + median-absolute-deviation via pandas "
    "UDAF; numpy and DuckDB both interpolate even-count medians with one "
    "(a+b)/2 IEEE op so the doubles hash-match — the GROUPED_AGG API-lane "
    "gate (scale path for exact quantiles stays the two-pass shape)",
)
def events_value_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            _count_udaf("value").alias("n_events"),
            _median_udaf("value").alias("med_value"),
            _mad_udaf("value").alias("mad_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# distributed prefix sum: peak concurrent sessions
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1_800_000_000  # 30 min, same rule as events_user_sessions

_CONCURRENCY_ORACLE = f"""
    WITH us AS (
        SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS t_us FROM events
    ),
    gaps AS (
        SELECT user_id, t_us,
               CASE WHEN t_us - lag(t_us) OVER (
                            PARTITION BY user_id ORDER BY t_us, event_id)
                         > {SESSION_GAP_US}
                    OR lag(t_us) OVER (
                            PARTITION BY user_id ORDER BY t_us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM us
    ),
    sess AS (
        SELECT user_id, t_us,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY t_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM gaps
    ),
    iv AS (SELECT user_id, sid, MIN(t_us) AS s_us, MAX(t_us) AS e_us
           FROM sess GROUP BY user_id, sid),
    b AS (SELECT s_us AS t, 1 AS delta FROM iv
          UNION ALL SELECT e_us, -1 FROM iv),
    r AS (SELECT t, SUM(delta) OVER (
              ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS c
          FROM b),
    mx AS (SELECT MAX(c) AS peak FROM r)
    SELECT CAST(mx.peak AS BIGINT) AS peak_concurrency,
           CAST((SELECT MIN(t) FROM r WHERE c = mx.peak) AS BIGINT)
               AS first_peak_us,
           CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_sessions
    FROM mx
"""


def _session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, s_us, e_us) gap-based session intervals — same
    microsecond-exact rule as events_user_sessions / SESSIONS_ORACLE."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gap = F.col("t_us") - F.lag("t_us").over(w)
    new_session = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("t_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "t_us", new_session.alias("ns"))
        .select("user_id", "t_us", F.sum("ns").over(wsum).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(F.min("t_us").alias("s_us"), F.max("t_us").alias("e_us"))
    )


def running_global_sum(b: DataFrame, key: str, val: str) -> DataFrame:
    """Append a globally-ordered running sum of ``val`` in ``key`` order
    WITHOUT a single-partition window: range-partition on the key,
    per-partition running sums, then broadcast exclusive-prefix offsets
    computed from the per-partition totals (one bookkeeping row per
    partition through the driver).  Relies on repartitionByRange's
    contract that ascending partition ids hold ascending key ranges."""
    spark = b.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        b.repartitionByRange(n_parts, F.col(key))
        .sortWithinPartitions(key)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin the partitioning for both consumers
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = {
        r["_pid"]: r["tot"]
        for r in part.groupBy("_pid").agg(F.sum(val).alias("tot")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    return (
        part.withColumn("_loc", F.sum(val).over(wloc))
        .join(F.broadcast(off), "_pid")
        .withColumn("running", (F.col("_off") + F.col("_loc")).cast("long"))
        .drop("_pid", "_loc", "_off")
    )


def global_row_number(df: DataFrame, order_cols, out: str = "rank") -> DataFrame:
    """Append a globally-ordered ``row_number()`` in ``order_cols`` order
    WITHOUT a single-partition window (the same distributed-prefix recipe
    as :func:`running_global_sum`, with per-partition row COUNTS as the
    offsets): range-partition on the ordering expressions, a per-partition
    local row_number, then broadcast exclusive-prefix offsets — one
    bookkeeping row per partition through the driver.  ``order_cols`` are
    Column expressions and may carry ``.desc()``; the total order must be
    unique for the result to be deterministic (callers order by a key
    suffix).  Relies on repartitionByRange's contract that ascending
    partition ids hold ascending ranges of the sort expressions."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin the partitioning for both consumers
    )
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    counts = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    return (
        part.withColumn("_loc", F.row_number().over(wloc))
        .join(F.broadcast(off), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_loc")).cast("long"))
        .drop("_pid", "_loc", "_off")
    )


@register(
    "sessions_concurrency_peak",
    gated=False,
    oracle=_CONCURRENCY_ORACLE,
    survey_ref="§2C window/interval analytics — interval boundary sweep "
    "(peak concurrency) executed as a distributed prefix sum: range "
    "partition + local running sums + broadcast partition offsets",
    description="peak concurrent 30-min-gap sessions and the first "
    "microsecond it is reached: +1/-1 boundary stream, global running "
    "sum WITHOUT a single-partition window — per-partition sums plus "
    "collected per-partition totals (O(partitions) driver rows) give "
    "the exact global prefix sum; starts order before ends on ties",
)
def sessions_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _session_intervals(spark, sf_dir)
    starts = iv.select(F.col("s_us").alias("t"), F.lit(1).alias("delta"))
    ends = iv.select(F.col("e_us").alias("t"), F.lit(-1).alias("delta"))
    # sort key: starts (delta=+1) before ends (delta=-1) at equal t
    b = starts.unionByName(ends).withColumn(
        "_k", F.col("t") * 2 + F.when(F.col("delta") == 1, 0).otherwise(1)
    )
    r = running_global_sum(b, "_k", "delta")
    peak = r.agg(F.max("running").alias("peak"))
    first = (
        r.join(F.broadcast(peak), r["running"] == peak["peak"])
        .agg(
            F.any_value("peak").alias("peak_concurrency"),
            F.min("t").alias("first_peak_us"),
        )
    )
    n_sess = iv.agg(F.count("*").alias("n_sessions"))
    return first.crossJoin(n_sess).select(
        F.col("peak_concurrency").cast("long"),
        F.col("first_peak_us").cast("long"),
        F.col("n_sessions").cast("long"),
    )


# ---------------------------------------------------------------------------
# events_value_ks_drift — exact two-sample Kolmogorov–Smirnov (r6)
# ---------------------------------------------------------------------------
# Corpus drift detection, the training-data-pipeline question "did this
# snapshot's distribution move?", answered with the classic two-sample KS
# statistic — EXACTLY.  D = max_v |F_A(v) - F_B(v)| is a rational with
# denominator n_a*n_b, so the comparison runs entirely on the integer
# numerator |ra*n_b - rb*n_a| (ra/rb = running counts <= v per sample)
# and the only IEEE operation is ONE final division, identical in both
# engines.  The split point is integer arithmetic over unix micros
# ((min+max) div 2), so sample membership is exact too.
#
# 100 TB posture: the per-value count table shrinks the stream to its
# distinct values, and the global running counts come from the same
# distributed prefix-sum recipe sessions_concurrency_peak pins (range
# partition + local running sums + O(partitions) broadcast offsets — no
# single-partition window).  Both samples ride ONE prefix pass: the two
# per-value counts are packed into one SIGNED 64-bit accumulator
# (ca*2^32 + cb), exact while each sample holds < 2^31 rows (the running
# high half ra*2^32 must stay below 2^63; that bound also keeps the
# numerator |ra*n_b - rb*n_a| < 2^62) — beyond that, widen to two
# prefix passes (the recipe is linear either way).  A runtime guard
# (_KS_PACK_MAX) raises instead of silently overflowing.

# Single-pass packed-prefix exactness bound: each sample must hold
# < 2^31 rows so the running high half (ra * 2^32) stays inside a signed
# 64-bit long and |ra*n_b - rb*n_a| < 2^62.  Module-level so tests can
# exercise the guard without materializing 2^31 rows.
_KS_PACK_MAX = 1 << 31

_KS_ORACLE = """
    WITH bounds AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
        FROM events
    ),
    lab AS (
        SELECT value,
               CASE WHEN epoch_us(ts) < bounds.mid THEN 0 ELSE 1 END AS grp
        FROM events, bounds
        WHERE value IS NOT NULL
    ),
    tot AS (
        SELECT CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_b
        FROM lab
    ),
    per AS (
        SELECT value,
               CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS ca,
               CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS cb
        FROM lab GROUP BY value
    ),
    run AS (
        SELECT value,
               SUM(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS ra,
               SUM(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS rb
        FROM per
    ),
    d AS (
        SELECT value,
               abs(CAST(ra AS BIGINT) * tot.n_b
                   - CAST(rb AS BIGINT) * tot.n_a) AS numer
        FROM run, tot
    ),
    mx AS (SELECT max(numer) AS ks_numer FROM d),
    at AS (
        SELECT min(value) AS ks_at_value
        FROM d, mx WHERE d.numer = mx.ks_numer
    )
    SELECT tot.n_a, tot.n_b,
           CAST(mx.ks_numer AS BIGINT) AS ks_numer,
           at.ks_at_value,
           CAST(mx.ks_numer AS DOUBLE) / (tot.n_a * tot.n_b) AS ks_stat
    FROM tot, mx, at
"""


@register(
    "events_value_ks_drift",
    oracle=_KS_ORACLE,
    survey_ref="LLM ops: corpus drift detection — exact two-sample "
    "Kolmogorov-Smirnov over the event-value distribution (first vs "
    "second half of the time range), integer-numerator rational "
    "arithmetic with one final IEEE division",
    description="two-sample KS as a distributed prefix sum: per-value "
    "counts of both samples packed into one signed-64-bit running "
    "accumulator (ca*2^32+cb, exact below 2^31 rows per sample — "
    "runtime-guarded, not silent) through the "
    "range-partitioned prefix recipe — no single-partition window; "
    "D's numerator |ra*n_b - rb*n_a| stays integer so both engines "
    "agree bit-for-bit; ks_at_value is the smallest value attaining "
    "the max for determinism",
    gated=False,
)
def events_value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.unix_micros("ts").alias("t"), "value")
    )
    bounds = ev.agg(F.expr("(min(t) + max(t)) div 2").alias("mid"))
    lab = ev.join(F.broadcast(bounds)).select(  # 1-row scalar crossJoin
        "value", (F.col("t") < F.col("mid")).alias("is_a")
    )
    tot = lab.agg(
        F.sum(F.col("is_a").cast("long")).alias("n_a"),
        F.sum((~F.col("is_a")).cast("long")).alias("n_b"),
    )
    per = lab.groupBy("value").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    packed = per.withColumn(
        "comb", F.col("ca") * F.lit(4294967296) + F.col("cb")
    )
    run = running_global_sum(packed, "value", "comb")
    # Runtime overflow guard: assert_true raises (instead of silently
    # corrupting the packed accumulator) if either sample reaches the
    # 2^31-row single-pass bound; on success it evaluates to NULL, so the
    # coalesce leaves `numer` untouched and the output schema unchanged.
    guard = F.coalesce(
        F.assert_true(
            (F.col("n_a") < F.lit(_KS_PACK_MAX))
            & (F.col("n_b") < F.lit(_KS_PACK_MAX)),
            F.lit(
                "events_value_ks_drift: packed single-pass prefix is exact "
                "only below 2^31 rows per sample; run the two-pass variant"
            ),
        ).cast("long"),
        F.lit(0),
    )
    d = (
        run.join(F.broadcast(tot))
        .select(
            "value",
            "n_a",
            "n_b",
            (
                F.abs(
                    F.shiftright("running", 32) * F.col("n_b")
                    - F.col("running").bitwiseAND(F.lit(4294967295))
                    * F.col("n_a")
                )
                + guard
            ).alias("numer"),
        )
    )
    mx = d.agg(F.max("numer").alias("ks_numer"))
    return (
        d.join(F.broadcast(mx), d["numer"] == mx["ks_numer"])
        .agg(
            F.any_value("n_a").alias("n_a"),
            F.any_value("n_b").alias("n_b"),
            F.any_value("ks_numer").alias("ks_numer"),
            F.min("value").alias("ks_at_value"),
            (
                F.any_value("ks_numer").cast("double")
                / (F.any_value("n_a") * F.any_value("n_b")).cast("double")
            ).alias("ks_stat"),
        )
    )


# ---------------------------------------------------------------------------
# events_type_drift_chi2 — categorical drift (r6, KS's categorical twin)
# ---------------------------------------------------------------------------
# The categorical companion to events_value_ks_drift: did the event-TYPE
# mix shift between the two halves of the time range?  Pearson chi² over
# the 2×K contingency table.  Exactness recipe: each cell's deviation
# d = o·grand − row_total·col_total is INTEGER (computed in BIGINT, no
# rounding); d fits a double exactly (< 2^53 up to ~10^8-row halves), so
# d·d and the one division per term are the same IEEE operations in both
# engines; per-term values are then quantized to DECIMAL(28,9) before
# summation (the BM25 recipe) so the sum is order-independent and
# hash-neutral.  chi2 here = classic Σ(o−e)²/e scaled by grand
# (constant): rank-order and threshold comparisons are unaffected, and
# the scale makes every intermediate exact.

_CHI2_ORACLE = """
    WITH bounds AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
        FROM events
    ),
    lab AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) < bounds.mid THEN 0 ELSE 1 END AS grp
        FROM events, bounds
    ),
    cell AS (
        SELECT event_type, grp, CAST(count(*) AS BIGINT) AS o
        FROM lab GROUP BY event_type, grp
    ),
    -- complete 2xK table: a type absent from one half is a 0 cell
    full_cell AS (
        SELECT t.event_type, g.grp, COALESCE(c.o, 0) AS o
        FROM (SELECT DISTINCT event_type FROM cell) t
        CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) g
        LEFT JOIN cell c USING (event_type, grp)
    ),
    rt AS (SELECT grp, CAST(SUM(o) AS BIGINT) AS row_tot
           FROM full_cell GROUP BY grp),
    ct AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS col_tot
           FROM full_cell GROUP BY event_type),
    g AS (SELECT CAST(SUM(o) AS BIGINT) AS grand FROM full_cell),
    term AS (
        SELECT f.event_type,
               CAST(
                   CAST(f.o * g.grand - rt.row_tot * ct.col_tot AS DOUBLE)
                   * CAST(f.o * g.grand - rt.row_tot * ct.col_tot AS DOUBLE)
                   / CAST(rt.row_tot * ct.col_tot AS DOUBLE)
                   AS DECIMAL(28,9)) AS t_q
        FROM full_cell f
        JOIN rt ON rt.grp = f.grp
        JOIN ct ON ct.event_type = f.event_type
        CROSS JOIN g
    )
    SELECT t.event_type,
           ct.col_tot AS n_events,
           CAST(SUM(t.t_q) AS DOUBLE) AS chi2_scaled_contrib
    FROM term t JOIN ct ON ct.event_type = t.event_type
    GROUP BY t.event_type, ct.col_tot
    ORDER BY t.event_type
"""


@register(
    "events_type_drift_chi2",
    oracle=_CHI2_ORACLE,
    survey_ref="LLM ops: categorical corpus drift — Pearson chi2 over "
    "the 2xK (half x event_type) contingency table, grand-scaled so "
    "every intermediate is integer-exact, per-term decimal quantization "
    "(the BM25 recipe) keeps the sum engine-identical",
    description="per-type chi2 contribution (scaled by the constant "
    "grand total: threshold/rank semantics unchanged, intermediates "
    "exact): the 2xK table completes missing cells to 0, deviations "
    "o*grand - rt*ct stay BIGINT, one IEEE division per cell, "
    "DECIMAL(28,9) quantization before the order-insensitive sum. "
    "Grouped counts + broadcast scalar totals only — no prefix pass "
    "needed (the KS gate pins that machinery)",
    gated=False,
)
def events_type_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("t"), "event_type"
    )
    bounds = ev.agg(F.expr("(min(t) + max(t)) div 2").alias("mid"))
    lab = ev.join(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("t") < F.col("mid"), F.lit(0)).otherwise(F.lit(1)).alias("grp"),
    )
    cell = lab.groupBy("event_type", "grp").agg(F.count("*").alias("o"))
    types = cell.select("event_type").distinct()
    grps = spark.range(2).select(F.col("id").cast("int").alias("grp"))
    full_cell = (
        types.crossJoin(F.broadcast(grps))
        .join(cell, ["event_type", "grp"], "left")
        .select("event_type", "grp", F.coalesce("o", F.lit(0)).alias("o"))
    )
    rt = full_cell.groupBy("grp").agg(F.sum("o").alias("row_tot"))
    ct = full_cell.groupBy("event_type").agg(F.sum("o").alias("col_tot"))
    g = full_cell.agg(F.sum("o").alias("grand"))
    dev = (F.col("o") * F.col("grand") - F.col("row_tot") * F.col("col_tot")).cast(
        "double"
    )
    term = (
        full_cell.join(F.broadcast(rt), "grp")
        .join(F.broadcast(ct), "event_type")
        .join(F.broadcast(g))
        .select(
            "event_type",
            "col_tot",
            (
                dev * dev / (F.col("row_tot") * F.col("col_tot")).cast("double")
            ).cast("decimal(28,9)").alias("t_q"),
        )
    )
    return (
        term.groupBy("event_type", "col_tot")
        .agg(F.sum("t_q").cast("double").alias("chi2_scaled_contrib"))
        .select(
            "event_type",
            F.col("col_tot").alias("n_events"),
            "chi2_scaled_contrib",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_drift_timeline — consecutive-window drift monitor (r6)
# ---------------------------------------------------------------------------
# The production artifact the two drift tests compose into: a TIMELINE of
# drift scores between each pair of adjacent 6-hour windows — what a
# pipeline monitor alerts on.  Same grand-scaled chi² recipe as
# events_type_drift_chi2, applied per adjacent-window pair.  Plan shape:
# ONE count shuffle on (window, type); each count row then contributes
# to its two adjacent pairs via a 2-way UNION ALL re-key (no window
# functions, no global sort, no scalar crossJoins) and a second grouped
# agg on (pair, type) — everything scales with the number of windows ×
# types, never with raw event rows.  Pairs exist only where BOTH
# calendar slots have events (a gap yields no row — absence of data is
# not drift).

_W6_US = 6 * 3600 * 1_000_000

_DRIFT_TIMELINE_ORACLE = f"""
    WITH cnt AS (
        SELECT epoch_us(ts) // {_W6_US} AS win, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    wins AS (SELECT win, CAST(SUM(n) AS BIGINT) AS wn FROM cnt GROUP BY win),
    pairs AS (
        SELECT a.win AS p, a.wn AS n_prev, b.wn AS n_curr
        FROM wins a JOIN wins b ON b.win = a.win + 1
    ),
    contrib AS (
        SELECT win AS p, event_type, n AS ca, CAST(0 AS BIGINT) AS cb
        FROM cnt
        UNION ALL
        SELECT win - 1 AS p, event_type, CAST(0 AS BIGINT) AS ca, n AS cb
        FROM cnt
    ),
    cell AS (
        SELECT c.p, c.event_type,
               CAST(SUM(ca) AS BIGINT) AS ca, CAST(SUM(cb) AS BIGINT) AS cb
        FROM contrib c JOIN pairs ON pairs.p = c.p
        GROUP BY c.p, c.event_type
    ),
    term AS (
        SELECT cell.p,
               CAST(
                   CAST(cell.ca * (pr.n_prev + pr.n_curr)
                        - pr.n_prev * (cell.ca + cell.cb) AS DOUBLE)
                   * CAST(cell.ca * (pr.n_prev + pr.n_curr)
                          - pr.n_prev * (cell.ca + cell.cb) AS DOUBLE)
                   / CAST(pr.n_prev * (cell.ca + cell.cb) AS DOUBLE)
                   AS DECIMAL(28,9))
               + CAST(
                   CAST(cell.cb * (pr.n_prev + pr.n_curr)
                        - pr.n_curr * (cell.ca + cell.cb) AS DOUBLE)
                   * CAST(cell.cb * (pr.n_prev + pr.n_curr)
                          - pr.n_curr * (cell.ca + cell.cb) AS DOUBLE)
                   / CAST(pr.n_curr * (cell.ca + cell.cb) AS DOUBLE)
                   AS DECIMAL(28,9)) AS t_q
        FROM cell JOIN pairs pr ON pr.p = cell.p
    )
    SELECT CAST(pr.p * {_W6_US} AS BIGINT) AS window_start_us,
           pr.n_prev, pr.n_curr,
           CAST(SUM(t.t_q) AS DOUBLE) AS chi2_scaled
    FROM term t JOIN pairs pr ON pr.p = t.p
    GROUP BY pr.p, pr.n_prev, pr.n_curr
    ORDER BY window_start_us
"""


@register(
    "events_drift_timeline",
    oracle=_DRIFT_TIMELINE_ORACLE,
    survey_ref="LLM ops: drift monitoring timeline — grand-scaled chi2 "
    "between every pair of adjacent 6-hour windows' event_type mixes; "
    "the alerting artifact the KS/chi2 drift tests compose into",
    description="per adjacent-window-pair categorical drift score: one "
    "count shuffle on (window, type), a UNION ALL re-key so each count "
    "feeds its two adjacent pairs, a second grouped agg — no window "
    "functions, no global sort, no scalar joins; deviations stay "
    "BIGINT-exact, one IEEE division per cell, DECIMAL(28,9) "
    "quantization before the order-insensitive per-pair sum; gaps "
    "yield no pair (absence of data is not drift)",
    gated=False,
)
def events_drift_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        # integer floor division (div), matching the oracle's `//` exactly —
        # float division + cast('long') truncates toward zero, diverging for
        # pre-epoch timestamps and losing exactness past 2^53 micros
        F.expr(f"unix_micros(ts) div {_W6_US}").alias("win"),
        "event_type",
    )
    cnt = ev.groupBy("win", "event_type").agg(F.count("*").alias("n"))
    wins = cnt.groupBy("win").agg(F.sum("n").alias("wn"))
    pairs = (
        wins.alias("a")
        .join(wins.alias("b"), F.col("b.win") == F.col("a.win") + 1)
        .select(
            F.col("a.win").alias("p"),
            F.col("a.wn").alias("n_prev"),
            F.col("b.wn").alias("n_curr"),
        )
    )
    contrib = cnt.select(
        F.col("win").alias("p"), "event_type",
        F.col("n").alias("ca"), F.lit(0).cast("long").alias("cb"),
    ).unionByName(
        cnt.select(
            (F.col("win") - 1).alias("p"), "event_type",
            F.lit(0).cast("long").alias("ca"), F.col("n").alias("cb"),
        )
    )
    cell = (
        contrib.join(pairs.select("p"), "p")
        .groupBy("p", "event_type")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    j = cell.join(pairs, "p")
    grand = F.col("n_prev") + F.col("n_curr")
    ct = F.col("ca") + F.col("cb")
    dev_a = (F.col("ca") * grand - F.col("n_prev") * ct).cast("double")
    dev_b = (F.col("cb") * grand - F.col("n_curr") * ct).cast("double")
    t_q = (
        (dev_a * dev_a / (F.col("n_prev") * ct).cast("double")).cast(
            "decimal(28,9)"
        )
        + (dev_b * dev_b / (F.col("n_curr") * ct).cast("double")).cast(
            "decimal(28,9)"
        )
    )
    return (
        j.select("p", "n_prev", "n_curr", t_q.alias("t_q"))
        .groupBy("p", "n_prev", "n_curr")
        .agg(F.sum("t_q").cast("double").alias("chi2_scaled"))
        .select(
            (F.col("p") * F.lit(_W6_US)).cast("long").alias("window_start_us"),
            "n_prev",
            "n_curr",
            "chi2_scaled",
        )
        .orderBy("window_start_us")
    )
