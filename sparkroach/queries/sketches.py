"""Mergeable distinct-count sketches (HyperLogLog), round 4 continuation.

At 100 TB, exact COUNT(DISTINCT) over a high-cardinality key is a full
shuffle of the key set; the production answer is a SKETCH: a tiny
fixed-size register array that (a) builds with one map-side pass, (b)
MERGES associatively (register-wise max), so partial sketches combine
across partitions/days/sources without ever re-touching the data.  Spark
ships approx_count_distinct (HLL++) and DuckDB ships approx_distinct, but
their internals differ, so their outputs can never hash-match — these
operators instead implement the textbook HyperLogLog (Flajolet et al.
2007) from scratch IN EACH ENGINE with md5-derived hashes and exact
integer register arithmetic, which makes the sketch itself (not just its
input) engine-exact:

- every register value is an integer (max leading-zero rank per bucket);
- the indicator sum Z = Σ 2^-M_j is carried as the exact integer
  S_int = Σ 2^(25-M_j) (all terms are powers of two ≥ 1, so even the
  double-precision view is exact — no float summation-order hazard);
- the final estimate α·m²/Z is a fixed literal-arithmetic expression
  evaluated identically by both engines (one IEEE division at the end).

``hll_distinct_sketch``  — global sketch over events.event_id, reported
  next to the exact distinct count (the accuracy statement is part of the
  output, not a claim in a docstring).
``hll_sketch_merge``     — per-event_type sketches PLUS the merged 'ALL'
  row computed by register-wise max over the per-type registers: the
  mergeability property that makes sketches the 100 TB answer, executed
  (a later test pins merged == direct-global).

Honesty note: the raw HLL estimator is biased low-cardinality (n ≲ 2.5m);
the standard fix is linear counting (m·ln(m/empty_buckets)), which is
deliberately NOT applied here because ln() is a libm call whose last bit
may differ across engines and these outputs are hash-compared bit-for-bit.
``empty_buckets`` is emitted so a consumer can apply it.

Reference parity note: the reference (algorand/conduit-cockroachdb) has no
sketch plane; this is part of the beyond-reference training-data surface.

Registered gated=False (driver window full this round); local-oracle swept;
r5 rotation candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_REST_BITS = 32 - HLL_P  # 24 low bits feed the rank
_RHO_MAX = _REST_BITS + 1  # rank when the rest is all zeros
# integer register weight: 2^(RHO_MAX - M_j); empty bucket (M=0) weighs 2^RHO_MAX
_W_FULL = 1 << _RHO_MAX
# α_m · m² · 2^RHO_MAX / S_int, with α_m = 0.7213/(1 + 1.079/m) written as
# literal arithmetic so both engines evaluate the identical double chain.
# Every literal is CAST to DOUBLE explicitly: Spark (and DuckDB) parse bare
# decimal literals as DECIMAL, whose division rounds at decimal scale and
# diverges from the IEEE chain in the other engine (caught by the sweep:
# 998.890417862106 vs 998.8904141319888).
_EST_NUM = (
    f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
    f"+ CAST(1.079 AS DOUBLE) / CAST({HLL_M} AS DOUBLE))) "
    f"* CAST({HLL_M * HLL_M} AS DOUBLE) * CAST({_W_FULL} AS DOUBLE)"
)

_HEX = "0123456789abcdef"
# DuckDB has no hex→int conv(); parse the md5 prefix positionally
_H32_SQL = " + ".join(
    f"(instr('{_HEX}', substring(m, {k + 1}, 1)) - 1) * {16 ** (7 - k)}"
    for k in range(8)
)
# rank of the first set bit in the 24-bit rest (rho = RHO_MAX - bit_length)
_RHO_SQL = (
    f"CASE WHEN rest = 0 THEN {_RHO_MAX} "
    + " ".join(
        f"WHEN rest >= {1 << (k - 1)} THEN {_RHO_MAX - k}"
        for k in range(_REST_BITS, 0, -1)
    )
    + " END"
)
# exact integer weight of one register
_W_SQL = f"CAST({_W_FULL} AS BIGINT) // (CAST(1 AS BIGINT) << m_j)"
_W_SPARK = f"CAST({_W_FULL} AS BIGINT) div shiftleft(CAST(1 AS BIGINT), m_j)"


def _rho_col():
    """Spark Column: rank of the first set bit of `rest` (24-bit field)."""
    whens = F.when(F.col("rest") == 0, F.lit(_RHO_MAX))
    for k in range(_REST_BITS, 0, -1):
        whens = whens.when(F.col("rest") >= (1 << (k - 1)), F.lit(_RHO_MAX - k))
    return whens


def _hashed(df: DataFrame, key: str) -> DataFrame:
    """(… , bucket, rest): md5-derived 32-bit hash split into the HLL_P
    bucket index and the 24-bit rank field — map-side only."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return df.withColumn("_h", h).select(
        "*",
        F.shiftright("_h", _REST_BITS).alias("bucket"),
        F.col("_h").bitwiseAND(F.lit((1 << _REST_BITS) - 1)).alias("rest"),
    )


def _summary_cols():
    """Aggregates over a (…, m_j) register frame → the sketch summary."""
    used = F.count("*")
    w_sum = F.sum(F.expr(_W_SPARK))
    s_int = (w_sum + (F.lit(HLL_M) - used) * _W_FULL).cast("long")
    return [
        F.lit(HLL_M).cast("long").alias("m"),
        used.cast("long").alias("used_buckets"),
        (F.lit(HLL_M) - used).cast("long").alias("empty_buckets"),
        F.sum("m_j").cast("long").alias("reg_sum"),
        F.max("m_j").cast("long").alias("reg_max"),
        s_int.alias("s_int"),
        (F.expr(_EST_NUM) / s_int.cast("double")).alias("hll_estimate"),
    ]


def _summary_sql(group: str = "") -> str:
    """SELECT list mirroring :func:`_summary_cols` over a ``regs`` CTE."""
    s_int = f"(SUM({_W_SQL}) + ({HLL_M} - COUNT(*)) * {_W_FULL})"
    cols = f"""
           CAST({HLL_M} AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS used_buckets,
           CAST({HLL_M} - COUNT(*) AS BIGINT) AS empty_buckets,
           CAST(SUM(m_j) AS BIGINT) AS reg_sum,
           CAST(MAX(m_j) AS BIGINT) AS reg_max,
           CAST({s_int} AS BIGINT) AS s_int,
           {_EST_NUM} / CAST({s_int} AS DOUBLE) AS hll_estimate
    """
    return f"SELECT {group}{',' if group else ''} {cols}"


@register(
    "hll_distinct_sketch",
    oracle=f"""
        WITH md AS (
            SELECT md5(CAST(event_id AS VARCHAR)) AS m FROM events
        ),
        hs AS (SELECT CAST({_H32_SQL} AS BIGINT) AS h FROM md),
        rb AS (
            SELECT h >> {_REST_BITS} AS bucket,
                   h & {(1 << _REST_BITS) - 1} AS rest
            FROM hs
        ),
        regs AS (SELECT bucket, MAX({_RHO_SQL}) AS m_j FROM rb GROUP BY bucket),
        summary AS ({_summary_sql()} FROM regs)
        SELECT s.*, e.exact_distinct
        FROM summary s
        CROSS JOIN (
            SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct
            FROM events
        ) e
    """,
    survey_ref="LLM/analytics ops: mergeable distinct-count sketch — "
    "HyperLogLog built from scratch with engine-exact integer registers "
    "(the 100 TB replacement for exact COUNT(DISTINCT))",
    description=f"{HLL_M}-register HyperLogLog over events.event_id: one "
    "map-side pass computes (bucket, rank); ONE grouped max per bucket is "
    "the whole shuffle (register table ≪ key set).  The indicator sum is "
    "carried as an exact integer so the estimate is bit-identical across "
    "engines; exact distinct count reported alongside as the accuracy "
    "statement.  Raw estimator (no linear-counting correction — ln() is "
    "libm; empty_buckets is emitted so a consumer can apply it)",
    gated=False,
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    regs = (
        _hashed(ev.select("event_id"), "event_id")
        .select("bucket", _rho_col().alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    summary = regs.agg(*_summary_cols())
    exact = ev.agg(
        F.countDistinct("event_id").cast("long").alias("exact_distinct")
    )
    return summary.crossJoin(F.broadcast(exact))


@register(
    "hll_sketch_merge",
    oracle=f"""
        WITH md AS (
            SELECT event_type, md5(CAST(event_id AS VARCHAR)) AS m FROM events
        ),
        hs AS (
            SELECT event_type, CAST({_H32_SQL} AS BIGINT) AS h FROM md
        ),
        rb AS (
            SELECT event_type, h >> {_REST_BITS} AS bucket,
                   h & {(1 << _REST_BITS) - 1} AS rest
            FROM hs
        ),
        tregs AS (
            SELECT event_type, bucket, MAX({_RHO_SQL}) AS m_j
            FROM rb GROUP BY event_type, bucket
        ),
        regs AS (
            SELECT * FROM tregs
            UNION ALL
            SELECT 'ALL' AS event_type, bucket, MAX(m_j) AS m_j
            FROM tregs GROUP BY bucket
        ),
        summary AS ({_summary_sql("event_type")} FROM regs GROUP BY event_type),
        exact AS (
            SELECT event_type,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'ALL', CAST(count(DISTINCT event_id) AS BIGINT) FROM events
        )
        SELECT s.*, e.exact_distinct
        FROM summary s JOIN exact e USING (event_type)
        ORDER BY event_type
    """,
    survey_ref="LLM/analytics ops: sketch MERGE — per-shard HyperLogLog "
    "registers combined by register-wise max (the associative merge that "
    "makes sketches the partial-aggregation answer at 100 TB)",
    description="one sketch per event_type plus the 'ALL' row obtained by "
    "MERGING the per-type register tables (register-wise max) — never "
    "re-reading the events.  Merge input is |types|·m rows, so the merge "
    "costs nothing regardless of data size; merged == direct-global is "
    "test-pinned.  Same exact-integer register discipline as "
    "hll_distinct_sketch",
    gated=False,
)
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tregs = (
        _hashed(ev.select("event_type", "event_id"), "event_id")
        .select("event_type", "bucket", _rho_col().alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    merged = (
        tregs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit("ALL").alias("event_type"), "bucket", "m_j")
    )
    regs = tregs.unionByName(merged)
    summary = regs.groupBy("event_type").agg(*_summary_cols())
    exact_t = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").cast("long").alias("exact_distinct")
    )
    exact_all = ev.agg(
        F.countDistinct("event_id").cast("long").alias("exact_distinct")
    ).select(F.lit("ALL").alias("event_type"), "exact_distinct")
    exact = exact_t.unionByName(exact_all)
    return summary.join(F.broadcast(exact), "event_type").orderBy("event_type")
