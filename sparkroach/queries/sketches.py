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


# the global events.event_id sketch summary — shared verbatim by
# hll_distinct_sketch and the streaming merge gate (streaming/events.py),
# whose register-wise-max compaction must land on the identical sketch
HLL_GLOBAL_ORACLE = f"""
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
"""


@register(
    "hll_distinct_sketch",
    bench=True,  # late r4: sketch-family representative in the headline set
    oracle=HLL_GLOBAL_ORACLE,
    survey_ref="LLM/analytics ops: mergeable distinct-count sketch — "
    "HyperLogLog built from scratch with engine-exact integer registers "
    "(the 100 TB replacement for exact COUNT(DISTINCT))",
    description=f"{HLL_M}-register HyperLogLog over events.event_id: ONE "
    "pass computes (bucket, rank) map-side and a single grouped "
    "aggregation builds the registers AND the exact distinct count "
    "(per-bucket COUNT(DISTINCT) summed — each id lands in exactly one "
    "bucket, so no second scan of events).  The indicator sum is "
    "carried as an exact integer so the estimate is bit-identical across "
    "engines; exact distinct count reported alongside as the accuracy "
    "statement.  Raw estimator (no linear-counting correction — ln() is "
    "libm; empty_buckets is emitted so a consumer can apply it)",
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # One scan, not two: every distinct event_id lands in exactly one
    # bucket, so the exact global distinct count is the SUM of per-bucket
    # COUNT(DISTINCT) riding the same register aggregation — the second
    # full pass over events the old crossJoin(exact) variant paid is gone
    # (guide §1.1: one unavoidable pass).  The distinct-agg shuffle is the
    # same ~n_distinct rows the standalone countDistinct shuffled anyway.
    regs = (
        _hashed(ev.select("event_id"), "event_id")
        .select("bucket", _rho_col().alias("rho"), "event_id")
        .groupBy("bucket")
        .agg(
            F.max("rho").alias("m_j"),
            F.countDistinct("event_id").alias("nd"),
        )
    )
    return regs.agg(
        *_summary_cols(),
        F.coalesce(F.sum("nd"), F.lit(0)).cast("long").alias("exact_distinct"),
    )


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


# ---------------------------------------------------------------------------
# Count-Min sketch: heavy hitters with additive merge
# ---------------------------------------------------------------------------

CMS_W = 256  # counters per row
CMS_D = 3  # hash rows
CMS_TOP = 20

# md5("<row>|<key>") → 32-bit int → % W; the "<row>|" prefix makes the D
# hash rows pairwise independent from one md5 family
_CMS_H32 = " + ".join(
    f"(instr('{_HEX}', substring(md5(CAST(j AS VARCHAR) || '|' || b), {k + 1}, 1))"
    f" - 1) * {16 ** (7 - k)}"
    for k in range(8)
)


def _cms_bucket_col(j: int):
    """Spark Column: CMS bucket of column `b` under hash row j."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}|"), F.col("b"))), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(CMS_W))


@register(
    "cms_heavy_hitters",
    oracle=f"""
        WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        bg AS (
            SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
                AS b
            FROM w
        ),
        cf AS (SELECT b, CAST(count(*) AS BIGINT) AS exact_cf FROM bg GROUP BY b),
        hashed AS (
            SELECT b, exact_cf, j, CAST({_CMS_H32} AS BIGINT) % {CMS_W} AS bucket
            FROM cf CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) rows
        ),
        counters AS (
            SELECT j, bucket, CAST(SUM(exact_cf) AS BIGINT) AS c
            FROM hashed GROUP BY j, bucket
        ),
        est AS (
            SELECT h.b, h.exact_cf, MIN(c.c) AS cms_est
            FROM hashed h
            JOIN counters c ON c.j = h.j AND c.bucket = h.bucket
            GROUP BY h.b, h.exact_cf
        )
        SELECT b AS term, exact_cf, CAST(cms_est AS BIGINT) AS cms_est,
               CAST(cms_est - exact_cf AS BIGINT) AS overestimate
        FROM (
            SELECT *, row_number() OVER (ORDER BY exact_cf DESC, b) AS rn
            FROM est
        )
        WHERE rn <= {CMS_TOP}
        ORDER BY exact_cf DESC, term
    """,
    survey_ref="LLM/analytics ops: Count-Min sketch heavy hitters — "
    "fixed-size frequency sketch with ADDITIVE merge (Cormode & "
    "Muthukrishnan 2005), engine-exact integer counters",
    description=f"{CMS_D}×{CMS_W} Count-Min over corpus word bigrams: "
    "counters are plain integer SUMS, so partial sketches from any data "
    "split merge by addition (linearity — the partial-aggregation "
    "property, like HLL's register max).  est = min over rows of the "
    "term's counter; CMS guarantees est >= exact (no underestimates), "
    "test-pinned.  The counter table is D·W rows regardless of corpus "
    "size and broadcasts back for the estimate join; the exact counts "
    "computed alongside ARE the accuracy statement",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    idx = F.when(F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)).otherwise(
        F.expr("CAST(array() AS ARRAY<INT>)")
    )
    bigrams = F.transform(
        idx, lambda i: F.concat(F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1))
    )
    # cf (vocab-sized) feeds the D counter tables AND the estimate join;
    # materializing it stops each consumer re-running the corpus bigram
    # explode (D+1 scans otherwise)
    cf = (
        d.select(F.explode(bigrams).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("exact_cf"))
        .localCheckpoint(eager=True)
    )
    hashed = cf.select(
        "b",
        "exact_cf",
        *[_cms_bucket_col(j).alias(f"k{j}") for j in range(CMS_D)],
    )
    est = hashed
    for j in range(CMS_D):
        counters = (
            hashed.groupBy(f"k{j}")
            .agg(F.sum("exact_cf").alias(f"c{j}"))
        )
        est = est.join(F.broadcast(counters), f"k{j}")
    cms = F.least(*[F.col(f"c{j}") for j in range(CMS_D)]).cast("long")
    # Global top-N as orderBy().limit() (TakeOrderedAndProject), never a
    # row_number window — the estimated table is bigram-vocab-sized and
    # must not serialize through one WindowExec task at scale.
    return (
        est.select(
            F.col("b").alias("term"),
            "exact_cf",
            cms.alias("cms_est"),
            (cms - F.col("exact_cf")).cast("long").alias("overestimate"),
        )
        .orderBy(F.col("exact_cf").desc(), "term")
        .limit(CMS_TOP)
        .orderBy(F.col("exact_cf").desc(), "term")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (the runtime-filter construct)
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # bits
BLOOM_K = 3  # hashes per key
BLOOM_PRICE = 400000  # build-side predicate: "hot" orders

_BLOOM_H32 = " + ".join(
    f"(instr('{_HEX}', substring(md5(CAST(i AS VARCHAR) || '|' "
    f"|| CAST(key AS VARCHAR)), {k + 1}, 1)) - 1) * {16 ** (7 - k)}"
    for k in range(8)
)


def _bloom_pos_sql(src: str) -> str:
    """CTE fragment: (key, pos) — the BLOOM_K bit positions of each key
    in ``src`` (a CTE with a ``key`` column)."""
    return f"""
        SELECT key, CAST({_BLOOM_H32} AS BIGINT) % {BLOOM_M} AS pos
        FROM {src} CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) hh
    """


@register(
    "bloom_semijoin_prune",
    oracle=f"""
        WITH hot AS (
            SELECT o_orderkey AS key FROM orders
            WHERE o_totalprice > {BLOOM_PRICE}
        ),
        bits AS (SELECT DISTINCT pos FROM ({_bloom_pos_sql("hot")})),
        lk AS (
            SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_orderkey
        ),
        probe AS ({_bloom_pos_sql("lk")}),
        hits AS (
            SELECT p.key, count(*) AS n_hit
            FROM probe p JOIN bits ON bits.pos = p.pos
            GROUP BY p.key
        ),
        flags AS (
            SELECT lk.key, lk.n_rows,
                   (COALESCE(h.n_hit, 0) = {BLOOM_K}) AS pass_bloom,
                   (hot.key IS NOT NULL) AS is_true
            FROM lk
            LEFT JOIN hits h ON h.key = lk.key
            LEFT JOIN hot ON hot.key = lk.key
        )
        SELECT CAST(SUM(n_rows) AS BIGINT) AS n_lineitem,
               CAST(SUM(n_rows) FILTER (WHERE pass_bloom) AS BIGINT)
                   AS n_pass_bloom,
               CAST(SUM(n_rows) FILTER (WHERE is_true) AS BIGINT)
                   AS n_true_match,
               CAST(SUM(n_rows) FILTER (WHERE pass_bloom AND NOT is_true)
                    AS BIGINT) AS false_positives,
               CAST(SUM(n_rows) FILTER (WHERE pass_bloom AND NOT is_true)
                    AS DOUBLE)
                   / CAST(SUM(n_rows) FILTER (WHERE NOT is_true) AS DOUBLE)
                   AS fp_rate
        FROM flags
    """,
    survey_ref="LLM/analytics ops: Bloom-filter semi-join pruning — the "
    "runtime-filter construct (build a bit set from the dimension "
    "predicate, prune the fact scan map-side before the join shuffle)",
    description=f"{BLOOM_M}-bit / {BLOOM_K}-hash Bloom filter built from "
    f"orders with o_totalprice > {BLOOM_PRICE}, probed by every lineitem "
    "order key; reports rows passing the filter vs the true semi-join "
    "next to the false-positive count and rate — Bloom's no-false-"
    "negative guarantee (n_pass >= n_true, every true row passes) is "
    "test-pinned.  At 100 TB the bit set (KB-sized) broadcasts and the "
    "probe is a map-side predicate on the fact scan, eliminating the "
    "shuffle of never-matching rows; here it is expressed relationally "
    "(positions ⋈ bit set) so both engines compute the identical exact "
    "integers.  The fixed m demonstrates saturation honestly: at larger "
    "SF the fill fraction rises and fp_rate with it — sizing m to n is "
    "the documented deployment knob",
)
def bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    hot = o.where(F.col("o_totalprice") > BLOOM_PRICE).select(
        F.col("o_orderkey").alias("key")
    )

    def positions(df: DataFrame) -> DataFrame:
        pos_structs = [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}|"), F.col("key").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(BLOOM_M),
            ).alias(f"p{i}")
            for i in range(BLOOM_K)
        ]
        return df.select("key", *pos_structs)

    bits = (
        positions(hot)
        .select(F.explode(F.array(*[f"p{i}" for i in range(BLOOM_K)])).alias("pos"))
        .distinct()
    )
    lk = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    probe = positions(lk).select(
        "key", F.explode(F.array(*[f"p{i}" for i in range(BLOOM_K)])).alias("pos")
    )
    hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count("*").alias("n_hit"))
    )
    flags = (
        lk.join(hits, "key", "left")
        .join(hot.withColumn("_hot", F.lit(1)), "key", "left")
        .select(
            "n_rows",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == BLOOM_K).alias("pass_bloom"),
            F.col("_hot").isNotNull().alias("is_true"),
        )
    )
    csum = lambda c: F.sum(F.when(c, F.col("n_rows")).otherwise(0)).cast(  # noqa: E731
        "long"
    )
    fp = csum(F.col("pass_bloom") & ~F.col("is_true"))
    return flags.agg(
        F.sum("n_rows").cast("long").alias("n_lineitem"),
        csum(F.col("pass_bloom")).alias("n_pass_bloom"),
        csum(F.col("is_true")).alias("n_true_match"),
        fp.alias("false_positives"),
        (fp.cast("double") / csum(~F.col("is_true")).cast("double")).alias(
            "fp_rate"
        ),
    )


# ---------------------------------------------------------------------------
# mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

# Fixed equi-width histogram over per-document token counts: the simplest
# MERGEABLE quantile sketch (bin counts are integers, merge = addition —
# the same property that makes Count-Min mergeable).  Production engines
# use KLL/t-digest for unbounded domains; for a BOUNDED integer domain the
# fixed-bin histogram is exact-mergeable AND engine-exact, which is what a
# hash-compared oracle needs.  The quantile answer is the LOWER BOUND of
# the first bin whose cumulative count reaches the target rank — within
# HIST_BIN_W of the true quantile by construction (the error bound is
# structural, not probabilistic).

HIST_BIN_W = 4  # token-count units per bin
HIST_NBINS = 64  # domain cap: counts >= 252 clamp into the last bin

_TOK_SQL = "len(string_split(text, ' '))"
_HIST_BIN_SQL = f"LEAST({_TOK_SQL} // {HIST_BIN_W}, {HIST_NBINS - 1})"


def _hist_quantile_sql(src_expr: str, label: str) -> str:
    """One histogram chain: bin counts for grouping ``src_expr``, then
    rank-threshold quantile buckets.  ceil(q·n) in pure integers:
    ceil(a/b) = (a + b - 1) // b."""
    return f"""
        h_{label} AS (
            SELECT {src_expr} AS source, {_HIST_BIN_SQL} AS bin,
                   COUNT(*) AS c
            FROM documents GROUP BY 1, 2
        ),
        t_{label} AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_bins_used
            FROM h_{label} GROUP BY source
        ),
        cum_{label} AS (
            SELECT source, bin, c,
                   SUM(c) OVER (PARTITION BY source ORDER BY bin) AS cum
            FROM h_{label}
        ),
        q_{label} AS (
            SELECT c.source,
                   MIN(CASE WHEN c.cum >= (t.n_docs + 1) // 2
                            THEN c.bin END) * {HIST_BIN_W} AS p50_bucket_lo,
                   MIN(CASE WHEN c.cum >= (9 * t.n_docs + 9) // 10
                            THEN c.bin END) * {HIST_BIN_W} AS p90_bucket_lo
            FROM cum_{label} c JOIN t_{label} t USING (source)
            GROUP BY c.source
        ),
        r_{label} AS (
            SELECT t.source, t.n_docs, t.n_bins_used,
                   q.p50_bucket_lo, q.p90_bucket_lo
            FROM t_{label} t JOIN q_{label} q USING (source)
        )
    """


@register(
    "hist_quantile_sketch",
    oracle=f"""
        WITH {_hist_quantile_sql("source", "s")},
        {_hist_quantile_sql("'ALL'", "g").strip()}
        SELECT source, n_docs, n_bins_used, p50_bucket_lo, p90_bucket_lo
        FROM (SELECT * FROM r_s UNION ALL SELECT * FROM r_g)
        ORDER BY source
    """,
    survey_ref="LLM ops: mergeable quantile sketch — fixed-bin histogram "
    "over per-doc token counts, per-source sketches plus the merged "
    "global row (completes the mergeable-sketch family: HLL for distinct, "
    "CMS for frequency, histogram for quantiles)",
    description=f"equi-width histogram sketch ({HIST_NBINS} bins × "
    f"{HIST_BIN_W} tokens): one grouped agg builds every per-source "
    "sketch map-side; quantiles are rank thresholds over the cumulative "
    "bin counts (pure integer arithmetic — ceil via (a+b-1)//b — so both "
    "engines agree exactly).  The 'ALL' row is the per-source sketches "
    "MERGED BY ADDITION, the property that lets 100 TB quantiles be "
    "computed per-partition and combined without re-touching data; a "
    "test pins merged == direct.  Answer error is bounded by the bin "
    "width by construction",
)
def hist_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = F.size(F.split("text", " "))
    bin_col = F.least(
        (tok / HIST_BIN_W).cast("long"), F.lit(HIST_NBINS - 1)
    )

    def chain(src_col) -> DataFrame:
        h = (
            d.select(src_col.alias("source"), bin_col.alias("bin"))
            .groupBy("source", "bin")
            .agg(F.count("*").alias("c"))
        )
        t = h.groupBy("source").agg(
            F.sum("c").alias("n_docs"), F.count("*").alias("n_bins_used")
        )
        wc = (
            Window.partitionBy("source")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = h.withColumn("cum", F.sum("c").over(wc)).join(t, "source")
        # integer rank thresholds, cross-multiplied so no division happens
        # at all: cum >= ceil(q·n) ⇔ cum/q >= n ⇔ cum·(1/q) >= n over
        # integers (cum >= (n+1)//2 ⇔ 2·cum >= n; cum >= (9n+9)//10 ⇔
        # 10·cum >= 9n) — the oracle states the //-form, this states the
        # multiplied form; equal on every integer input
        q = cum.groupBy("source").agg(
            (
                F.min(
                    F.when(F.col("cum") * 2 >= F.col("n_docs"), F.col("bin"))
                )
                * HIST_BIN_W
            ).alias("p50_bucket_lo"),
            (
                F.min(
                    F.when(
                        F.col("cum") * 10 >= 9 * F.col("n_docs"), F.col("bin")
                    )
                )
                * HIST_BIN_W
            ).alias("p90_bucket_lo"),
        )
        return t.join(q, "source").select(
            "source", "n_docs", "n_bins_used", "p50_bucket_lo", "p90_bucket_lo"
        )

    per_source = chain(F.col("source"))
    merged = chain(F.lit("ALL"))
    return per_source.unionByName(merged).orderBy("source")
