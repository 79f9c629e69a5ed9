"""Analytics breadth, round-4 continuation (wave 2): deterministic
fixed-size sampling, exact-rank winsorization, term co-occurrence lift,
and SCD last-wins as-of state reconstruction.

- ``fixed_size_sample_per_source`` — the fixed-SIZE complement of the
  rate-based ``stratified_sample_by_lang``: exactly n docs per stratum,
  selected by hash rank, so the sample is reproducible, coordination-free
  and independent of row order (the property reservoir sampling gives up
  under distribution).
- ``events_value_winsorize`` — tail clamping at exact rank thresholds
  (the integer cross-multiplication discipline of hist_quantile_sketch:
  no division anywhere), the standard featurization step before training
  on heavy-tailed values.
- ``term_cooccurrence_lift`` — document-level co-occurrence counts with
  lift = N·c_ab/(c_a·c_b), the integer core of PMI (log is monotone, so
  lift ranks pairs identically to PMI without touching libm).
- ``customer_order_state_asof`` — the reference's SCD-lite upsert
  semantics (A8: last write wins, lineage columns) re-expressed as a
  query: reconstruct each customer's current-order state as of a cutoff
  date from the order history alone (writer.go:186-225's end state
  derived by query instead of maintained by MERGE).

All gated=False on registration: this round's 50 driver slots are
frozen on the third rotation wave; these are r5 rotation candidates,
value-checked by the local oracle sweep at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# fixed_size_sample_per_source
# ---------------------------------------------------------------------------

SAMPLE_N = 20


@register(
    "fixed_size_sample_per_source",
    oracle=f"""
        SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank
        FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= {SAMPLE_N}
        ORDER BY source, sample_rank
    """,
    survey_ref="LLM ops: deterministic fixed-size per-stratum sampling — "
    "the fixed-n complement of the rate-based stratified sample "
    "(stratified_sample_by_lang) and the hash-threshold temperature "
    "sample (temperature_sample_by_lang)",
    description=f"exactly {SAMPLE_N} documents per source, chosen by "
    "md5-hash rank over the doc id: reproducible on rerun, independent "
    "of scan order, and mergeable — per-partition top-n lists by hash "
    "combine by sort-and-truncate, so at 100 TB this is a TakeOrdered "
    "per stratum (no global shuffle of the corpus, only of n×strata "
    "candidate rows).  The standard way to cut eval slices and "
    "human-review batches from a training corpus",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def fixed_size_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= SAMPLE_N)
        .select("source", "doc_id", F.col("rn").cast("long").alias("sample_rank"))
        .orderBy("source", "sample_rank")
    )


# ---------------------------------------------------------------------------
# events_value_winsorize — exact-rank tail clamping, no division
# ---------------------------------------------------------------------------

WINS_LO = 5  # percent
WINS_HI = 95


@register(
    "events_value_winsorize",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        th AS (
            SELECT event_type,
                   MIN(CASE WHEN 100 * rn >= {WINS_LO} * n THEN value END)
                       AS p_lo,
                   MIN(CASE WHEN 100 * rn >= {WINS_HI} * n THEN value END)
                       AS p_hi
            FROM r GROUP BY event_type
        )
        SELECT r.event_type,
               CAST(MAX(r.n) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN r.value < th.p_lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clamped_low,
               CAST(SUM(CASE WHEN r.value > th.p_hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clamped_high,
               CAST(MAX(th.p_lo) AS DOUBLE) AS p_lo,
               CAST(MAX(th.p_hi) AS DOUBLE) AS p_hi,
               CAST(SUM(CAST(
                   CASE WHEN r.value < th.p_lo THEN th.p_lo
                        WHEN r.value > th.p_hi THEN th.p_hi
                        ELSE r.value END AS DECIMAL(28,10)))
                    AS DOUBLE) AS winsorized_sum
        FROM r JOIN th ON th.event_type = r.event_type
        GROUP BY r.event_type
        ORDER BY r.event_type
    """,
    survey_ref="LLM ops: winsorization — tail clamping at exact rank "
    "thresholds, the featurization step before training on heavy-tailed "
    "value columns",
    description=f"per event type, the p{WINS_LO:02d}/p{WINS_HI} values "
    "are found by EXACT rank (the smallest rank r with 100·r ≥ p·n — "
    "integer cross-multiplication, the hist_quantile_sketch discipline, "
    "so no IEEE division participates in the threshold choice), every "
    "value is clamped into [p_lo, p_hi], and the clamped column is "
    "DECIMAL-summed.  One sort per type partition + one broadcast-sized "
    "threshold join; at 100 TB the exact sort is replaced by the "
    "mergeable histogram sketch's quantiles with the identical output "
    "contract — which is why both operators share the rank arithmetic",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cw).alias("n"),
    )
    th = r.groupBy("event_type").agg(
        F.min(
            F.when(100 * F.col("rn") >= WINS_LO * F.col("n"), F.col("value"))
        ).alias("p_lo"),
        F.min(
            F.when(100 * F.col("rn") >= WINS_HI * F.col("n"), F.col("value"))
        ).alias("p_hi"),
    )
    clamped = r.join(F.broadcast(th), "event_type").select(
        "event_type",
        "n",
        "value",
        "p_lo",
        "p_hi",
        F.when(F.col("value") < F.col("p_lo"), F.col("p_lo"))
        .when(F.col("value") > F.col("p_hi"), F.col("p_hi"))
        .otherwise(F.col("value"))
        .cast("decimal(28,10)")
        .alias("wv"),
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(F.when(F.col("value") < F.col("p_lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("value") > F.col("p_hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
            F.max("p_lo").cast("double").alias("p_lo"),
            F.max("p_hi").cast("double").alias("p_hi"),
            F.sum("wv").cast("double").alias("winsorized_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# term_cooccurrence_lift — document co-occurrence, PMI's integer core
# ---------------------------------------------------------------------------

COOC_VOCAB = 50
COOC_TOP = 50


@register(
    "term_cooccurrence_lift",
    oracle=f"""
        WITH dt AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        dt2 AS (SELECT doc_id, term FROM dt WHERE term <> ''),
        vocab AS (
            SELECT term, COUNT(*) AS df
            FROM dt2 GROUP BY term
            ORDER BY df DESC, term
            LIMIT {COOC_VOCAB}
        ),
        dv AS (
            SELECT dt2.doc_id, dt2.term, vocab.df
            FROM dt2 JOIN vocab ON vocab.term = dt2.term
        ),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        pairs AS (
            SELECT a.term AS term_a, b.term AS term_b,
                   MAX(a.df) AS df_a, MAX(b.df) AS df_b,
                   COUNT(*) AS c_ab
            FROM dv a JOIN dv b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY a.term, b.term
        )
        SELECT term_a, term_b,
               CAST(c_ab AS BIGINT) AS c_ab,
               CAST(df_a AS BIGINT) AS df_a,
               CAST(df_b AS BIGINT) AS df_b,
               CAST(n.n_docs * c_ab AS DOUBLE) / (df_a * df_b) AS lift
        FROM pairs, n
        ORDER BY c_ab DESC, term_a, term_b
        LIMIT {COOC_TOP}
    """,
    survey_ref="LLM ops: term co-occurrence statistics — document-level "
    "pair counts + lift (the integer core of PMI; log is monotone so "
    "lift ranks pairs identically without libm)",
    description=f"distinct (doc, term) pairs restricted to the global "
    f"top-{COOC_VOCAB} vocabulary (broadcast — at 100 TB the vocab stage "
    "is what bounds the pair explosion to C(V,2) regardless of corpus "
    "size), self-joined per doc into unordered term pairs, counted, and "
    "scored with lift = N·c_ab/(df_a·df_b) as ONE IEEE division of "
    f"exact integers.  Top {COOC_TOP} pairs in the total order "
    "(c_ab desc, pair) — the collocation table a tokenizer/phrase-mining "
    "pass starts from",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def term_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    dt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    vocab = (
        dt.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(COOC_VOCAB)
    )
    dv = dt.join(F.broadcast(vocab), "term")
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    a = dv.alias("a")
    b = dv.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(
            F.max("a.df").alias("df_a"),
            F.max("b.df").alias("df_b"),
            F.count("*").alias("c_ab"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("df_a").cast("long").alias("df_a"),
            F.col("df_b").cast("long").alias("df_b"),
            (
                (F.col("n_docs") * F.col("c_ab")).cast("double")
                / (F.col("df_a") * F.col("df_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("c_ab").desc(), "term_a", "term_b")
        .limit(COOC_TOP)
    )


# ---------------------------------------------------------------------------
# customer_order_state_asof — SCD last-wins state reconstruction (A8 analog)
# ---------------------------------------------------------------------------

ASOF_CUTOFF = "1995-06-30"


@register(
    "customer_order_state_asof",
    oracle=f"""
        SELECT o_custkey AS custkey,
               o_orderkey AS last_orderkey,
               o_orderstatus AS last_status,
               CAST(o_totalprice AS DOUBLE) AS last_totalprice,
               CAST(n_before AS BIGINT) AS n_orders_before
        FROM (
            SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY o_custkey) AS n_before
            FROM orders
            WHERE o_orderdate <= TIMESTAMP '{ASOF_CUTOFF}'
        )
        WHERE rn = 1
        ORDER BY custkey
    """,
    survey_ref="§2A A8 analog (writer.go:186-225): SCD last-write-wins "
    "state reconstructed AS OF a cutoff by query, instead of maintained "
    "by MERGE — the time-travel read the reference's created_at/"
    "closed_at lineage columns exist to enable",
    description=f"each customer's order state as of {ASOF_CUTOFF}: the "
    "latest order at or before the cutoff wins (orderdate desc, "
    "orderkey desc tiebreak — the reference's same-round last-wins rule, "
    "writer_test.go:561-622 analog), plus how many orders preceded it.  "
    "One date-pruned scan (partition pruning does the cutoff at scale), "
    "one window per customer partition; the argmax and the count share "
    "the sort.  This is the query-side inverse of the MERGE the chain "
    "plane executes in ChainDB._merge_account",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def customer_order_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") <= F.lit(ASOF_CUTOFF).cast("timestamp")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    cw = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(cw).alias("n_before"),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderstatus").alias("last_status"),
            F.col("o_totalprice").cast("double").alias("last_totalprice"),
            F.col("n_before").cast("long").alias("n_orders_before"),
        )
        .orderBy("custkey")
    )
