"""LLM-data-pipeline operators, set 2 (round 4).

Four operators a 100 TB training-data pipeline runs between raw corpus and
training mix, beyond the dedup/ANN family in llm_ops.py:

- ``vocab_term_stats``     — corpus vocabulary table (corpus frequency,
                             document frequency, rank): the first pass of
                             tokenizer training and corpus QA.
- ``source_term_salience`` — per-source distinctive terms by an exact
                             tf/df ratio (a tf-idf analog whose arithmetic
                             is bit-identical across engines — no log()).
- ``passage_dedup_exact``  — exact substring-level dedup at word-16-gram
                             granularity (Lee et al., "Deduplicating
                             Training Data Makes Language Models Better":
                             duplicated PASSAGES inside otherwise-unique
                             documents are what suffix-array dedup
                             removes; the sliding-window hash table is
                             its shuffle-friendly distributed analog).
- ``ann_int8_quantized``   — scalar-quantized (int8) cosine top-k: the
                             standard 4× memory compression for vector
                             search; quantized dot products are EXACT
                             integer math, so both engines agree
                             bit-for-bit before the one final division.

Exactness discipline (registry.py): every compared quantity is integer
math until at most one final double division/sqrt computed identically on
both engines; "random" quantities are md5-derived.

Reference parity note: the reference (algorand/conduit-cockroachdb) has no
LLM plane; this module is part of the beyond-reference surface the build
brief requires (training-data pipeline operators as first-class
components).

Registered gated=False — the driver's 50-entry window is full this round —
but every oracle runs in the local sweep (tests/test_oracle_gate.py,
`python -m sparkroach.oracle`); r5 rotation candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

PASSAGE_WORDS = 16  # word n-gram window for passage-level dedup


@register(
    "vocab_term_stats",
    gated=False,  # r5 rotation candidate (driver window full)
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        stats AS (
            SELECT term,
                   CAST(count(*) AS BIGINT) AS cf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM words GROUP BY term
        )
        SELECT term, cf, df,
               CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT)
                   AS rank
        FROM stats
        ORDER BY rank
    """,
    survey_ref="LLM data management: vocabulary statistics (corpus "
    "frequency + document frequency + rank) — the first pass of tokenizer "
    "training / corpus QA",
    description="explode → one grouped pass computing corpus frequency "
    "and document frequency together (count + approx-free exact distinct "
    "per term). The global rank window runs AFTER aggregation, over "
    "vocab-sized data (≤ a few million terms at any corpus size — "
    "Heaps' law), so the single-partition sort is over the small side, "
    "never the corpus",
)
def vocab_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    stats = words.groupBy("term").agg(
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("term"))
    return stats.select(
        "term", "cf", "df", F.row_number().over(w).cast("long").alias("rank")
    ).orderBy("rank")


@register(
    "source_term_salience",
    gated=False,  # r5 rotation candidate (driver window full)
    oracle="""
        WITH words AS (
            SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS tf
            FROM words GROUP BY source, term
        ),
        df AS (
            SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM words GROUP BY term
        ),
        scored AS (
            SELECT source, tf.term AS term, tf, df,
                   CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
            FROM tf JOIN df ON tf.term = df.term
        )
        SELECT source, term, tf, df, score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY score DESC, term
            ) AS rn
            FROM scored
        )
        WHERE rn <= 5
        ORDER BY source, score DESC, term
    """,
    survey_ref="LLM data management: per-source distinctive terms (exact "
    "tf/df salience — a tf-idf analog with engine-exact arithmetic)",
    description="per-(source, term) frequency joined against per-term "
    "document frequency; score = tf/df is one exact integer division "
    "(IEEE division of integers is correctly rounded, so both engines "
    "produce the identical double — no log() idf whose libm could "
    "diverge). df is vocab-sized and broadcasts; top-5 per source via "
    "partitioned window",
)
def source_term_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = words.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "source",
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df").cast("double")).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("source", F.desc("score"), "term")
    )


@register(
    "passage_dedup_exact",
    gated=False,  # r5 rotation candidate (driver window full)
    oracle=f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        p AS (
            SELECT doc_id,
                   unnest([md5(array_to_string(ws[i+1:i+{PASSAGE_WORDS}], ' '))
                           for i in range(0, greatest(len(ws) - {PASSAGE_WORDS - 1}, 0))])
                       AS ph
            FROM w
        ),
        hd AS (SELECT ph, count(DISTINCT doc_id) AS nd FROM p GROUP BY ph)
        SELECT p.doc_id,
               CAST(count(*) AS BIGINT) AS n_passages,
               CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_dup_passages,
               CAST(count(*) FILTER (WHERE nd > 1) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS dup_fraction
        FROM p JOIN hd ON p.ph = hd.ph
        GROUP BY p.doc_id
        ORDER BY p.doc_id
    """,
    survey_ref="LLM dedup: exact substring-level (passage) dedup — "
    "word-16-gram sliding-window hash (distributed analog of "
    "suffix-array substring dedup, Lee et al. 2022)",
    description="every word-16-gram of every doc hashes once (md5 — the "
    "passage space makes chance collisions impossible); a grouped pass "
    "counts distinct docs per hash; joining back marks which of a doc's "
    "passages also occur elsewhere. Shuffle cost is linear in corpus "
    "token count (stride-1 windows), the same asymptotics as the "
    "suffix-array build, but in two hash shuffles instead of a global "
    "sort — docs shorter than the window have no passages and are "
    "excluded (both engines)",
)
def passage_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    idx = F.when(
        F.size(ws) >= PASSAGE_WORDS,
        F.sequence(F.lit(0), F.size(ws) - PASSAGE_WORDS),
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    passages = F.transform(
        idx,
        lambda i: F.md5(
            F.array_join(F.slice(ws, i + 1, PASSAGE_WORDS), " ")
        ),
    )
    p = d.select("doc_id", F.explode(passages).alias("ph"))
    hd = p.groupBy("ph").agg(F.countDistinct("doc_id").alias("nd"))
    dup = F.when(F.col("nd") > 1, 1).otherwise(0)
    return (
        p.join(hd, "ph")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(dup).alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            (
                F.col("n_dup_passages").cast("double")
                / F.col("n_passages").cast("double")
            ).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# int8 scalar-quantized ANN

_N_SQ_QUERIES = 8
_SQ_TOP_K = 10

# per-vector symmetric int8 quantization, computed identically on both
# engines: amax = max |x| (double), q_i = floor(x/amax*127 + 0.5).
# floor(+0.5) instead of round() so both engines share one explicit,
# deterministic tie rule; every op (cast, /, *, +, floor) is a correctly-
# rounded IEEE double op, so the integer codes are bit-identical.
_AMAX = (
    "aggregate(transform({col}, x -> abs(CAST(x AS DOUBLE))), "
    "CAST(0.0 AS DOUBLE), (a, v) -> greatest(a, v))"
)
_QUANT = (
    "transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) / {amax} * 127.0 + 0.5) "
    "AS BIGINT))"
)
_IDOT = (
    "aggregate(zip_with(qq, cq, (x, y) -> x * y), CAST(0 AS BIGINT), "
    "(a, v) -> a + v)"
)
_INORM2 = (
    "aggregate(transform({col}, x -> x * x), CAST(0 AS BIGINT), (a, v) -> a + v)"
)

_AMAX_SQL = "list_max([abs(x::DOUBLE) for x in {col}])"
_QUANT_SQL = "[CAST(floor(x::DOUBLE / {amax} * 127.0 + 0.5) AS BIGINT) for x in {col}]"
_IDOT_SQL = "list_sum([qq[i+1] * cq[i+1] for i in range(0, len(qq))])"
_INORM2_SQL = "list_sum([x * x for x in {col}])"


@register(
    "ann_int8_quantized",
    gated=False,  # r5 rotation candidate (driver window full)
    oracle=f"""
        WITH quant AS (
            SELECT vec_id,
                   {_QUANT_SQL.format(col="embedding", amax=_AMAX_SQL.format(col="embedding"))}
                       AS qv
            FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, qv AS qq FROM quant
              WHERE vec_id < {_N_SQ_QUERIES}),
        c AS (SELECT vec_id AS c_id, qv AS cq FROM quant),
        scored AS (
            SELECT q_id, c_id,
                   ROUND(CAST({_IDOT_SQL} AS DOUBLE)
                         / (SQRT(CAST({_INORM2_SQL.format(col="qq")} AS DOUBLE))
                            * SQRT(CAST({_INORM2_SQL.format(col="cq")} AS DOUBLE))),
                         6) AS qcosine
            FROM q CROSS JOIN c
            WHERE q_id <> c_id
        ),
        ranked AS (
            SELECT q_id, c_id, qcosine,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY qcosine DESC, c_id
                   ) AS rank
            FROM scored
        )
        SELECT q_id, c_id, qcosine, rank FROM ranked
        WHERE rank <= {_SQ_TOP_K}
        ORDER BY q_id, rank
    """,
    survey_ref="LLM ops: ANN similarity search — int8 scalar-quantized "
    "cosine top-k (4× memory compression, integer dot products)",
    description="per-vector symmetric int8 quantization (amax-scaled, "
    "explicit floor(+0.5) tie rule so both engines emit identical codes); "
    "quantized dot products and squared norms are EXACT integer sums — "
    "at 100 TB the int8 corpus is 4× smaller in cache/scan and the "
    "scoring loop is integer SIMD; only the final cosine normalization "
    "touches floats. Same broadcast-queries × corpus scan shape as "
    "ann_cosine_topk so recall is directly comparable",
)
def ann_int8_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    amax = _AMAX.format(col="embedding")
    quant = e.select(
        "vec_id",
        F.expr(_QUANT.format(col="embedding", amax=amax)).alias("qv"),
    )
    q = quant.where(F.col("vec_id") < _N_SQ_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")
    )
    c = quant.select(F.col("vec_id").alias("c_id"), F.col("qv").alias("cq"))
    qcos = F.round(
        F.expr(_IDOT).cast("double")
        / (
            F.sqrt(F.expr(_INORM2.format(col="qq")).cast("double"))
            * F.sqrt(F.expr(_INORM2.format(col="cq")).cast("double"))
        ),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("qcosine").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", qcos.alias("qcosine"))
        .select("q_id", "c_id", "qcosine", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= _SQ_TOP_K)
        .orderBy("q_id", "rank")
    )
