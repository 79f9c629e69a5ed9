"""Pin the int8 prefilter in ``dedup_embedding_cosine`` as LOSSLESS.

The prefilter (llm_ops.py `_emb_int8_profile` / `_emb_int8_qdot`) may only
REJECT candidate pairs whose cosine provably cannot reach NEARDUP_TAU; the
surviving pairs are scored by the identical catalyst expression as before,
so the query's output must be bit-for-bit what the unfiltered scorer
produces.  Two pins:

1. end-to-end: prefiltered query output == unfiltered-scorer output at
   sf0.001 and sf0.01 (row-exact, including the rounded cosine values);
2. bound validity: for EVERY candidate pair, the float upper bound
   dominates the exact computed cosine (with the 1e-6 keep margin), i.e.
   no pair that the exact scorer would accept can ever be rejected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops import (
    N_EMB_BANDS,
    NEARDUP_TAU,
    _DOT,
    _NORM,
    _emb_band_bucket_col,
    _emb_int8_profile,
    _emb_int8_qdot,
    capped_band_pairs,
)
from sparkroach.tables import load

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _unfiltered_reference(spark, sf_dir):
    """The pre-r5 pipeline: exact cosine on every capped candidate."""
    e = load(spark, sf_dir, "embeddings")
    band_structs = [
        F.struct(
            F.lit(t).alias("band_idx"), _emb_band_bucket_col(t).alias("bucket")
        )
        for t in range(N_EMB_BANDS)
    ]
    bands = e.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("vec_id", "b.band_idx", "b.bucket")
    cand = capped_band_pairs(
        bands, "vec_id", key_cols=("band_idx", "bucket")
    ).select(F.col("doc_a").alias("a_id"), F.col("doc_b").alias("b_id"))
    en = e.select(
        "vec_id", "embedding", F.expr(_NORM.format(col="embedding")).alias("nrm")
    )
    ea = en.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("na"),
    )
    eb = en.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("nb"),
    )
    cosine = F.round(F.expr(_DOT) / (F.col("na") * F.col("nb")), 6)
    pairs = (
        cand.join(F.broadcast(ea), "a_id")
        .join(F.broadcast(eb), "b_id")
        .select("a_id", "b_id", cosine.alias("cosine"))
        .where(F.col("cosine") >= NEARDUP_TAU)
    )
    return (
        pairs.groupBy(F.col("b_id").alias("dup_id"))
        .agg(
            F.min("a_id").alias("keep_id"),
            F.count("*").alias("n_matches"),
            F.max("cosine").alias("max_cosine"),
        )
        .orderBy("dup_id")
    )


@pytest.mark.parametrize("sf_dir", SFS)
def test_prefiltered_equals_unfiltered(spark, sf_dir):
    got = QUERIES["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    want = _unfiltered_reference(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


@pytest.mark.parametrize("sf_dir", SFS)
def test_bound_dominates_exact_cosine_on_every_candidate(spark, sf_dir):
    """ub + margin >= exact rounded cosine for ALL candidate pairs.

    This is the property that makes the prefilter lossless: any pair the
    exact scorer accepts (ROUND(cos,6) >= tau) has ub >= tau - 1e-6 and so
    passes `keep`.  Checked directly on every capped candidate, not just
    accepted ones.
    """
    e = load(spark, sf_dir, "embeddings")
    band_structs = [
        F.struct(
            F.lit(t).alias("band_idx"), _emb_band_bucket_col(t).alias("bucket")
        )
        for t in range(N_EMB_BANDS)
    ]
    bands = e.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("vec_id", "b.band_idx", "b.bucket")
    cand = capped_band_pairs(
        bands, "vec_id", key_cols=("band_idx", "bucket")
    ).select(F.col("doc_a").alias("a_id"), F.col("doc_b").alias("b_id"))

    prof = _emb_int8_profile()
    en = e.select(
        "vec_id",
        "embedding",
        F.expr(_NORM.format(col="embedding")).alias("nrm"),
        prof(F.col("embedding")).alias("i8"),
    )
    ea = en.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("na"),
        F.col("i8.qb").alias("qa_b"),
        F.col("i8.l1").alias("l1a"),
        F.col("i8.s").alias("sa"),
    )
    eb = en.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("nb"),
        F.col("i8.qb").alias("qb_b"),
        F.col("i8.l1").alias("l1b"),
        F.col("i8.s").alias("sb"),
    )
    qdot = _emb_int8_qdot()
    d4 = F.octet_length("qa_b").cast("double") / F.lit(4.0)
    ub = (
        F.col("sa")
        * F.col("sb")
        * (
            F.col("iq").cast("double")
            + F.col("l1a") / F.lit(2.0)
            + F.col("l1b") / F.lit(2.0)
            + d4
        )
    ) / (F.col("na") * F.col("nb"))
    cosine = F.round(F.expr(_DOT) / (F.col("na") * F.col("nb")), 6)
    scored = (
        cand.join(F.broadcast(ea), "a_id")
        .join(F.broadcast(eb), "b_id")
        .withColumn("iq", qdot(F.col("qa_b"), F.col("qb_b")))
        .select(
            "a_id",
            "b_id",
            ub.alias("ub"),
            cosine.alias("cosine"),
            F.col("sa"),
            F.col("sb"),
        )
    )
    violations = scored.where(
        (F.col("sa") > 0.0)
        & (F.col("sb") > 0.0)
        & (F.col("ub") + F.lit(1e-6) < F.col("cosine"))
    )
    assert violations.count() == 0, violations.limit(5).collect()
    # sanity: the filter actually rejects something (it's a prefilter, not
    # a no-op) — at every SF the corpus has plenty of sub-tau candidates
    total = scored.count()
    kept = scored.where(
        F.col("ub") >= F.lit(NEARDUP_TAU - 1e-6)
    ).count()
    assert kept < total


def test_qdot_edge_cases(spark):
    """Zero vectors and empty batches don't crash the pair-side UDF."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [bytes([1, 255, 3]), b"\x00\x00\x00"],
                "b": [bytes([2, 2, 2]), b"\x00\x00\x00"],
            }
        )
    )
    qdot = _emb_int8_qdot()
    rows = df.select(qdot("a", "b").alias("iq")).collect()
    # int8: 255 -> -1, so 1*2 + (-1)*2 + 3*2 = 6
    assert [r.iq for r in rows] == [6, 0]


def test_qdot_ragged_batch(spark):
    """Mixed vector lengths in ONE Arrow batch (r5 ADVICE): the uniform
    reshape fast path must fall back per-pair instead of raising
    ValueError, and empty/None vectors score 0."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [bytes([1, 2]), b"", bytes([5, 5, 5]), None],
                "b": [bytes([3, 4]), bytes([9]), bytes([1, 1, 1]), bytes([7])],
            }
        )
    ).coalesce(1)  # force one Arrow batch so lengths genuinely mix
    qdot = _emb_int8_qdot()
    rows = df.select(qdot("a", "b").alias("iq")).collect()
    assert [r.iq for r in rows] == [11, 0, 15, 0]


def test_qdot_ragged_dimension_mismatch_raises(spark):
    """A cross-column dimension mismatch between two NON-EMPTY vectors
    must raise in the ragged fallback too (r6 ADVICE: it used to
    silently truncate to min(len) there, while the uniform fast path
    raised on the same bad input)."""
    import pandas as pd
    import pytest

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                # the empty-bytes row makes the batch ragged, routing the
                # mismatched pair through the per-pair fallback
                "a": [b"", bytes([1, 2, 3])],
                "b": [bytes([9]), bytes([4, 5])],
            }
        )
    ).coalesce(1)
    qdot = _emb_int8_qdot()
    with pytest.raises(Exception, match="dimension mismatch"):
        df.select(qdot("a", "b").alias("iq")).collect()


@pytest.mark.parametrize("sf_dir", SFS)
def test_band_buckets_udf_matches_hof_columns(spark, sf_dir):
    """The vectorized band-bucket UDF (r8: one Arrow batch pass computes
    all N_EMB_BANDS sign buckets) must be bit-identical to the per-band
    higher-order-function expressions it replaced — the cumsum trick
    reproduces the Catalyst aggregate()'s left-to-right float64 partial
    sums exactly, so every near-zero dot keeps its sign."""
    from sparkroach.queries.llm_ops import _emb_band_buckets_udf

    e = load(spark, sf_dir, "embeddings")
    old = (
        e.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("band_idx"),
                            _emb_band_bucket_col(t).alias("bucket"),
                        )
                        for t in range(N_EMB_BANDS)
                    ]
                )
            ).alias("b"),
        )
        .select("vec_id", "b.band_idx", "b.bucket")
        .orderBy("vec_id", "band_idx")
        .collect()
    )
    new = (
        e.select(
            "vec_id",
            F.posexplode(_emb_band_buckets_udf()(F.col("embedding"))).alias(
                "band_idx", "bucket"
            ),
        )
        .orderBy("vec_id", "band_idx")
        .collect()
    )
    assert old == new


@pytest.mark.soak
def test_band_buckets_udf_ragged_vectors(spark):
    """zip_with() zips to the longer length with nulls, so a vector whose
    length differs from the plane dimension gets a NULL dot in every
    plane -> bucket 0 in every band; the UDF's ragged fallback (and the
    mixed-batch routing into it) must reproduce that, not a partial dot."""
    from pyspark.sql import types as T

    from sparkroach.queries.llm_ops import _PLANES, _emb_band_buckets_udf

    dim = len(_PLANES[0])
    rows = [
        (1, [1.0] * dim),        # well-formed
        (2, [1.0] * (dim - 3)),  # short
        (3, []),                 # empty
        (4, None),               # null vector
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema).coalesce(1)
    old = (
        df.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("band_idx"),
                            _emb_band_bucket_col(t).alias("bucket"),
                        )
                        for t in range(N_EMB_BANDS)
                    ]
                )
            ).alias("b"),
        )
        .select("vec_id", "b.band_idx", "b.bucket")
        .orderBy("vec_id", "band_idx")
        .collect()
    )
    new = (
        df.select(
            "vec_id",
            F.posexplode(_emb_band_buckets_udf()(F.col("embedding"))).alias(
                "band_idx", "bucket"
            ),
        )
        .orderBy("vec_id", "band_idx")
        .collect()
    )
    assert old == new
