"""HTML extraction + linear quality classifier (queries/llm_ops9.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL


def test_html_extraction_is_actually_lossless(spark):
    """The gate would stay green if both engines made the SAME regex
    mistake — pin the semantic claim itself: every document's extracted
    text hashes equal to the original."""
    df = QUERIES["html_text_extraction"].fn(spark, SF_SMALL)
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("lossless").cast("long")).alias("ok"),
    ).collect()[0]
    assert r.n > 0 and r.ok == r.n


def test_html_extraction_discards_boilerplate(spark):
    df = QUERIES["html_text_extraction"].fn(spark, SF_SMALL)
    r = df.agg(F.min("boilerplate_chars").alias("mn")).collect()[0]
    # the synthetic wrapper adds a fixed-plus-doc_id-width overhead;
    # every page must have discarded a substantial boilerplate mass
    assert r.mn > 200


def test_classifier_decision_is_integer_consistent(spark):
    from sparkroach.queries.llm_ops9 import _THRESH_DEN, _THRESH_NUM

    rows = QUERIES["quality_linear_classifier"].fn(spark, SF_SMALL).collect()
    assert rows
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # both classes realized on this corpus
    for r in rows[:200]:
        assert r.keep == (
            r.weight_sum * _THRESH_DEN >= _THRESH_NUM * r.n_tokens
        )
        assert abs(r.score) <= 1.0
        assert r.score == r.weight_sum / (1000.0 * r.n_tokens)
