"""Round-8 wave unit pins: PNG decode lane, RRF fusion arithmetic,
margin-mining invariants."""

from __future__ import annotations

import pytest

from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops18 import MARGIN_TOP, RRF_DEPTH, RRF_K, RRF_TOP
from tests.conftest import SF_SMALL


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_rrf_fusion_arithmetic_on_controlled_corpus(spark, tmp_path):
    """doc 0 tops the tf ranking (4 hits, 1 distinct term); doc 1 tops the
    coverage ranking (3 distinct terms); RRF must fuse to the documented
    1/(k+r) sums with absent ranks contributing zero."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            "scan scan scan scan x",        # tf=4, cov=1
            "scan window merge x y z",      # tf=3, cov=3
            "window window x",              # tf=2, cov=1
            "no hits here",                 # out of both rankings
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in QUERIES["hybrid_rrf_fusion"].fn(spark, sf).collect()
    }
    assert 3 not in rows
    # tf ranking: doc0(4) doc1(3) doc2(2); coverage: doc1(3) then tie
    # cov=1 broken by n_chars asc: doc2(len 15) before doc0(len 21)
    assert rows[0]["rank_a"] == 1 and rows[1]["rank_a"] == 2
    assert rows[1]["rank_b"] == 1 and rows[2]["rank_b"] == 2
    assert rows[0]["rank_b"] == 3
    assert rows[0]["rrf_score"] == 1.0 / (RRF_K + 1) + 1.0 / (RRF_K + 3)
    assert rows[1]["rrf_score"] == 1.0 / (RRF_K + 2) + 1.0 / (RRF_K + 1)
    # doc1 wins the fusion despite topping neither... actually it tops B;
    # the pinned point is the ORDER: doc1 > doc0 > doc2
    ordered = sorted(rows.values(), key=lambda r: -r["rrf_score"])
    assert [r["doc_id"] for r in ordered] == [1, 0, 2]


def test_rrf_respects_depth_and_top_limits(spark):
    out = QUERIES["hybrid_rrf_fusion"].fn(spark, SF_SMALL).collect()
    assert 0 < len(out) <= RRF_TOP
    for r in out:
        for k in ("rank_a", "rank_b"):
            assert r[k] is None or 1 <= r[k] <= RRF_DEPTH


def test_margin_pairs_invariants(spark):
    out = QUERIES["bitext_margin_pairs"].fn(spark, SF_SMALL).collect()
    assert 0 < len(out) <= MARGIN_TOP
    for r in out:
        assert r["a_id"] < r["b_id"]
        assert r["margin"] > 0
        # a pair at the TOP of the margin ranking must beat its
        # neighborhoods: margin > 1 means cos exceeds the blended average
    assert out[0]["margin"] >= 1.0
    # descending, deterministic tiebreak
    keys = [(-r["margin"], r["a_id"], r["b_id"]) for r in out]
    assert keys == sorted(keys)


def test_ndcg_bounds_and_ideal_is_upper(spark):
    r = QUERIES["search_ndcg_report"].fn(spark, SF_SMALL).collect()[0]
    assert 0.0 < r["ndcg"] <= 1.0
    assert r["dcg_q"] <= r["idcg_q"]


def test_png_gate_runs_all_filters_everywhere(spark):
    out = QUERIES["multimodal_png_decode"].fn(spark, SF_SMALL).collect()
    assert len(out) > 0
    assert all(r["n_filters"] == 5 for r in out)
    assert {r["n_components"] for r in out} == {1, 3}
