"""Semantic properties of the round-4 continuation operators (llm_ops3).

The oracle sweep (test_oracle_gate) pins Spark == DuckDB; these tests pin
the SEMANTICS both engines agree on — banding recall, funnel monotonicity,
arithmetic invariants — so a future "optimization" that changes meaning on
both sides at once still fails loudly.
"""

from __future__ import annotations

import pytest

from sparkroach import oracle
from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops3 import (
    FUNNEL_MAX_TOKENS,
    FUNNEL_MIN_TOKENS,
    N_TOP_TRANSITIONS,
    SIMHAM_TAU,
    _simham_sims_cte,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def duck():
    return oracle._duck_connection(SF_SMALL)


def test_simham_banding_recall_is_exact_under_cap(spark, duck):
    """Pigeonhole: with 4 bands over 64 bits, any pair within Hamming
    distance 3 shares at least one identical 16-bit band — so as long as
    every band bucket is at or under LSH_BUCKET_CAP (true at sf0.001,
    max bucket = 4), the banded pair set must equal the BRUTE-FORCE
    all-pairs Hamming scan exactly.  This is the recall guarantee the
    operator's docstring claims, checked against an implementation that
    shares nothing with the band join."""
    brute = duck.execute(
        f"""
        WITH {_simham_sims_cte().strip()}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sim_hi, b.sim_hi))
               + bit_count(xor(a.sim_lo, b.sim_lo)) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim_hi, b.sim_hi))
              + bit_count(xor(a.sim_lo, b.sim_lo)) <= {SIMHAM_TAU}
        ORDER BY doc_a, doc_b
        """
    ).fetchall()
    banded = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["simhash_hamming_pairs"].fn(spark, SF_SMALL).collect()
    ]
    assert banded == [tuple(r) for r in brute]
    assert len(banded) > 0  # non-vacuous: the corpus has near-dups


def test_funnel_stages_are_monotone_and_non_vacuous(spark):
    rows = QUERIES["quality_filter_funnel"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 20  # one row per source
    for r in rows:
        assert r.n_docs >= r.n_lang >= r.n_quality >= r.n_final
        assert r.retention == r.n_final / r.n_docs
    # every stage removes SOMETHING at the corpus level (calibrated against
    # the sf0.001 data: 500 -> 193 -> 131 -> 125); a threshold drift that
    # makes a stage a global no-op fails here
    tot = [
        sum(r[c] for r in rows) for c in ("n_docs", "n_lang", "n_quality", "n_final")
    ]
    assert tot[0] > tot[1] > tot[2] > tot[3] > 0


def test_doc_rarity_invariants(spark):
    rows = QUERIES["doc_rarity_score"].fn(spark, SF_SMALL).collect()
    n_docs = len(rows)
    assert n_docs == 500
    for r in rows:
        # df of any token is within [1, n_docs]; the mean lies between the
        # doc's min and n_docs; df_sum/n_tokens is the exact mean
        assert 1 <= r.min_df <= n_docs
        assert r.min_df <= r.mean_df <= n_docs
        assert r.mean_df == r.df_sum / r.n_tokens


def test_bigram_transitions_are_probabilities(spark):
    rows = QUERIES["bigram_top_transitions"].fn(spark, SF_SMALL).collect()
    assert len(rows) == N_TOP_TRANSITIONS
    pair_cfs = [r.pair_cf for r in rows]
    assert pair_cfs == sorted(pair_cfs, reverse=True)
    for r in rows:
        assert 0 < r.pair_cf <= r.prev_cf
        assert r.cond_p == r.pair_cf / r.prev_cf


def test_funnel_thresholds_split_the_corpus():
    # the quality band must sit strictly inside the observed token-count
    # range (10..99 at every SF) for the gate to be non-trivial
    assert 10 < FUNNEL_MIN_TOKENS < FUNNEL_MAX_TOKENS < 99


def test_postings_heads_are_sorted_prefixes(spark):
    # postings_head is a space-joined STRING since r6 (the driver's pandas
    # canonicalization cannot sort list cells — the r5 red recording); the
    # numeric sort happens BEFORE stringification, so the parsed-back ids
    # must still be numerically ascending
    rows = QUERIES["inverted_index_postings"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        head = [int(x) for x in r.postings_head.split()]
        assert head == sorted(head)
        assert len(head) == min(r.df, 10)
        assert r.cf >= r.df  # every posting has >= 1 occurrence


def test_temperature_mix_boosts_small_sources(spark):
    rows = QUERIES["temperature_mix_weights"].fn(spark, SF_SMALL).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    # sqrt-temperature up-samples small sources, down-samples large ones
    assert smallest.boost > 1.0 > largest.boost


def test_pagerank_mass_is_conserved(spark):
    rows = QUERIES["pagerank_dup_graph"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    # symmetric graph has no dangling nodes, so total rank stays ~1
    # (up to the 1e-12 per-edge contribution rounding)
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.degree >= 1
        assert r.pagerank > 0
