"""Property pins for the llm_ops5 wave (value correctness is covered by
test_oracle_gate.py's registry sweep)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from sparkroach.queries.llm_ops import _JACCARD_TAU, _verified_pairs, lsh_bands, _with_shingles
from sparkroach.queries.llm_ops5 import (
    TOP_DRIFT_DIMS,
    cross_source_dup_matrix,
    dataset_card_stats,
    dup_span_coverage,
    label_centroid_drift,
    lsh_band_selectivity,
)
from sparkroach.tables import load
from tests.conftest import SF_SMALL


def _verified(spark):
    d = load(spark, SF_SMALL, "documents")
    return (
        _verified_pairs(d)
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b")
        .collect()
    )


def test_dup_matrix_counts_every_verified_pair_once(spark):
    pairs = _verified(spark)
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "source")
        .collect()
    }
    expect = Counter()
    within = Counter()
    for p in pairs:
        a, b = sorted((src[p["doc_a"]], src[p["doc_b"]]))
        expect[(a, b)] += 1
        if a == b:
            within[(a, b)] += 1
    got = cross_source_dup_matrix(spark, SF_SMALL).collect()
    assert {(r["source_a"], r["source_b"]): r["n_pairs"] for r in got} == dict(expect)
    for r in got:
        assert r["source_a"] <= r["source_b"]
        assert r["n_within"] == within.get((r["source_a"], r["source_b"]), 0)
    assert sum(r["n_pairs"] for r in got) == len(pairs)


def test_centroid_drift_matches_bruteforce(spark):
    rows = label_centroid_drift(spark, SF_SMALL).collect()
    per_label = defaultdict(list)
    for r in rows:
        per_label[r["label"]].append(r)
    embs = load(spark, SF_SMALL, "embeddings").collect()
    sums = defaultdict(lambda: [0] * 64)
    counts = Counter()
    for e in embs:
        half = e["vec_id"] % 2
        counts[(e["label"], half)] += 1
        for i, x in enumerate(e["embedding"]):
            sums[(e["label"], half)][i] += math.floor(float(x) * 1000000.0)
    for label, rs in per_label.items():
        assert len(rs) == TOP_DRIFT_DIMS
        # ranks ordered by squared drift, descending
        sq = [r["drift_sq"] for r in sorted(rs, key=lambda r: r["drift_rank"])]
        assert sq == sorted(sq, reverse=True)
        na, nb = counts[(label, 0)], counts[(label, 1)]
        for r in rs:
            i = r["dim"] - 1
            d = sums[(label, 0)][i] / na - sums[(label, 1)][i] / nb
            assert r["drift"] == d
            assert r["n_even"] == na and r["n_odd"] == nb


def test_dataset_card_dup_counts(spark):
    pairs = _verified(spark)
    dup_docs = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "source")
        .collect()
    }
    per_src_dups = Counter(src[d] for d in dup_docs)
    per_src_docs = Counter(src.values())
    got = {r["source"]: r for r in dataset_card_stats(spark, SF_SMALL).collect()}
    assert set(got) == set(per_src_docs)
    for s, r in got.items():
        assert r["n_docs"] == per_src_docs[s]
        assert r["n_dup_docs"] == per_src_dups.get(s, 0)
        assert 0 <= r["n_dup_docs"] <= r["n_docs"]
    assert sum(r["n_docs"] for r in got.values()) == len(src)


def test_band_selectivity_matches_bucket_census(spark):
    d = load(spark, SF_SMALL, "documents")
    bands = lsh_bands(_with_shingles(d)).collect()
    census = defaultdict(Counter)
    for b in bands:
        census[b["band_idx"]][b["band_val"]] += 1
    got = {r["band_idx"]: r for r in lsh_band_selectivity(spark, SF_SMALL).collect()}
    assert set(got) == set(census)
    for idx, buckets in census.items():
        r = got[idx]
        assert r["n_buckets"] == len(buckets)
        assert r["max_bucket"] == max(buckets.values())
        assert r["n_singletons"] == sum(1 for n in buckets.values() if n == 1)
        assert r["pair_contribution"] == sum(
            n * (n - 1) // 2 for n in buckets.values()
        )


def test_span_coverage_bounds_and_nonvacuity(spark):
    rows = dup_span_coverage(spark, SF_SMALL).collect()
    assert len(rows) == 500
    covered = [r for r in rows if r["n_covered_words"] > 0]
    uncovered = [r for r in rows if r["n_covered_words"] == 0]
    assert covered, "no doc has any duplicated span — metric vacuous"
    assert uncovered, "every doc fully covered — fixture degenerate"
    for r in rows:
        assert 0 <= r["n_covered_words"] <= r["n_words"]
        assert r["covered_fraction"] == r["n_covered_words"] / r["n_words"]


def test_clean_corpus_drops_are_consistent(spark):
    from pyspark.sql import functions as F

    from sparkroach.queries.llm_ops5 import clean_corpus_report

    rows = clean_corpus_report(spark, SF_SMALL).collect()
    d = load(spark, SF_SMALL, "documents")
    assert sum(r["docs_before"] for r in rows) == d.count()
    dropped = sum(r["docs_before"] - r["docs_after"] for r in rows)
    assert dropped > 0, "no doc dropped — dedup vacuous on fixture"
    for r in rows:
        assert 0 <= r["docs_after"] <= r["docs_before"]
        assert 0 <= r["tokens_after"] <= r["tokens_before"]
    # near-dup drops: every cluster loses exactly size-1 members to
    # keep-best, plus exact dups; cross-check the total against the
    # independent pipelines
    from sparkroach.queries.llm_ops import dedup_cc_clusters

    cc = dedup_cc_clusters(spark, SF_SMALL).collect()
    near = sum(1 for r in cc if not r["is_canonical"])
    exact = (
        d.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .agg(F.sum(F.col("n") - 1))
        .collect()[0][0]
        or 0
    )
    # the union can overlap (a doc can be both an exact dup and a
    # near-dup loser) and keep-best may drop the min-id canonical, so
    # only bounds are exact: at least max(parts), at most the sum
    assert max(near, exact) <= dropped <= near + exact


def test_leakage_safe_split_never_splits_a_dup_pair(spark):
    """The guarantee the doc-level split cannot give: every verified
    near-dup pair lands on the same side of the boundary."""
    import hashlib

    from sparkroach.queries.llm_ops import connected_components
    from sparkroach.queries.llm_ops5 import leakage_safe_split

    pairs = _verified(spark)
    comp = {
        r["node"]: r["label"]
        for r in connected_components(
            load(spark, SF_SMALL, "documents")
            .sparkSession.createDataFrame(
                [(p["doc_a"], p["doc_b"]) for p in pairs], "doc_a long, doc_b long"
            )
        ).collect()
    }

    def side(doc):
        unit = comp.get(doc, doc)
        h = int(hashlib.md5(str(unit).encode()).hexdigest()[:8], 16)
        return "train" if h % 100 < 80 else "eval"

    assert pairs
    for p in pairs:
        assert side(p["doc_a"]) == side(p["doc_b"])
    # and both splits are populated (the report is non-vacuous)
    rows = {r["split"]: r for r in leakage_safe_split(spark, SF_SMALL).collect()}
    assert set(rows) == {"train", "eval"}
    assert rows["train"]["n_docs"] > rows["eval"]["n_docs"] > 0
