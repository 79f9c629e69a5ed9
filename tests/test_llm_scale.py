"""Scale-path guarantees for the dedup family (round-2 verdict items 3/4).

Two properties are pinned:
1. plan shape — the embedding dedup and the candidate-verified Jaccard must
   pair rows via equi-joins on LSH band keys, never a cartesian/nested-loop
   or a label-wide block (the round-1 scale-killers);
2. semantics — exact Jaccard computed on LSH candidates agrees value-for-
   value with the quadratic oracle baseline (word_jaccard_pairs) on every
   pair LSH recalls, and every emitted pair really is a candidate.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops import (
    _JACCARD_TAU,
    _lsh_candidate_pairs,
    word_jaccard_pairs,
)
from sparkroach.tables import load
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_embedding_dedup_blocks_on_lsh_not_label(spark):
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair join must key on the band bucket, not the 5-value label
    assert "bucket" in plan
    assert "label" not in plan  # label plays no role anymore


def test_jaccard_verified_has_no_quadratic_join(spark):
    plan = _plan(spark, "minhash_jaccard_verified")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_verified_agrees_with_exact_baseline(spark):
    d = load(spark, SF_SMALL, "documents")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _lsh_candidate_pairs(d).collect()
    }
    baseline = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in word_jaccard_pairs(spark, SF_SMALL).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["minhash_jaccard_verified"].fn(spark, SF_SMALL).collect()
    }
    # every verified pair is an LSH candidate above the threshold
    for pair, jac in verified.items():
        assert pair in cand
        assert jac >= _JACCARD_TAU
    # every baseline pair that LSH recalled is present with the same value
    # (baseline blocks within lang, so restrict to its own universe)
    for pair, jac in baseline.items():
        if pair in cand:
            assert pair in verified
            assert abs(verified[pair] - jac) < 1e-12


def test_verified_is_nonempty_at_test_sf(spark):
    # guard against a silently-empty gate (bands too selective)
    n = QUERIES["minhash_jaccard_verified"].fn(spark, SF_SMALL).count()
    assert n > 0
    m = QUERIES["dedup_embedding_cosine"].fn(spark, SF_SMALL).count()
    assert m > 0


def test_ivf_kmeans_broadcasts_centroids_not_corpus(spark):
    """Lloyd assignment must broadcast the K centroids against an
    unshuffled corpus scan — no sort-merge join anywhere in the plan."""
    plan = _plan(spark, "ann_ivf_kmeans")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_cc_clusters_semantics(spark):
    """Round-3: connected components over verified pairs must be exactly
    the transitive closure — same partition a union-find over the edge
    list produces — with min-id canonical survivors and correct sizes."""
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_jaccard_verified"].fn(spark, SF_SMALL).collect()
    ]
    assert edges  # non-trivial input
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    # path-compress fully: find() after all unions gives the root, and the
    # union rule (larger root points at smaller) makes the root the min id
    got = QUERIES["dedup_cc_clusters"].fn(spark, SF_SMALL).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in got} == expect
    from collections import Counter

    sizes = Counter(expect.values())
    for r in got:
        assert r["cluster_size"] == sizes[r["cluster_id"]]
        assert r["is_canonical"] == (r["doc_id"] == r["cluster_id"])
    # at least one cluster must be a genuine multi-edge merge for the test
    # to exercise transitivity
    assert max(sizes.values()) >= 3


def test_cc_clusters_plan_is_bucketed(spark):
    plan = _plan(spark, "dedup_cc_clusters")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_char_jaccard_only_scores_candidates(spark):
    d = load(spark, SF_SMALL, "documents")
    cand = {
        (r["doc_a"], r["doc_b"]) for r in _lsh_candidate_pairs(d).collect()
    }
    rows = QUERIES["ngram_char_jaccard"].fn(spark, SF_SMALL).collect()
    assert len(rows) == len(cand)
    for r in rows:
        assert (r["doc_a"], r["doc_b"]) in cand
        assert 0.0 <= r["char_jaccard"] <= 1.0


# ---------------------------------------------------------------------------
# round-3: LSH bucket-cardinality guard (verdict "What's wrong #2")
# ---------------------------------------------------------------------------


def _degenerate_docs(spark, n_dup: int, n_distinct: int = 5):
    """n_dup identical docs (one degenerate LSH bucket per band) plus a few
    genuinely distinct docs."""
    dup_text = "the same boilerplate footer text repeated on every page of the site"
    rows = [(i, dup_text) for i in range(n_dup)]
    rows += [
        (n_dup + j, f"unique document number {j} with its own words {j * 17} {j * 31}")
        for j in range(n_distinct)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_band_pairs_bounds_degenerate_bucket(spark):
    """N identical docs put all N in one bucket per band: uncapped that is
    C(N,2) pairs; the guard must emit O(K·N) star+chain pairs that still
    connect the whole cluster."""
    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP, N_BANDS

    n = 2 * LSH_BUCKET_CAP  # 512 — far over the cap
    d = _degenerate_docs(spark, n)
    pairs = _lsh_candidate_pairs(d).collect()
    dup_pairs = [(r["doc_a"], r["doc_b"]) for r in pairs if r["doc_a"] < n and r["doc_b"] < n]
    # bounded: K-star + chain pairs, NOT C(n,2)=130816 (identical docs share
    # every band, so each band emits the same id-ordered pair set and
    # distinct folds them into one)
    assert len(dup_pairs) == _capped_pair_count(n)
    # connectivity: the chain must span all n duplicates in one component
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in dup_pairs:
        parent[find(max(a, b))] = find(min(a, b))
    # ONE component (the union-find root is an arbitrary member, not
    # necessarily 0 — r4 star pairs arrive in arbitrary collect order)
    assert len({find(i) for i in range(n)}) == 1
    assert N_BANDS > 1  # sanity: multiple bands really did collapse


def test_capped_band_pairs_exact_below_cap(spark):
    """Buckets at or under the cap keep the exact all-pairs join: a small
    group of identical docs yields every C(n,2) pair."""
    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP

    n = 6
    assert n <= LSH_BUCKET_CAP
    d = _degenerate_docs(spark, n)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _lsh_candidate_pairs(d).collect()
        if r["doc_a"] < n and r["doc_b"] < n
    }
    assert pairs == {(a, b) for a in range(n) for b in range(a + 1, n)}


def test_capped_band_pairs_join_routed_past_collect_threshold(
    spark, monkeypatch
):
    """r9 guard (r8 verdict What's-wrong #3): when the flooded-bucket key
    list exceeds _OVER_COLLECT_MAX the over-cap routing must switch from
    the collect+broadcast path to distributed anti/semi joins — and emit
    the IDENTICAL pair set.  Forces the threshold to 1 so a 2-flood-bucket
    input exercises the join-routed branch, and compares against the
    broadcast branch on the same input."""
    from sparkroach.queries import llm_ops
    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP, capped_band_pairs

    n = LSH_BUCKET_CAP + 10
    rows = [(i, 0, "floodA") for i in range(n)]
    rows += [(1000 + i, 0, "floodB") for i in range(n)]
    rows += [(5000 + j, 0, f"b{j}") for j in range(5)]  # under-cap
    rows += [(6000, 0, "pairX"), (6001, 0, "pairX")]
    bands = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_val string"
    )

    broadcast_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in capped_band_pairs(bands, "doc_id").collect()
    }
    monkeypatch.setattr(llm_ops, "_OVER_COLLECT_MAX", 1)
    joined_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in capped_band_pairs(bands, "doc_id").collect()
    }
    assert joined_pairs == broadcast_pairs
    assert (6000, 6001) in joined_pairs  # under-cap exact pairs survive
    # both flood buckets stayed linear (K-star + chain), not C(n,2)
    assert len(joined_pairs) == 2 * _capped_pair_count(n) + 1


def test_embedding_dedup_capped_band_pairs(spark):
    """The embedding-band variant of the guard: one degenerate bucket of
    identical vectors stays linear in pairs."""
    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP, capped_band_pairs

    n = 3 * LSH_BUCKET_CAP
    rows = [(i, 0, "deadbeef") for i in range(n)]  # one bucket, one band
    rows += [(n + j, 0, f"bucket{j}") for j in range(4)]  # singletons
    bands = spark.createDataFrame(rows, "vec_id long, band_idx int, bucket string")
    pairs = capped_band_pairs(bands, "vec_id", key_cols=("band_idx", "bucket")).collect()
    assert len(pairs) == _capped_pair_count(n)
    assert all(r["doc_a"] < r["doc_b"] for r in pairs)


# ---------------------------------------------------------------------------
# round-3: skew-robust CC — large-star/small-star (verdict stretch #9)
# ---------------------------------------------------------------------------


def _cc_py(edges):
    """Union-find ground truth: node -> component min."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _star_labels(spark, edges):
    from sparkroach.queries.llm_ops import connected_components

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["label"]
        for r in connected_components(df, algorithm="star").collect()
    }


def test_star_cc_long_chain_within_sweep_budget(spark):
    """A 120-node path graph has diameter >> N_CC_MAX_SWEEPS (15): min-label
    propagation cannot finish, but the star alternation contracts chains
    exponentially and must label the whole path with node 0."""
    from sparkroach.queries.llm_ops import N_CC_MAX_SWEEPS

    n = 120
    assert n > N_CC_MAX_SWEEPS * 2
    edges = [(i, i + 1) for i in range(n - 1)]
    labels = _star_labels(spark, edges)
    assert labels == {i: 0 for i in range(n)}


def test_star_cc_equivalence_mixed_graph(spark):
    """Star CC must agree with union-find (and the default label
    propagation where its sweep budget suffices) on a graph mixing
    cliques, a chain, reversed/duplicate edges, and singleton pairs."""
    from sparkroach.queries.llm_ops import connected_components

    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]      # clique 0-4
        + [(10 + i, 11 + i) for i in range(8)]                   # chain 10-18
        + [(30, 31), (31, 30), (31, 32), (40, 41)]               # dups/reversed
        + [(50, 50)]                                             # self loop
    )
    want = _cc_py([(a, b) for a, b in edges if a != b])
    got = _star_labels(spark, edges)
    # self-loop-only node keeps itself as label
    assert got.pop(50) == 50
    assert got == want
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    label_path = {
        r["node"]: r["label"] for r in connected_components(df).collect()
    }
    assert label_path == got | {50: 50}


def test_star_cc_on_real_verified_pairs(spark):
    """On the LSH-verified near-dup graph (the production input) the two
    algorithms must be interchangeable."""
    from sparkroach.queries.llm_ops import _verified_pairs, connected_components

    d = load(spark, SF_SMALL, "documents")
    edges = (
        _verified_pairs(d)
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b")
    )
    a = {
        (r["node"], r["label"])
        for r in connected_components(edges, algorithm="star").collect()
    }
    b = {
        (r["node"], r["label"])
        for r in connected_components(edges).collect()
    }
    assert a == b and a


# ---------------------------------------------------------------------------
# round-3: Gopher/C4-style repetition + quality gate semantics
# ---------------------------------------------------------------------------


def test_repetition_stats_hand_computed(spark):
    from sparkroach.queries.llm_ops import doc_repetition_stats  # noqa: F401
    from sparkroach.queries import QUERIES
    import tempfile, os

    docs = [
        (0, "a b a b a b"),          # 6 words, 2 distinct; top bigram "a b"×3 of 5
        (1, "x y z w"),              # no repetition; every bigram count 1 of 3
        (2, "q q q q q"),            # total repetition: "q q"×4 of 4
    ]
    tmp = tempfile.mkdtemp(prefix="repstats_")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(tmp, "documents.parquet")
    )
    os.environ["SPARKROACH_LAYOUT_CACHE"] = "0"
    try:
        got = {
            r["doc_id"]: (r["n_words"], r["dup_word_frac"], r["top_bigram_frac"])
            for r in QUERIES["doc_repetition_stats"].fn(spark, tmp).collect()
        }
    finally:
        os.environ.pop("SPARKROACH_LAYOUT_CACHE", None)
    assert got[0] == (6, 1 - 2 / 6, 3 / 5)
    assert got[1] == (4, 0.0, 1 / 3)
    assert got[2] == (5, 1 - 1 / 5, 4 / 4)


def test_gopher_gate_rules(spark):
    from sparkroach.queries import QUERIES

    rows = QUERIES["gopher_quality_gate"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (
            r["ok_words"] and r["ok_word_len"] and r["ok_stopwords"]
        )
        # mean word length identity over single-space text
        assert r["ok_words"] == (10 <= r["n_words"] <= 100000)
    # the gate must actually discriminate on this corpus (not all-pass)
    keeps = {r["keep"] for r in rows}
    assert True in keeps


@pytest.mark.soak
def test_star_cc_random_graphs_match_union_find(spark):
    """Seeded Erdős–Rényi-ish graphs of varying density: star CC must equal
    union-find on every one (components of all shapes, not just cliques
    and chains)."""
    import random

    for seed, n, m in [(1, 40, 20), (2, 60, 60), (3, 80, 200), (4, 50, 10)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = _cc_py(edges)
        got = _star_labels(spark, [(a, b) for a, b in edges])
        assert got == want, f"seed={seed}"


def _capped_pair_count(n: int) -> int:
    """Closed form for one bucket under the r4 guard: exact C(n,2) at/under
    the cap; K-star (K·n − K(K+1)/2) plus the chain pairs not already in
    the star (n−1−K) above it."""
    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP, LSH_BUCKET_REPS

    if n <= LSH_BUCKET_CAP:
        return n * (n - 1) // 2
    k = LSH_BUCKET_REPS
    return k * n - k * (k + 1) // 2 + (n - 1 - k)


def test_capped_band_pairs_count_formula_random_buckets(spark):
    """One band with seeded random bucket sizes around the cap: the pair
    count must be exactly sum over buckets of the closed-form guard count
    (C(n,2) at/under the cap, K-star + chain above)."""
    import random

    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP, capped_band_pairs

    rng = random.Random(7)
    sizes = [rng.choice([1, 2, 5, LSH_BUCKET_CAP, LSH_BUCKET_CAP + 1,
                         2 * LSH_BUCKET_CAP, 150]) for _ in range(12)]
    rows, nid = [], 0
    expected = 0
    for b, n in enumerate(sizes):
        for _ in range(n):
            rows.append((nid, 0, f"bucket{b}"))
            nid += 1
        expected += _capped_pair_count(n)
    bands = spark.createDataFrame(rows, "doc_id long, band_idx int, band_val string")
    got = capped_band_pairs(bands, "doc_id").count()
    assert got == expected


def test_multiprobe_recall_dominates_single_probe(spark):
    """The whole point of multiprobe: recall vs the exact brute-force top-k
    must be monotonically non-decreasing in the probe count, and the
    registered 2-probe variant must beat OR match 1-probe while scanning
    only 2 of the clusters."""
    from sparkroach.queries import QUERIES
    from sparkroach.queries.llm_ops import _ivf_multiprobe

    exact = {}
    for r in QUERIES["ann_cosine_topk"].fn(spark, SF_SMALL).collect():
        exact.setdefault(r["q_id"], set()).add(r["c_id"])

    def recall(n_probes):
        got = {}
        for r in _ivf_multiprobe(spark, SF_SMALL, n_probes).collect():
            got.setdefault(r["q_id"], set()).add(r["c_id"])
        return sum(
            len(got.get(q, set()) & ids) / len(ids) for q, ids in exact.items()
        ) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert 0.0 < r1 <= r2 <= 1.0
    # with 2 of the clusters probed, recall should be materially better
    # than random cluster membership would give
    assert r2 >= 0.25


def test_star_cc_sweep_exhaustion_yields_one_row_per_node(spark, monkeypatch):
    """r4 (ADVICE r3): when the sweep budget exhausts before the star
    fixpoint, the output must still be one row per node (canonicalized via
    min-parent), possibly over-segmented — never duplicate conflicting
    rows."""
    import sparkroach.queries.llm_ops as lo

    monkeypatch.setattr(lo, "N_CC_MAX_SWEEPS", 1)  # force non-convergence
    n = 60
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    rows = lo.connected_components(edges, algorithm="star").collect()
    nodes = [r["node"] for r in rows]
    assert sorted(nodes) == list(range(n))  # exactly one row per node
    # labels are a refinement: every label must be <= its node and in-graph
    assert all(0 <= r["label"] <= r["node"] for r in rows)


@pytest.mark.soak
def test_ann_recall_report_monotonic_in_probes(spark):
    """r4 (VERDICT #5): the recall/cost dial must be quantitative and
    well-ordered — per query, recall@k(2 probes) >= recall@k(1 probe) and
    candidates(2) >= candidates(1); recall in [0,1]; hits <= truth_k."""
    from sparkroach.queries import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["ann_recall_report"].fn(spark, SF_SMALL).collect()
    assert rows, "empty recall report"
    by = {}
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert 0 <= r["hits"] <= r["truth_k"]
        assert r["candidates"] >= r["hits"]
        by[(r["method"], r["n_probes"], r["q_id"])] = r
    mp1 = [(k, v) for k, v in by.items() if k[0] == "ivf_multiprobe" and k[1] == 1]
    assert mp1, "missing single-probe rows"
    for (m, _p, q), r1 in mp1:
        r2 = by[(m, 2, q)]
        assert r2["recall_at_k"] >= r1["recall_at_k"], q
        assert r2["candidates"] >= r1["candidates"], q


def test_rerank_equals_exact_multiprobe_when_shortlist_covers(spark):
    """The r7 production rerank (multiprobe@2 routing, 16×4-bit ADC
    shortlist of 160, exact rerank) must reproduce the exact-cosine
    multiprobe route BIT-FOR-BIT whenever the shortlist covers every
    probed candidate — at the gate corpus (10 labels × ~50 members,
    2 probes → ~100 candidates < 160) ADC passes everything through and
    the exact stage is the whole ordering.  This pins that the
    quantized stage 1 loses NOTHING at the pinned operating point; the
    recall-at-scale claim (0.9156 at 100k == the routing ceiling) is
    measured by the dial sweep (SCALE.md §11)."""
    from sparkroach.queries import QUERIES
    from sparkroach.queries.llm_ops2 import _RERANK_SHORTLIST, _RR_NPROBE
    from tests.conftest import SF_SMALL

    # premise: every query's probed-candidate count is under the
    # shortlist depth (otherwise this equality is not implied)
    from sparkroach.queries.llm_ops import _ivf_multiprobe_parts

    probes, mp_exact = _ivf_multiprobe_parts(spark, SF_SMALL, _RR_NPROBE)
    import pyspark.sql.functions as F

    emb = spark.read.parquet(SF_SMALL + "/embeddings.parquet")
    lcnt = emb.groupBy("label").count()
    max_cand = (
        probes.join(lcnt, probes["label"] == lcnt["label"])
        .groupBy("q_id")
        .agg(F.sum("count").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert max_cand <= _RERANK_SHORTLIST, max_cand

    rer = QUERIES["ann_ivfpq_rerank"].fn(spark, SF_SMALL).collect()
    exact = mp_exact.collect()
    assert {tuple(r) for r in rer} == {tuple(r) for r in exact}
    assert len(rer) > 0
