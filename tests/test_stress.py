"""CI pin for the dedup-plane stress harness (sparkroach/stress.py).

The 100k run's measured numbers live in SCALE.md §10; this pins the
harness itself at a small corpus: synthesizer determinism, the capped
oracles agreeing on the synthetic dir, and the recovery properties that
§10 claims (100% exact-dup recovery; ~all true near dups recovered).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from sparkroach import oracle, stress
from sparkroach.queries import QUERIES

# soak tier: excluded from the default driver-window run (pytest.ini)
pytestmark = pytest.mark.soak

N = 2_000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stress_corpus"))
    info = stress.synthesize(out, n_docs=N, seed=7)
    return out, info


def test_synthesizer_is_deterministic(tmp_path, corpus):
    out, info = corpus
    again = str(tmp_path / "again")
    info2 = stress.synthesize(again, n_docs=N, seed=7)
    assert info == info2
    a = open(os.path.join(out, "documents.parquet"), "rb").read()
    b = open(os.path.join(again, "documents.parquet"), "rb").read()
    assert a == b


def test_composition_has_all_adversarial_features(corpus):
    _, info = corpus
    c = info["composition"]
    assert set(c) == {"base", "exact_dup", "near_dup", "template"}
    assert c["template"] == int(N * 0.25)
    assert info["hot_source_docs"] > 0.6 * N


def test_capped_oracles_agree_on_synthetic_corpus(spark, corpus):
    out, _ = corpus
    con = oracle._duck_connection(out)
    for name in ("minhash_jaccard_verified", "dedup_cc_clusters"):
        q = QUERIES[name]
        res = oracle.compare(name, q.fn(spark, out), q.oracle, out, con)
        assert res.ok, (name, res.detail)


def test_recovery_properties(spark, corpus):
    out, _ = corpus
    from sparkroach.queries.llm_ops import _JACCARD_TAU, _with_shingles

    truth = spark.read.parquet(os.path.join(out, "ground_truth.parquet"))
    cc = QUERIES["dedup_cc_clusters"].fn(spark, out).select(
        "doc_id", "cluster_id"
    )
    m = truth.join(cc, "doc_id", "left")
    grp = (
        m.where(F.col("cluster_id").isNotNull())
        .groupBy("planted_cluster", "cluster_id")
        .agg(F.count("*").alias("together"))
    )
    det = m.join(grp, ["planted_cluster", "cluster_id"], "left").select(
        "doc_id",
        "kind",
        (F.coalesce("together", F.lit(0)) >= 2).alias("recovered"),
    )
    # every exact duplicate must land in a cluster with its group
    ex = det.where(F.col("kind") == "exact_dup")
    assert ex.where(~F.col("recovered")).count() == 0

    # near dups whose TRUE Jaccard clears tau recover near-completely
    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    sh = _with_shingles(docs)
    base = truth.where(F.col("kind") == "base").select(
        F.col("planted_cluster").alias("pc"), F.col("doc_id").alias("base_id")
    )
    nd = truth.where(F.col("kind") == "near_dup").select(
        F.col("planted_cluster").alias("pc"), "doc_id"
    )
    pairs = (
        nd.join(base, "pc")
        .join(sh.select("doc_id", F.col("shingles").alias("sa")), "doc_id")
        .join(
            sh.select(
                F.col("doc_id").alias("base_id"), F.col("shingles").alias("sb")
            ),
            "base_id",
        )
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    true_dup = (inter.cast("double") / union) >= _JACCARD_TAU
    r = (
        pairs.select("doc_id", true_dup.alias("td"))
        .join(det, "doc_id")
        .where(F.col("td"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("recovered").cast("long")).alias("rec"),
        )
        .collect()[0]
    )
    assert r.n > 100  # nonvacuous
    assert r.rec / r.n >= 0.99, (r.rec, r.n)


# ---------------------------------------------------------------------------
# ANN-plane harness (SCALE.md §11) — r6
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ann_corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann_corpus"))
    info = stress.synthesize(
        out, n_docs=N, seed=7, n_vecs=N, uniform_frac=0.15
    )
    return out, info


def test_ann_corpus_has_uniform_background(ann_corpus):
    _, info = ann_corpus
    assert info["n_vecs"] == N
    assert info["n_uniform_vecs"] == int(N * 0.15)


def test_default_corpus_is_unchanged_by_uniform_knob(tmp_path):
    """uniform_frac=0 must keep the §10 dedup corpus byte-identical —
    the knob may not perturb the RNG stream of the default path."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    stress.synthesize(a, n_docs=500, seed=7)
    stress.synthesize(b, n_docs=500, seed=7, uniform_frac=0.0)
    pa = open(os.path.join(a, "embeddings.parquet"), "rb").read()
    pb = open(os.path.join(b, "embeddings.parquet"), "rb").read()
    assert pa == pb


def test_ann_harness_end_to_end(spark, ann_corpus):
    """run_ann on the small corpus: oracle agreement (the same three
    oracles the §11 20k run verifies) + the recall/cost table's shape
    invariants (exact truth fully recalled by construction is not
    asserted — recall is measured; what must hold is that every
    cluster-pruned route scans a strict corpus subset and the report
    covers all 8 methods)."""
    out, _ = ann_corpus
    rep = stress.run_ann(spark, out, verify=True)
    for name, rec in rep["oracle"].items():
        assert rec["ok"], (name, rec)
    methods = rep["recall_by_method"]
    assert len(methods) == 8
    for key, rec in methods.items():
        assert 0.0 <= rec["recall_at_k"] <= 1.0, key
    # IVF probe routes scan a strict subset; full-scan quantizers scan all
    assert methods["ivf_label@p1"]["corpus_frac_scanned"] < 0.2
    assert methods["ivf_multiprobe@p1"]["corpus_frac_scanned"] < 0.2
    assert methods["int8_sq@p1"]["corpus_frac_scanned"] == 1.0
    # multiprobe dominates-or-ties the raw label route at equal probes
    assert (
        methods["ivf_multiprobe@p1"]["recall_at_k"]
        >= methods["ivf_label@p1"]["recall_at_k"]
    )


# ---------------------------------------------------------------------------
# PQ dial sweep (SCALE.md §11 extension) — r7
# ---------------------------------------------------------------------------


def test_np_pq_encoder_matches_hof_expression(spark, ann_corpus):
    """The sweep's Arrow/numpy encoder must produce bit-identical codes to
    the HOF expression the gate queries compile, on the gate dial AND on
    a high-resolution dial — same squared-distance arithmetic, same
    first-minimum (lowest centroid id) tie rule."""
    import pyspark.sql.functions as F

    from sparkroach.queries.llm_ops2 import (
        _pq_cb_lit,
        _pq_codebook,
        _pq_codes_hof_expr,
    )

    out, _ = ann_corpus
    e = (
        spark.read.parquet(os.path.join(out, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .limit(200)
    )
    for m, k in ((8, 16), (16, 64)):
        dsub = 64 // m
        cb = _pq_codebook(m, k, dsub)
        hof = e.select(
            "vec_id",
            F.expr(
                _pq_codes_hof_expr("embedding", m, k, dsub, _pq_cb_lit(cb))
            ).alias("codes"),
        )
        nps = e.select(
            "vec_id", stress._np_pq_codes_udf(cb)("embedding").alias("codes")
        )
        diff = hof.join(nps.withColumnRenamed("codes", "codes2"), "vec_id")
        n_bad = diff.where(F.col("codes") != F.col("codes2")).count()
        assert n_bad == 0, (m, k)


def test_pq_sweep_harness(spark, ann_corpus):
    """Sweep shape invariants on the small corpus: per stage-1 config,
    recall is monotone non-decreasing in shortlist depth for every dial
    and bounded by that config's routing ceiling; wider multiprobe never
    lowers the ceiling; candidate counts grow with probe width."""
    out, _ = ann_corpus
    rep = stress.run_pq_sweep(spark, out)
    for s1, st in rep["stage1"].items():
        assert 0.0 < st["recall_ceiling"] <= 1.0, s1
        assert st["avg_candidates"] > 0, s1
    mp = [rep["stage1"][f"label_mp@{p}"] for p in stress.PQ_SWEEP_NPROBES]
    for a, b in zip(mp, mp[1:]):
        assert b["recall_ceiling"] >= a["recall_ceiling"] - 1e-9
        assert b["avg_candidates"] >= a["avg_candidates"]
    for d in rep["dials"]:
        assert d["bytes_per_vec"] == d["m"] * d["nbits"] // 8
        for s1, by_s in d["recall_at_10"].items():
            rs = [by_s[str(s)] for s in stress.PQ_SWEEP_SHORTLISTS]
            assert rs == sorted(rs), (s1, d)  # monotone in shortlist
            assert rs[-1] <= rep["stage1"][s1]["recall_ceiling"] + 1e-9
