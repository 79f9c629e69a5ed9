"""Dedup-plane stress harness: a synthetic corpus 10-100x the sf0.1 one.

The sf* testdata tops out at 5,000 documents, so the cap/skew machinery in
the capped-LSH family (``capped_band_pairs``, ``LSH_BUCKET_CAP``, K-star
over-cap fallback) had never been exercised on a corpus where OVER-CAP
buckets dominate.  This module synthesizes (deterministically, seeded) a
corpus with the three adversarial features a web-scale crawl has:

  * planted duplicate clusters — Zipf-sized groups of exact + near
    duplicates (0-2 word edits on a shared base), the signal dedup must
    recover;
  * flooded buckets — a large template family (every member 1-3 word
    substitutions off one template) whose shingle sets collide into a few
    giant LSH buckets, forcing the over-cap K-star branch everywhere;
  * source skew — one "hot" source holding most of the corpus, so any
    per-source aggregation sees a heavy hitter.

It then runs the production dedup family end to end, measuring wall time,
candidate/verified/cluster counts, bucket census (over-cap buckets, max
bucket), LSH recall (from ``lsh_recall_report``), and partition skew of
the candidate stage — and value-verifies a subset against the SAME capped
DuckDB oracles the driver gate uses (the scratch dir swaps in synthetic
documents/embeddings and symlinks the rest of the tables).

CLI::

    python -m sparkroach.stress --n 100000 --out /tmp/sparkroach_stress \
        [--verify] [--keep]

prints one JSON object with all measurements.  The measured numbers for
the 100k run live in SCALE.md §10.
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import time

TABLES_TO_LINK = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
)
LINK_FROM = "/root/testdata/sf0.01"

# vocabulary in the testdata's register: short lowercase tokens
_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "join",
    "shuffle", "plan", "query", "index", "block", "store", "read", "write",
    "cache", "spill", "skew", "broadcast", "filter", "map", "reduce",
    "group", "order", "limit", "union", "except", "bucket", "band", "sig",
    "token", "shingle", "corpus", "doc", "text", "lang", "source", "char",
    "byte", "bit", "node", "edge", "graph", "tree", "leaf", "root", "path",
    "cost", "stat", "hint", "rule", "expr", "cast", "null", "true", "false",
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
]


def _rand_words(rng: random.Random, n: int) -> list[str]:
    return [rng.choice(_VOCAB) for _ in range(n)]


def synthesize(
    out_dir: str,
    n_docs: int = 100_000,
    seed: int = 7,
    n_vecs: int | None = None,
    template_frac: float = 0.25,
    hot_source_frac: float = 0.7,
    uniform_frac: float = 0.0,
) -> dict:
    """Write documents.parquet + embeddings.parquet; symlink other tables.

    Deterministic for a given (n_docs, seed).  Returns composition stats.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES_TO_LINK:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(LINK_FROM, f"{t}.parquet"), dst)

    n_template = int(n_docs * template_frac)
    n_organic = n_docs - n_template

    texts: list[str] = []
    kinds: list[str] = []  # base | exact_dup | near_dup | template
    planted: list[int] = []  # ground-truth cluster id (template family = -1)

    # -- organic side: Zipf-sized clusters of exact/near duplicates ------
    # cluster sizes ~ Zipf(2) truncated at 64; singletons dominate,
    # a few clusters are large — the dup-cluster size law of real crawls
    cl = 0
    while len(texts) < n_organic:
        size = min(64, int(rng.paretovariate(1.3)))
        base = _rand_words(rng, rng.randint(24, 72))
        texts.append(" ".join(base))
        kinds.append("base")
        planted.append(cl)
        for _ in range(size - 1):
            if len(texts) >= n_organic:
                break
            if rng.random() < 0.3:
                texts.append(" ".join(base))
                kinds.append("exact_dup")
            else:
                mutated = list(base)
                for _ in range(rng.randint(1, 2)):
                    mutated[rng.randrange(len(mutated))] = rng.choice(_VOCAB)
                texts.append(" ".join(mutated))
                kinds.append("near_dup")
            planted.append(cl)
        cl += 1

    # -- flood side: one template family → giant LSH buckets -------------
    template = _rand_words(rng, 48)
    for _ in range(n_template):
        m = list(template)
        for _ in range(rng.randint(1, 3)):
            m[rng.randrange(len(m))] = rng.choice(_VOCAB)
        texts.append(" ".join(m))
        kinds.append("template")
        planted.append(-1)

    # deterministic shuffle of doc order (ids stay 0..n-1 after shuffle)
    order = list(range(len(texts)))
    rng.shuffle(order)
    texts = [texts[i] for i in order]
    kinds = [kinds[i] for i in order]
    planted = [planted[i] for i in order]

    langs = [rng.choice(["en"] * 8 + ["de", "fr", "es", "pt"]) for _ in texts]
    sources = [
        "src_hot" if rng.random() < hot_source_frac
        else f"src{rng.randrange(1, 20)}"
        for _ in texts
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tab, os.path.join(out_dir, "documents.parquet"))
    truth = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "planted_cluster": pa.array(planted, type=pa.int64()),
        }
    )
    pq.write_table(truth, os.path.join(out_dir, "ground_truth.parquet"))

    # -- embeddings: planted vector clusters + near-identical dups -------
    nv = n_vecs if n_vecs is not None else min(n_docs, 50_000)
    nprng = np.random.default_rng(seed)
    n_centroids = max(8, nv // 100)
    centroids = nprng.normal(size=(n_centroids, 64))
    assign = nprng.integers(0, n_centroids, size=nv)
    vecs = centroids[assign] + nprng.normal(scale=0.35, size=(nv, 64))
    # unclustered background (ANN stress, r6): a fraction of vectors is
    # drawn uniform — far from every centroid, the worst case for any
    # IVF/label partitioning (their stored `label` becomes meaningless,
    # which is exactly the recall hazard to measure).  Default 0.0 keeps
    # the §10 dedup corpus byte-identical.
    n_dup = nv // 20
    n_uniform = int(nv * uniform_frac)
    if n_uniform:
        u_idx = nprng.choice(nv - n_dup, size=n_uniform, replace=False)
        vecs[u_idx] = nprng.uniform(-3.0, 3.0, size=(n_uniform, 64))
    # plant near-dup vectors: 5% of vectors are a tiny perturbation of an
    # earlier vector (cosine ≈ 0.999) — what embedding dedup must find
    dup_src = nprng.integers(0, nv - n_dup, size=n_dup)
    for k, s in enumerate(dup_src):
        vecs[nv - n_dup + k] = vecs[s] + nprng.normal(scale=0.01, size=64)
    emb = pa.table(
        {
            "vec_id": pa.array(range(nv), type=pa.int64()),
            "embedding": pa.array(
                [v.astype("float32") for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                [int(a) for a in assign], type=pa.int32()
            ),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    from collections import Counter

    comp = Counter(kinds)
    return {
        "n_docs": len(texts),
        "n_vecs": nv,
        "n_uniform_vecs": n_uniform,
        "composition": dict(comp),
        "hot_source_docs": sources.count("src_hot"),
        "seed": seed,
    }


def _bucket_census(spark, sf_dir: str) -> dict:
    """Band-bucket size distribution of the production minhash pipeline."""
    import pyspark.sql.functions as F

    from sparkroach.queries.llm_ops import (
        LSH_BUCKET_CAP,
        _with_shingles,
        lsh_bands,
    )
    from sparkroach.tables import load

    bands = lsh_bands(_with_shingles(load(spark, sf_dir, "documents")))
    census = bands.groupBy("band_idx", "band_val").count()
    row = census.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.sum((F.col("count") > LSH_BUCKET_CAP).cast("long")).alias(
            "over_cap_buckets"
        ),
        F.sum(
            F.when(F.col("count") > LSH_BUCKET_CAP, F.col("count")).otherwise(0)
        ).alias("docs_in_over_cap"),
    ).collect()[0]
    return {
        "n_buckets": row.n_buckets,
        "max_bucket": row.max_bucket,
        "over_cap_buckets": row.over_cap_buckets,
        "docs_in_over_cap_buckets": row.docs_in_over_cap,
        "cap": LSH_BUCKET_CAP,
    }


def _partition_skew(df) -> dict:
    """max/mean rows per partition of a materialized stage — the task-skew
    proxy (local[32] has no per-task metric API worth scraping)."""
    import pyspark.sql.functions as F

    rows = (
        df.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .count()
        .collect()
    )
    counts = [r["count"] for r in rows] or [0]
    mean = sum(counts) / len(counts)
    return {
        "partitions": len(counts),
        "max_rows": max(counts),
        "mean_rows": round(mean, 1),
        "skew_ratio": round(max(counts) / mean, 2) if mean else None,
    }


STRESS_QUERIES = (
    "minhash_lsh_candidates",
    "minhash_jaccard_verified",
    "dedup_cc_clusters",
    "ngram_char_jaccard",
    "lsh_recall_report",
    "dedup_embedding_cosine",
    "semdedup_clusters",
)

# subset value-verified against the capped DuckDB oracles on the synthetic
# corpus (the rest are verified at the sf* dirs every round; running every
# oracle at 100k is DuckDB-bound, not a Spark signal)
VERIFY_QUERIES = (
    "minhash_jaccard_verified",
    "dedup_cc_clusters",
    "dedup_embedding_cosine",
    "lsh_recall_report",
)


def run(spark, sf_dir: str, verify: bool = False) -> dict:
    import pyspark.sql.functions as F

    from sparkroach.queries import QUERIES

    out: dict = {"sf_dir": sf_dir, "queries": {}}
    out["bucket_census"] = _bucket_census(spark, sf_dir)

    for name in STRESS_QUERIES:
        fn = QUERIES[name].fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = df.count()
        wall = time.time() - t0
        rec: dict = {"rows": rows, "wall_s": round(wall, 2)}
        if name == "lsh_recall_report":
            r = df.collect()[0]
            rec.update(
                n_true_pairs=r.n_true_pairs,
                n_found=r.n_found,
                recall=round(r.recall, 4),
            )
        if name == "dedup_cc_clusters":
            agg = df.groupBy("cluster_id").count()
            top = agg.agg(
                F.max("count").alias("mx"), F.count("*").alias("n")
            ).collect()[0]
            rec.update(n_clusters=top.n, max_cluster=top.mx)
        out["queries"][name] = rec

    # planted-truth cluster recovery: pair-level recall is the wrong
    # metric under flooded buckets (the cap DELIBERATELY drops pairs while
    # preserving connectivity); what dedup must deliver is that each
    # planted duplicate doc lands in a CC cluster WITH another member of
    # its planted group.  exact_dup docs are true dups by construction;
    # near_dup docs may legitimately fall under tau after 1-2 edits, so
    # their recovery is reported separately (best-effort signal).
    truth = spark.read.parquet(os.path.join(sf_dir, "ground_truth.parquet"))
    cc = QUERIES["dedup_cc_clusters"].fn(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    m = truth.join(cc, "doc_id", "left")
    grp_n = (
        m.where(F.col("cluster_id").isNotNull())
        .groupBy("planted_cluster", "cluster_id")
        .agg(F.count("*").alias("together"))
    )
    detected = (
        m.join(grp_n, ["planted_cluster", "cluster_id"], "left")
        .withColumn(
            "ok",
            (F.col("planted_cluster") >= 0)
            & (F.coalesce(F.col("together"), F.lit(0)) >= 2),
        )
    )
    rec_rows = (
        detected.where(F.col("kind").isin("exact_dup", "near_dup"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("long")).alias("recovered"),
        )
        .collect()
    )
    recovery = {
        r.kind: {
            "n": r.n,
            "recovered": r.recovered,
            "rate": round(r.recovered / r.n, 4) if r.n else None,
        }
        for r in rec_rows
    }
    tpl = (
        m.where(F.col("kind") == "template")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("cluster_id").isNotNull().cast("long")).alias(
                "in_some_cluster"
            ),
            F.countDistinct("cluster_id").alias("n_cc_clusters"),
        )
        .collect()[0]
    )
    recovery["template_flood"] = {
        "n": tpl.n,
        "in_some_cluster": tpl.in_some_cluster,
        "fragments": tpl.n_cc_clusters,
    }
    out["cluster_recovery"] = recovery

    # partition skew of the candidate stage (the shape skew hits first)
    from sparkroach.queries.llm_ops import (
        _with_shingles,
        capped_band_pairs,
        lsh_bands,
    )
    from sparkroach.tables import load

    cand = capped_band_pairs(
        lsh_bands(_with_shingles(load(spark, sf_dir, "documents"))),
        "doc_id",
        key_cols=("band_idx", "band_val"),
    )
    out["candidate_stage_skew"] = _partition_skew(cand)

    if verify:
        from sparkroach import oracle

        con = oracle._duck_connection(sf_dir)
        out["oracle"] = {}
        for name in VERIFY_QUERIES:
            q = QUERIES[name]
            t0 = time.time()
            res = oracle.compare(name, q.fn(spark, sf_dir), q.oracle, sf_dir, con)
            out["oracle"][name] = {
                "ok": res.ok,
                "rows": res.spark_rows,
                "wall_s": round(time.time() - t0, 2),
                **({"detail": res.detail[:200]} if not res.ok else {}),
            }
    return out


# ---------------------------------------------------------------------------
# ANN-plane stress (r6): recall/cost on a 20-50x-sf0.1 vector corpus
# ---------------------------------------------------------------------------
# VERDICT r5 item 7: the 100k-doc harness above certifies the dedup plane;
# this runs the ANN family end to end on a large clustered+uniform vector
# mix — recall@k per method (from ann_recall_report, against brute-force
# truth computed at the same scale), scanned-candidate cost as a corpus
# fraction (the cluster-pruning claim, measured), and wall time.  The
# uniform fraction is the adversarial part: those vectors sit far from
# every centroid, so IVF methods must keep recall on the clustered mass
# while their cost stays pruned.

ANN_QUERIES = (
    "ann_cosine_topk",  # exact brute-force baseline (the truth)
    "ann_ivf_label",
    "ann_ivf_kmeans",
    "ann_ivf_multiprobe",
    "ann_lsh_buckets",
    "ann_int8_quantized",
    "ann_pq_adc",
    "ann_ivfpq_adc",
    "ann_ivfpq_rerank",
    "knn_graph_ivf",
    "ann_nsw_beam_search",  # r8: graph-based ANN over the kNN adjacency
)

# subset value-verified against the same DuckDB oracles the driver gate
# uses (brute-force truth + the deepest quantized chain); the full list
# is oracle-verified at the sf* dirs every round — at stress scale the
# SQL oracles are DuckDB-bound, not a Spark signal
ANN_VERIFY_QUERIES = (
    "ann_cosine_topk",
    "ann_ivfpq_adc",
    "ann_ivfpq_rerank",
)


def run_ann(spark, sf_dir: str, verify: bool = False) -> dict:
    import pyspark.sql.functions as F

    from sparkroach.queries import QUERIES

    out: dict = {"sf_dir": sf_dir, "queries": {}}
    out["n_vecs"] = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    )

    for name in ANN_QUERIES:
        fn = QUERIES[name].fn
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        out["queries"][name] = {
            "rows": rows,
            "wall_s": round(time.time() - t0, 2),
        }

    # the recall/cost dial: per-method mean recall@k and mean scanned
    # candidates (as an absolute count and a corpus fraction)
    t0 = time.time()
    rep = (
        QUERIES["ann_recall_report"]
        .fn(spark, sf_dir)
        .groupBy("method", "n_probes")
        .agg(
            F.round(F.avg("recall_at_k"), 4).alias("recall"),
            F.round(F.avg("candidates"), 1).alias("avg_candidates"),
        )
        .orderBy("method", "n_probes")
        .collect()
    )
    out["recall_report_wall_s"] = round(time.time() - t0, 2)
    denom = max(1, out["n_vecs"] - 1)
    out["recall_by_method"] = {
        f"{r.method}@p{r.n_probes}": {
            "recall_at_k": r.recall,
            "avg_candidates": r.avg_candidates,
            "corpus_frac_scanned": round(r.avg_candidates / denom, 4),
        }
        for r in rep
    }

    if verify:
        from sparkroach import oracle

        con = oracle._duck_connection(sf_dir)
        out["oracle"] = {}
        for name in ANN_VERIFY_QUERIES:
            q = QUERIES[name]
            t0 = time.time()
            res = oracle.compare(name, q.fn(spark, sf_dir), q.oracle, sf_dir, con)
            out["oracle"][name] = {
                "ok": res.ok,
                "rows": res.spark_rows,
                "wall_s": round(time.time() - t0, 2),
                **({"detail": res.detail[:200]} if not res.ok else {}),
            }
    return out


# ---------------------------------------------------------------------------
# Embedding pair-scoring stress (r8): the dedup/semdedup/knn/dbscan plane
# past the old 50k vector pin, with the executed plans audited for the
# broadcast defect the r7 verdict named (What's-wrong #1).
# ---------------------------------------------------------------------------
# The r8 fix removed every forced broadcast() on corpus-derived sides of
# the pair-scoring joins.  This mode (a) measures the four embedding-
# graph queries at --n-vecs scale (500k is the certification point — the
# same scale the ANN plane is pinned at), (b) asserts from the EXECUTED
# plans that the a_id/b_id pair joins run as shuffled joins, and (c)
# reports the pair-stage partition skew.

EMBED_QUERIES = (
    "dedup_embedding_cosine",
    "semdedup_clusters",
    "knn_graph_ivf",
    "dbscan_embedding_clusters",
)
# queries whose RETURNED plan contains the pair-scoring joins (knn/dbscan
# consume them through an eager localCheckpoint, so their final plans
# show only the ExistingRDD scan)
_EMBED_PLAN_VISIBLE = ("dedup_embedding_cosine", "semdedup_clusters")


def run_embed(spark, sf_dir: str) -> dict:
    import re as _re

    import pyspark.sql.functions as F

    from sparkroach.queries import QUERIES

    out: dict = {"sf_dir": sf_dir, "queries": {}}
    out["n_vecs"] = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    )

    for name in EMBED_QUERIES:
        fn = QUERIES[name].fn
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        out["queries"][name] = {
            "rows": rows,
            "wall_s": round(time.time() - t0, 2),
        }

    # Plan audit pass: with size-based broadcast DISABLED (static AND
    # adaptive thresholds -1) the only BroadcastHashJoins left come from
    # explicit hints — a pair join still broadcasting here is the forced-
    # hint defect.  (Under the DEFAULT conf a small side may legitimately
    # broadcast: that's AQE doing its job, not a hint.)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        for name in _EMBED_PLAN_VISIBLE:
            t0 = time.time()
            df = QUERIES[name].fn(spark, sf_dir)
            rows = df.count()
            executed = df._jdf.queryExecution().executedPlan().toString()
            bad = [
                m.group(0)
                for m in _re.finditer(
                    r"BroadcastHashJoin \[([^\]]*)\]", executed
                )
                if "a_id" in m.group(1) or "b_id" in m.group(1)
            ]
            out["queries"][name]["no_broadcast_audit"] = {
                "rows": rows,
                "wall_s": round(time.time() - t0, 2),
                "pair_join_broadcasts": bad,  # must stay []
                "shuffled_pair_join": (
                    "SortMergeJoin" in executed
                    or "ShuffledHashJoin" in executed
                ),
            }
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # skew of the banded pair candidate stage feeding dedup_embedding
    from sparkroach.queries.llm_ops import (
        N_EMB_BANDS,
        _emb_band_bucket_col,
        capped_band_pairs,
    )
    from sparkroach.tables import load

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
    cand = capped_band_pairs(bands, "vec_id", key_cols=("band_idx", "bucket"))
    out["pair_stage_skew"] = _partition_skew(cand)
    return out


# ---------------------------------------------------------------------------
# PQ dial sweep (r7): recall@10 vs codebook resolution × shortlist depth
# ---------------------------------------------------------------------------
# VERDICT r6 item 3 (the one `weak`): ivfpq_rerank recall@10 was 0.36 at
# 100k vectors with the gate-pinned dial (m=8, 4-bit codes, shortlist 24).
# Stage 1 (k-means IVF routing) measured recall 1.0 at 100k (§11), so the
# loss is entirely the ADC shortlist cut — the production dial is codebook
# resolution (m × nbits = bytes/vector) × shortlist depth.  This sweep
# measures that dial with the SAME parameterized expressions the gate
# queries compile (llm_ops2._pq_codes_hof_expr/_pq_lut_hof_expr), plus a
# sampled per-subspace k-means TRAINED codebook (the FAISS offline
# training step) as the quality ceiling at each resolution.  Rerank
# recall@10 at shortlist s equals |truth∩ADC-top-s|/|truth| exactly: the
# exact-cosine rerank of a shortlist surfaces every true top-k member the
# shortlist contains (no true member can be outranked by a non-member).

PQ_SWEEP_DIALS = (
    # (m, nbits, trained)
    (8, 4, False),  # gate-pinned dial — the r6-measured weak point
    (16, 4, False),
    (8, 8, False),
    (16, 8, False),
    (8, 8, True),  # trained codebooks: the production answer
    (16, 8, True),
)
PQ_SWEEP_SHORTLISTS = (10, 40, 160, 640)  # 1×/4×/16×/64× top-k
PQ_SWEEP_NPROBES = (1, 2, 4)  # label-centroid multiprobe widths (stage 1)
PQ_SWEEP_N_QUERIES = 32
_EMB_DIM = 64


def train_pq_codebook(
    spark,
    sf_dir: str,
    m: int,
    k: int,
    dsub: int,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 7,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd k-means on a deterministic corpus sample —
    FAISS's offline PQ training step.  Sample = a fixed vec_id stride
    (order-free, coordination-free: every worker/rerun picks the same
    rows), size- and iteration-bounded, trained driver-side in numpy
    (training is O(sample·k·dsub) — offline and tiny next to the corpus
    scan it parameterizes).  Centroids round to 6 decimals so both
    engines parse identical literals."""
    import numpy as np
    import pyspark.sql.functions as F

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()
    stride = max(1, n // sample)
    rows = (
        e.select("vec_id", "embedding")
        .where(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cb = []
    for mi in range(m):
        S = X[:, mi * dsub : (mi + 1) * dsub]
        idx = rng.choice(len(S), size=min(k, len(S)), replace=False)
        C = S[idx].copy()
        if len(C) < k:  # degenerate tiny sample: pad by repetition
            C = np.vstack([C] * (k // len(C) + 1))[:k]
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for ki in range(k):
                pts = S[a == ki]
                if len(pts):
                    C[ki] = pts.mean(axis=0)
        cb.append(
            [[round(float(v), 6) for v in C[ki]] for ki in range(k)]
        )
    return cb


def _np_pq_codes_udf(cb: list[list[list[float]]]):
    """Arrow-batched PQ encoder: codes[m] = argmin_k ||sub − C[m][k]||².

    Vectorized numpy with numpy's argmin (first minimum → lowest k, the
    SAME tie rule as the gate queries' array_min-struct expressions).
    The sweep uses this instead of the HOF expressions purely for wall
    time (k=256 dials are ~100× faster through Arrow); the gate queries
    pin the HOF-expr plans, and tests/test_stress.py pins this encoder
    equal to the HOF expression on the gate dial."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cb, dtype=np.float64)  # m × k × dsub

    def enc(col):
        m, _k, dsub = C.shape
        X = np.stack(col.to_numpy()).astype(np.float64)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for mi in range(m):
            S = X[:, mi * dsub : (mi + 1) * dsub]
            d = ((S[:, None, :] - C[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return pandas_udf(enc, "array<int>")


def run_pq_sweep(spark, sf_dir: str) -> dict:
    import numpy as np
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from sparkroach.queries.llm_ops import (
        _DOT,
        _NORM,
        TOP_K,
        _ivf_kmeans_parts,
        _ivf_multiprobe_parts,
    )
    from sparkroach.queries.llm_ops2 import _pq_codebook

    nq = PQ_SWEEP_N_QUERIES
    out: dict = {"sf_dir": sf_dir, "n_queries": nq, "top_k": TOP_K, "dials": []}
    e = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
    )
    out["n_vecs"] = e.count()

    # brute-force ground truth over nq queries (production cosine exprs)
    cosine = F.round(
        F.expr(_DOT)
        / (F.expr(_NORM.format(col="qe")) * F.expr(_NORM.format(col="ce"))),
        6,
    )
    qv = e.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    cv = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce")
    )
    wt = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id")
    )
    t0 = time.time()
    truth = (
        cv.join(F.broadcast(qv))
        .where(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(wt))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "c_id")
        .localCheckpoint(eager=True)
    )
    n_truth = truth.count()
    out["truth_wall_s"] = round(time.time() - t0, 2)

    # -- stage-1 routing configs: whose cells do queries probe? ----------
    # "kmeans@1": the trained 8-cell k-means assignment (the r6 gate
    # shape); "label_mp@p": multiprobe over the per-label centroid means
    # (fine cells — nv/100 of them on the stress corpus — the production
    # routing at scale).  Each yields (probes (q_id, cell), members
    # (c_id, cell)); the candidate set is their equi-join, and its
    # truth overlap is the dial-independent recall CEILING.
    t0 = time.time()
    assign = _ivf_kmeans_parts(spark, sf_dir)[0].localCheckpoint(eager=True)
    out["ivf_assign_wall_s"] = round(time.time() - t0, 2)
    e_lab = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "label")

    probes_by, members_by = {}, {}
    probes_by["kmeans@1"] = (
        assign.where(F.col("vec_id") < nq)
        .select(F.col("vec_id").alias("q_id"), F.col("cluster").alias("cell"))
        .localCheckpoint(eager=True)
    )
    members_by["kmeans@1"] = assign.select(
        F.col("vec_id").alias("c_id"), F.col("cluster").alias("cell")
    )
    label_members = e_lab.select(
        F.col("vec_id").alias("c_id"), F.col("label").alias("cell")
    )
    for p in PQ_SWEEP_NPROBES:
        probes_by[f"label_mp@{p}"] = (
            _ivf_multiprobe_parts(spark, sf_dir, p, n_queries=nq)[0]
            .select("q_id", F.col("label").alias("cell"))
            .localCheckpoint(eager=True)
        )
        members_by[f"label_mp@{p}"] = label_members

    out["stage1"] = {}
    for s1, probes in probes_by.items():
        cand = probes.join(members_by[s1], "cell").where(
            F.col("c_id") != F.col("q_id")
        )
        n_cand = cand.count()
        reach = cand.join(truth, ["q_id", "c_id"]).count()
        out["stage1"][s1] = {
            "recall_ceiling": round(reach / n_truth, 4),
            "avg_candidates": round(n_cand / nq, 1),
            "corpus_frac_scanned": round(
                n_cand / nq / max(1, out["n_vecs"] - 1), 4
            ),
        }

    # the nq query vectors, collected once (bounded) — LUTs are computed
    # driver-side in numpy and shipped as a tiny broadcast DataFrame
    qrows = sorted(qv.collect(), key=lambda r: r.q_id)

    max_s = max(PQ_SWEEP_SHORTLISTS)
    for m, nbits, trained in PQ_SWEEP_DIALS:
        k, dsub = 1 << nbits, _EMB_DIM // m
        t0 = time.time()
        cb = (
            train_pq_codebook(spark, sf_dir, m, k, dsub)
            if trained
            else _pq_codebook(m, k, dsub)
        )
        train_s = round(time.time() - t0, 2)

        # encode the corpus ONCE per dial (Arrow path, bit-identical to
        # the gate HOF expressions — tests/test_stress.py), reuse across
        # every stage-1 config
        t0 = time.time()
        enc = _np_pq_codes_udf(cb)
        codes = (
            e.select(
                F.col("vec_id").alias("c_id"), enc("embedding").alias("codes")
            )
            .localCheckpoint(eager=True)
        )
        codes.count()
        encode_s = round(time.time() - t0, 2)

        C = np.asarray(cb, dtype=np.float64)
        luts = []
        for r in qrows:
            x = np.asarray(r.qe, dtype=np.float64)
            lut = [
                [
                    float(((x[mi * dsub : (mi + 1) * dsub] - C[mi][ki]) ** 2).sum())
                    for ki in range(k)
                ]
                for mi in range(m)
            ]
            luts.append((r.q_id, lut))
        qlut = spark.createDataFrame(luts, "q_id long, lut array<array<double>>")
        adc = F.expr(
            " + ".join(
                f"element_at(element_at(lut, {mi + 1}), "
                f"element_at(codes, {mi + 1}) + 1)"
                for mi in range(m)
            )
        )
        ws = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id"))

        entry = {
            "m": m,
            "nbits": nbits,
            "trained": trained,
            "bytes_per_vec": m * nbits // 8,
            "train_wall_s": train_s,
            "encode_wall_s": encode_s,
            "recall_at_10": {},
            "scan_wall_s": {},
        }
        for s1, probes in probes_by.items():
            t0 = time.time()
            ranked = (
                F.broadcast(qlut.join(probes, "q_id"))
                .join(members_by[s1], "cell")
                .where(F.col("c_id") != F.col("q_id"))
                .join(codes, "c_id")
                .select("q_id", "c_id", adc.alias("adc"))
                .select(
                    "q_id", "c_id", F.row_number().over(ws).alias("rn")
                )
                .where(F.col("rn") <= max_s)
            )
            hits = (
                ranked.join(truth, ["q_id", "c_id"])
                .agg(
                    *[
                        F.sum((F.col("rn") <= s).cast("long")).alias(f"s{s}")
                        for s in PQ_SWEEP_SHORTLISTS
                    ]
                )
                .collect()[0]
            )
            entry["recall_at_10"][s1] = {
                str(s): round((hits[f"s{s}"] or 0) / n_truth, 4)
                for s in PQ_SWEEP_SHORTLISTS
            }
            entry["scan_wall_s"][s1] = round(time.time() - t0, 2)
        out["dials"].append(entry)
    return out


def run_winnow(spark, sf_dir: str) -> dict:
    """Winnowing plane at stress scale (SCALE.md §14).

    What must hold at 100k docs (and, by the same mechanics, at 100×):

    - the fingerprint census is linear in tokens and the window runs
      per-doc (no global sort);
    - the FP_MAX_DOCS boilerplate cap absorbs the template flood — the
      25% one-template corpus would otherwise create fingerprint
      buckets of ~25k docs and an O(bucket²) pair explosion;
    - the cap's DELIBERATE cost is measured, not hidden: organic
      clusters larger than the cap lose their common fingerprints too,
      so per-size recovery is reported (small clusters ≈ full recovery,
      over-cap clusters degrade — the scale path for those is the CC
      transitive closure of the MinHash plane, not winnowing).
    """
    import pyspark.sql.functions as F

    from sparkroach.queries.llm_ops8 import (
        FP_MAX_DOCS,
        MIN_SHARED,
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )
    from sparkroach.tables import load

    out: dict = {
        "sf_dir": sf_dir,
        "params": {
            "k": WINNOW_K,
            "w": WINNOW_W,
            "fp_max_docs": FP_MAX_DOCS,
            "min_shared": MIN_SHARED,
        },
    }
    docs = load(spark, sf_dir, "documents")

    t0 = time.time()
    fps = winnow_fingerprints(docs).localCheckpoint()
    n_fps = fps.count()
    out["fingerprint_stage"] = {
        "wall_s": round(time.time() - t0, 2),
        "doc_fp_rows": n_fps,
        "fps_per_doc": round(n_fps / docs.count(), 2),
        "skew": _partition_skew(fps),
    }

    df_census = fps.groupBy("fp").agg(F.count("*").alias("df"))
    cen = df_census.agg(
        F.count("*").alias("n_distinct_fp"),
        F.max("df").alias("max_df"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("singletons"),
        F.sum(
            F.when(F.col("df") > FP_MAX_DOCS, F.col("df")).otherwise(0)
        ).alias("rows_dropped_by_cap"),
        F.sum(
            F.when(F.col("df") > FP_MAX_DOCS, 1).otherwise(0)
        ).alias("fps_dropped_by_cap"),
    ).collect()[0]
    out["fp_census"] = {
        "n_distinct_fp": cen.n_distinct_fp,
        "max_df": cen.max_df,
        "singleton_frac": round(cen.singletons / cen.n_distinct_fp, 4),
        "fps_dropped_by_cap": cen.fps_dropped_by_cap,
        "doc_fp_rows_dropped_by_cap": cen.rows_dropped_by_cap,
    }

    # the pair stage WITHOUT the report limit — the stress question is
    # the join's size behavior, not the top-k presentation
    t0 = time.time()
    keep = df_census.filter(
        (F.col("df") >= 2) & (F.col("df") <= FP_MAX_DOCS)
    ).select("fp")
    a = fps.join(keep, "fp").alias("a")
    pairs = (
        a.join(fps.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= MIN_SHARED)
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    out["pair_stage"] = {
        "wall_s": round(time.time() - t0, 2),
        "n_pairs": n_pairs,
    }

    # planted-truth read: precision (reported pairs that really are
    # same-cluster near-dups; template docs all descend from ONE template
    # so cluster -1 x -1 pairs are true positives too), and per-cluster-
    # size recovery of duplicate docs (>=1 same-cluster pair found)
    truth = spark.read.parquet(os.path.join(sf_dir, "ground_truth.parquet"))
    ta = truth.select(
        F.col("doc_id").alias("doc_a"),
        F.col("planted_cluster").alias("cl_a"),
    )
    tb = truth.select(
        F.col("doc_id").alias("doc_b"),
        F.col("planted_cluster").alias("cl_b"),
    )
    scored = pairs.join(ta, "doc_a").join(tb, "doc_b")
    prec = scored.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cl_a") == F.col("cl_b")).cast("long")).alias("same"),
    ).collect()[0]
    out["precision"] = {
        "pairs": prec.n,
        "same_cluster": prec.same,
        "rate": round(prec.same / prec.n, 4) if prec.n else None,
    }

    cl_sizes = truth.where(F.col("planted_cluster") >= 0).groupBy(
        "planted_cluster"
    ).agg(F.count("*").alias("cl_size"))
    dup_docs = truth.where(
        F.col("kind").isin("exact_dup", "near_dup")
    ).join(cl_sizes, "planted_cluster")
    hit_pairs = scored.where(F.col("cl_a") == F.col("cl_b"))
    hits = (
        hit_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(hit_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    rec = (
        dup_docs.join(hits, "doc_id", "left")
        .withColumn(
            "bucket",
            F.when(F.col("cl_size") <= FP_MAX_DOCS, "cluster<=cap")
            .otherwise("cluster>cap"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("recovered"),
        )
        .collect()
    )
    out["dup_doc_recovery_by_cluster_size"] = {
        r.bucket: {
            "n": r.n,
            "recovered": r.recovered,
            "rate": round(r.recovered / r.n, 4) if r.n else None,
        }
        for r in rec
    }
    return out


def run_spans(spark, sf_dir: str) -> dict:
    """Span-cut-list plane at stress scale (SCALE.md §17).

    What must hold at 100k docs (and, by the same mechanics, at 100×):

    - the window/dup-hash/cover stages are the dup_span_coverage plan
      already measured in §10 (grouped agg + equi-join; the position
      explode is bounded by dup windows only);
    - the INCREMENT — gaps-and-islands span extraction — is a window
      partitioned BY DOC over that doc's covered positions (bounded by
      document length, never corpus size): no global sort anywhere;
    - correctness at scale is checked against the planted ground truth:
      every exact-duplicate doc must be wholly covered by ONE maximal
      span; true singleton docs (organic cluster size 1) must get no
      spans at all (a 16-word random collision is the only false path);
      the template flood yields high-but-partial coverage in few spans
      per doc (each mutation punches a ≤31-word hole).
    """
    import pyspark.sql.functions as F

    from sparkroach.queries.llm_ops12 import (
        CUT_SPAN_WORDS,
        dup_span_cut_list,
    )
    from sparkroach.tables import load

    out: dict = {"sf_dir": sf_dir, "params": {"span_words": CUT_SPAN_WORDS}}

    t0 = time.time()
    spans = dup_span_cut_list(spark, sf_dir).localCheckpoint()
    n_rows = spans.count()
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    agg = spans.agg(
        F.countDistinct("doc_id").alias("docs_with_spans"),
        F.expr("percentile(span_len, 0.5)").alias("p50_len"),
        F.max("span_len").alias("max_len"),
        F.sum("span_len").alias("covered_words"),
    ).collect()[0]
    out["cut_list"] = {
        "wall_s": round(time.time() - t0, 2),
        "n_docs": n_docs,
        "span_rows": n_rows,
        "docs_with_spans": agg["docs_with_spans"],
        "p50_span_len": float(agg["p50_len"]),
        "max_span_len": int(agg["max_len"]),
        "covered_words": int(agg["covered_words"]),
        "skew": _partition_skew(spans),
    }

    truth = spark.read.parquet(os.path.join(sf_dir, "ground_truth.parquet"))
    csize = truth.groupBy("planted_cluster").agg(
        F.count("*").alias("cluster_size")
    )
    t2 = truth.join(csize, "planted_cluster")
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_len").alias("cov"),
        F.max("span_len").alias("max_span"),
        F.first("n_words").alias("n_words"),
    )
    j = t2.join(per_doc, "doc_id", "left").localCheckpoint()

    # exact duplicates: the whole text exists elsewhere → one span == doc
    ex = j.where(F.col("kind") == "exact_dup")
    ex_row = ex.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                (F.col("n_spans") == 1)
                & (F.col("max_span") == F.col("n_words")),
                1,
            ).otherwise(0)
        ).alias("full"),
    ).collect()[0]
    # true singletons: organic cluster of size 1 → no spans expected
    sing = j.where(
        (F.col("kind") == "base") & (F.col("cluster_size") == 1)
    )
    s_row = sing.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("n_spans").isNotNull(), 1).otherwise(0)).alias(
            "with_spans"
        ),
    ).collect()[0]
    # template flood: high partial coverage, few spans
    tm = j.where(F.col("kind") == "template")
    t_row = tm.agg(
        F.count("*").alias("n"),
        F.avg(F.col("cov") / F.col("n_words")).alias("mean_cover"),
        F.avg("n_spans").alias("mean_spans"),
    ).collect()[0]
    out["truth"] = {
        "exact_dup_docs": ex_row["n"],
        "exact_dup_single_full_span_frac": round(
            ex_row["full"] / max(ex_row["n"], 1), 4
        ),
        "singleton_docs": s_row["n"],
        "singleton_false_span_frac": round(
            (s_row["with_spans"] or 0) / max(s_row["n"], 1), 6
        ),
        "template_docs": t_row["n"],
        "template_mean_cover_frac": round(t_row["mean_cover"] or 0.0, 4),
        "template_mean_spans_per_doc": round(t_row["mean_spans"] or 0.0, 2),
    }
    return out


def run_ahash(spark, n: int) -> dict:
    """Image-dedup plane at stress scale (SCALE.md §16).

    The gate (multimodal_image_ahash_pairs) proves correctness of the
    64-bit integer aHash on the tile-exact corpus; the stress question
    is the plane's behavior at 100k images through a REAL lossy codec,
    and the measured value of each named dial:

    - decode+hash is map-only and linear (measured wall);
    - the band-bucket join survives a 10k-identical-image flood only
      because of the bucket cap (the LSH cap trade, measured: flood
      recovery degrades by design, organic groups recover);
    - perceptual robustness: near-dups are NOT byte-identical — each
      group member perturbs a 2x2 pixel patch and every block carries
      a gradient texture, so the whole image goes through genuine DCT
      quantization noise;
    - HASH RICHNESS is measured, not asserted: the same corpus is
      hashed three ways — a8 (the gate's 64-bit integer aHash), a16
      (256-bit grid-16 aHash, the 'wider hash' dial), ph (64-bit DCT
      pHash) — and each variant reports its threshold ceiling, capped
      recall/precision, and the two-band split-escalation route.

    Corpus: FLOOD identical images (one template), then groups of
    GROUP images — md5-derived tile patterns + per-group gradient, all
    dims multiples of 16 so every variant hashes the same pixels.
    Ground truth is group membership.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from sparkroach.queries.llm_ops10 import _AHASH_CAP

    FLOOD = min(10_000, n // 10)
    GROUP = 5
    VARIANTS = {"a8": (4, 8), "a16": (16, 32), "ph": (4, 8)}  # bands, T
    out: dict = {
        "n_images": n,
        "params": {
            "flood": FLOOD,
            "group": GROUP,
            "cap": _AHASH_CAP,
            "variants": {
                k: {"bands": b, "hamming_t": t}
                for k, (b, t) in VARIANTS.items()
            },
        },
    }

    all_cols = [
        f"{v}{k}" for v, (nb, _) in VARIANTS.items() for k in range(nb)
    ]

    def synth_and_hash(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from sparkroach.functions.ahash import (
            ahash_bands_grid,
            phash_bands,
        )
        from sparkroach.functions.jpeg import decode_jpeg, encode_jpeg

        def tile_v(g: int, tx: int, ty: int) -> int:
            return hashlib.md5(f"{g},{tx},{ty}".encode()).digest()[0]

        for pdf in batches:
            rows = {"media_id": [], "group_id": []}
            for c in all_cols:
                rows[c] = []
            for i in pdf["id"]:
                i = int(i)
                if i < FLOOD:
                    g, m = -1, i
                    w = h = 16
                    base = 999_999_937  # one template pattern
                else:
                    g = (i - FLOOD) // GROUP
                    m = (i - FLOOD) % GROUP
                    w = 16 * (1 + g % 2)
                    h = 16 * (1 + (g // 2) % 2)
                    base = g
                img = np.zeros((h, w, 3), np.uint8)
                for ty in range(h // 8):
                    for tx in range(w // 8):
                        img[
                            ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8, :
                        ] = tile_v(base, tx, ty)
                # per-group gradient texture: without it the tile-
                # constant corpus yields low-entropy hashes, and every
                # block becomes genuinely lossy under quantization
                gd = hashlib.md5(f"grad,{base}".encode()).digest()
                ax, ay = gd[0] % 5 + 1, gd[1] % 5 + 1
                ys, xs = np.mgrid[0:h, 0:w]
                grad = ((xs * ax + ys * ay) // 4) % 33
                img = np.uint8(
                    np.clip(
                        img.astype(np.int64) + grad[..., None], 0, 255
                    )
                )
                if g >= 0 and m > 0:
                    # 2x2 pixel patch perturbation per member
                    px = (m * 5) % (w - 2)
                    py = (m * 3) % (h - 2)
                    patch = img[py : py + 2, px : px + 2, :].astype(
                        np.int64
                    )
                    img[py : py + 2, px : px + 2, :] = np.uint8(
                        np.clip(patch + 80, 0, 255)
                    )
                rgb = decode_jpeg(encode_jpeg(img))["rgb"]
                hs = {
                    "a8": ahash_bands_grid(rgb, 8),
                    "a16": ahash_bands_grid(rgb, 16),
                    "ph": phash_bands(rgb),
                }
                rows["media_id"].append(i)
                rows["group_id"].append(g)
                for v, bands in hs.items():
                    for k, bv in enumerate(bands):
                        rows[f"{v}{k}"].append(bv)
            yield pd.DataFrame(rows)

    schema = "media_id long, group_id long, " + ", ".join(
        f"{c} long" for c in all_cols
    )
    t0 = time.time()
    hx = (
        spark.range(n)
        .repartition(64)
        .mapInPandas(synth_and_hash, schema)
        .localCheckpoint()
    )
    n_hashed = hx.count()
    out["hash_stage"] = {
        "wall_s": round(time.time() - t0, 2),
        "images": n_hashed,
        "skew": _partition_skew(hx),
    }

    def eval_variant(prefix: str, n_bands: int, t_ham: int) -> dict:
        res: dict = {}
        cols = [f"{prefix}{k}" for k in range(n_bands)]
        ha = hx.select(
            F.col("media_id").alias("media_a"),
            F.col("group_id").alias("g_a"),
            *[F.col(c).alias(f"xa_{k}") for k, c in enumerate(cols)],
        )
        hb = hx.select(
            F.col("media_id").alias("media_b"),
            F.col("group_id").alias("g_b"),
            *[F.col(c).alias(f"xb_{k}") for k, c in enumerate(cols)],
        )
        hamming = sum(
            F.bit_count(F.expr(f"xa_{k} ^ xb_{k}"))
            for k in range(n_bands)
        )

        # threshold ceiling: true same-group pairs within t after codec
        org = hx.where(F.col("group_id") >= 0)
        tp = (
            org.alias("x")
            .join(org.alias("y"), "group_id")
            .where(F.col("x.media_id") < F.col("y.media_id"))
            .select(
                *[
                    F.col(f"x.{c}").alias(f"xa_{k}")
                    for k, c in enumerate(cols)
                ],
                *[
                    F.col(f"y.{c}").alias(f"xb_{k}")
                    for k, c in enumerate(cols)
                ],
            )
            .withColumn("hamming", hamming)
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("hamming") <= t_ham).cast("long")).alias(
                    "within"
                ),
            )
            .collect()[0]
        )
        res["threshold_ceiling"] = (
            round(tp.within / tp.n, 4) if tp.n else None
        )

        bands = hx.select(
            "media_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("band_idx"),
                            F.col(c).alias("band_val"),
                        )
                        for k, c in enumerate(cols)
                    ]
                )
            ).alias("bv"),
        ).select("media_id", "bv.band_idx", "bv.band_val")

        cen = (
            bands.groupBy("band_idx", "band_val")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.count("*").alias("n_buckets"),
                F.max("sz").alias("max_bucket"),
            )
            .collect()[0]
        )
        res["band_census"] = {
            "n_buckets": cen.n_buckets,
            "max_bucket": cen.max_bucket,
        }

        rk = Window.partitionBy("band_idx", "band_val").orderBy(
            "media_id"
        )
        ranked = bands.withColumn(
            "rk", F.row_number().over(rk)
        ).localCheckpoint()

        def score(cand, label: str, wall: float) -> None:
            pairs = (
                cand.join(ha, "media_a")
                .join(hb, "media_b")
                .withColumn("hamming", hamming)
                .where(F.col("hamming") <= t_ham)
                .localCheckpoint()
            )
            n_pairs = pairs.count()
            prec = pairs.agg(
                F.count("*").alias("n"),
                F.sum((F.col("g_a") == F.col("g_b")).cast("long")).alias(
                    "same"
                ),
            ).collect()[0]
            hit = pairs.where(F.col("g_a") == F.col("g_b"))
            hits = (
                hit.select(F.col("media_a").alias("media_id"))
                .unionAll(hit.select(F.col("media_b").alias("media_id")))
                .distinct()
                .withColumn("hit", F.lit(1))
            )
            rec = (
                hx.select("media_id", "group_id")
                .join(hits, "media_id", "left")
                .withColumn(
                    "bucket",
                    F.when(F.col("group_id") < 0, "flood").otherwise(
                        "organic"
                    ),
                )
                .groupBy("bucket")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias(
                        "recovered"
                    ),
                )
                .collect()
            )
            res[label] = {
                "wall_s": round(time.time() - wall, 2),
                "n_verified_pairs": n_pairs,
                "precision": (
                    round(prec.same / prec.n, 4) if prec.n else None
                ),
                "doc_recovery": {
                    r.bucket: (
                        round(r.recovered / r.n, 4) if r.n else None
                    )
                    for r in rec
                },
            }

        # capped single-band candidates (the gate's plan)
        t0 = time.time()
        base_capped = ranked.where(F.col("rk") <= _AHASH_CAP)
        ab = base_capped.select(
            "band_idx", "band_val", F.col("media_id").alias("media_a")
        )
        bb = base_capped.select(
            "band_idx", "band_val", F.col("media_id").alias("media_b")
        )
        base_cand = (
            ab.join(bb, ["band_idx", "band_val"])
            .where(F.col("media_a") < F.col("media_b"))
            .select("media_a", "media_b")
            .distinct()
        )
        score(base_cand, "capped", t0)

        # split escalation: over-cap single-band buckets re-key on
        # (band_i, band_j) pairs, cap re-applied per joint bucket
        t0 = time.time()
        sizes = bands.groupBy("band_idx", "band_val").agg(
            F.count("*").alias("sz")
        )
        hot = (
            bands.join(sizes, ["band_idx", "band_val"])
            .where(F.col("sz") > _AHASH_CAP)
            .select("media_id", "band_idx", "band_val")
            .join(hx.select("media_id", *cols), "media_id")
        )
        two = hot.select(
            "media_id",
            "band_idx",
            "band_val",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.col(c).alias("vj"),
                        )
                        for j, c in enumerate(cols)
                    ]
                )
            ).alias("s"),
        ).where(F.col("s.j") != F.col("band_idx")).select(
            "media_id",
            "band_idx",
            "band_val",
            F.col("s.j").alias("j"),
            F.col("s.vj").alias("vj"),
        )
        rk2 = Window.partitionBy(
            "band_idx", "band_val", "j", "vj"
        ).orderBy("media_id")
        two_capped = two.withColumn(
            "rk", F.row_number().over(rk2)
        ).where(F.col("rk") <= _AHASH_CAP)
        a2 = two_capped.select(
            "band_idx", "band_val", "j", "vj",
            F.col("media_id").alias("media_a"),
        )
        b2 = two_capped.select(
            "band_idx", "band_val", "j", "vj",
            F.col("media_id").alias("media_b"),
        )
        esc_cand = (
            base_cand.unionAll(
                a2.join(b2, ["band_idx", "band_val", "j", "vj"])
                .where(F.col("media_a") < F.col("media_b"))
                .select("media_a", "media_b")
            )
            .distinct()
        )
        score(esc_cand, "split_escalation", t0)
        return res

    for v, (nb, t_ham) in VARIANTS.items():
        out[v] = eval_variant(v, nb, t_ham)
    return out


def run_formats(spark, sf_dir: str) -> dict:
    """Format-lane throughput at stress scale (SCALE.md §15): write the
    100k-doc corpus through each source/sink lane, read it back with a
    content checksum, and report wall + bytes.  The point is an HONEST
    cost statement for the Python-DataSource lanes (Avro/WARC) next to
    native parquet — the interchange formats are not the hot analytic
    path, and the measurement shows what the per-file Python decode
    actually costs at corpus scale."""
    import pyspark.sql.functions as F

    from sparkroach._shiplib import ensure_shipped
    from sparkroach.sources.avro_ocf import register_avro_source
    from sparkroach.sources.binfiles import register_binfiles_sink
    from sparkroach.tables import load

    ensure_shipped(spark)
    register_avro_source(spark)
    register_binfiles_sink(spark)
    docs = load(spark, sf_dir, "documents").localCheckpoint()
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "lanes": {}}
    scratch = os.path.join(sf_dir, "_formats")

    def dir_bytes(p: str) -> int:
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if not f.startswith(".")
        )

    def checksum(df) -> int:
        return df.agg(
            F.sum(
                F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast(
                    "long"
                )
            )
        ).collect()[0][0]

    expected = checksum(docs)

    def lane(name: str, write_fn, read_fn) -> None:
        path = os.path.join(scratch, name)
        t0 = time.time()
        write_fn(path)
        w = time.time() - t0
        t0 = time.time()
        got = checksum(read_fn(path))
        r = time.time() - t0
        if got != expected:
            raise AssertionError(f"{name}: checksum mismatch after roundtrip")
        out["lanes"][name] = {
            "write_s": round(w, 2),
            "read_s": round(r, 2),
            "bytes": dir_bytes(path),
            "write_rows_per_s": round(n_docs / w),
            "read_rows_per_s": round(n_docs / r),
        }

    try:
        lane(
            "parquet",
            lambda p: docs.write.parquet(p),
            lambda p: spark.read.parquet(p),
        )
        for codec in ("deflate", "null"):
            lane(
                f"avro_{codec}",
                lambda p, c=codec: (
                    docs.write.format("sparkroach_avro")
                    .option("codec", c)
                    .mode("append")
                    .save(p)
                ),
                lambda p: spark.read.format("sparkroach_avro").load(p),
            )

        n_files = 32  # one ~3k-doc .warc.gz per task — the CC shape

        def warc_write(p: str) -> None:
            import pandas as pd

            def to_warc(pdf):
                from sparkroach.functions.warc import build_warc_gz

                pdf = pdf.sort_values("doc_id")
                fid = int(pdf["file_id"].iloc[0])
                return pd.DataFrame(
                    {
                        "filename": [f"docs-{fid:05d}.warc.gz"],
                        "content": [
                            build_warc_gz(
                                zip(
                                    pdf["doc_id"],
                                    pdf["source"],
                                    pdf["lang"],
                                    pdf["text"],
                                )
                            )
                        ],
                    }
                )

            (
                docs.select("doc_id", "source", "lang", "text")
                .withColumn("file_id", F.pmod("doc_id", F.lit(n_files)))
                .groupBy("file_id")
                .applyInPandas(to_warc, "filename string, content binary")
                .write.format("sparkroach_binfiles")
                .mode("append")
                .save(p)
            )

        def warc_read(p: str):
            import pandas as pd

            def parse(batches):
                from sparkroach.functions.warc import parse_warc_gz

                for pdf in batches:
                    texts = []
                    for content in pdf["content"]:
                        texts.extend(
                            r["payload"].decode("utf-8")
                            for r in parse_warc_gz(bytes(content))
                        )
                    yield pd.DataFrame({"text": texts})

            return (
                spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.warc.gz")
                .load(p)
                .select("content")
                .mapInPandas(parse, "text string")
            )

        lane("warc_gz", warc_write, warc_read)

        def wds_write(p: str) -> None:
            import pandas as pd

            def to_tar(pdf):
                from sparkroach.functions.wds import build_tar_shard

                pdf = pdf.sort_values("doc_id")
                fid = int(pdf["file_id"].iloc[0])
                return pd.DataFrame(
                    {
                        "filename": [f"shard-{fid:05d}.tar"],
                        "content": [
                            build_tar_shard(
                                zip(
                                    pdf["doc_id"],
                                    pdf["lang"],
                                    pdf["source"],
                                    pdf["text"],
                                )
                            )
                        ],
                    }
                )

            (
                docs.select("doc_id", "lang", "source", "text")
                .withColumn("file_id", F.pmod("doc_id", F.lit(n_files)))
                .groupBy("file_id")
                .applyInPandas(to_tar, "filename string, content binary")
                .write.format("sparkroach_binfiles")
                .mode("append")
                .save(p)
            )

        def wds_read(p: str):
            import pandas as pd

            def parse(batches):
                from sparkroach.functions.wds import parse_tar_shard

                for pdf in batches:
                    texts = []
                    for content in pdf["content"]:
                        texts.extend(
                            s["text"] for s in parse_tar_shard(bytes(content))
                        )
                    yield pd.DataFrame({"text": texts})

            return (
                spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.tar")
                .load(p)
                .select("content")
                .mapInPandas(parse, "text string")
            )

        lane("wds_tar", wds_write, wds_read)

        from sparkroach.sources.arrow_ipc import register_arrow_source

        register_arrow_source(spark)
        for comp, lname in ((None, "arrow_ipc"), ("zstd", "arrow_ipc_zstd")):
            lane(
                lname,
                lambda p, c=comp: (
                    docs.write.format("sparkroach_arrow")
                    .option("compression", c or "")
                    .mode("append")
                    .save(p)
                ),
                lambda p: spark.read.format("sparkroach_arrow").load(p),
            )

        def sqlite_write(p: str) -> None:
            import pandas as pd

            def to_sqlite(pdf):
                from sparkroach.functions.sqlite_shard import (
                    build_sqlite_shard,
                )

                pdf = pdf.sort_values("doc_id")
                fid = int(pdf["file_id"].iloc[0])
                return pd.DataFrame(
                    {
                        "filename": [f"docs-{fid:05d}.sqlite"],
                        "content": [
                            build_sqlite_shard(
                                zip(
                                    pdf["doc_id"],
                                    pdf["lang"],
                                    pdf["source"],
                                    pdf["text"],
                                    pdf["n_chars"],
                                )
                            )
                        ],
                    }
                )

            (
                docs.select("doc_id", "lang", "source", "text", "n_chars")
                .withColumn("file_id", F.pmod("doc_id", F.lit(n_files)))
                .groupBy("file_id")
                .applyInPandas(to_sqlite, "filename string, content binary")
                .write.format("sparkroach_binfiles")
                .mode("append")
                .save(p)
            )

        def sqlite_read(p: str):
            import pandas as pd

            def parse(batches):
                from sparkroach.functions.sqlite_shard import (
                    parse_sqlite_shard,
                )

                for pdf in batches:
                    texts = []
                    for content in pdf["content"]:
                        texts.extend(
                            r[3] for r in parse_sqlite_shard(bytes(content))
                        )
                    yield pd.DataFrame({"text": texts})

            return (
                spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.sqlite")
                .load(p)
                .select("content")
                .mapInPandas(parse, "text string")
            )

        lane("sqlite", sqlite_write, sqlite_read)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def run_linkage(spark, n: int, out_dir: str) -> dict:
    """Record-linkage plane at stress scale (SCALE.md §18).

    The gate (customer_record_linkage) proves the Fellegi–Sunter
    arithmetic at test SFs; the stress question is the BLOCKING dial —
    the one knob that decides whether the plane survives 100 TB:

    - COARSE pass: the gate's own nation-only blocking (25 blocks) run
      through the registered operator on a synthesized corpus.  Pair
      volume grows (n/25)² per block — the measured wall makes the
      quadratic cost a number, which is why coarse runs at a capped
      corpus size (documented below) rather than hiding the blow-up;
    - FINE pass: (nation, balance-bucket) blocking — 5,000 blocks —
      at the full corpus size.  Pair volume drops ~200×; the cost is
      measured recall: true pairs whose balance jitter crosses a
      bucket boundary (and the nation-corrupted ones, as before) no
      longer co-block;
    - band quality vs planted ground truth (same custkey): match-band
      precision, match recall, clerical-review (possible-band) volume,
      and blocking recall separately from scoring recall — the
      decomposition a production linkage report needs.

    Corpus: custkey 0..n-1, names encode the key (so prefix collisions
    happen exactly between keys differing in the last digit, ~10% of a
    block — the realistic clerical-review load), balances deterministic
    2-decimal pseudo-randoms, the dirty twin derived with the gate's
    residue rules (%7 name truncation, %11 segment swap, %13 nation
    corruption, %5 balance jitter).
    """
    import pyspark.sql.functions as F

    from sparkroach.queries.analytics25 import (
        _T_MATCH,
        _T_POSSIBLE,
        customer_record_linkage,
    )

    out: dict = {"n": n}
    segs = "ARRAY('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD')"

    def synth_customers(m: int):
        return spark.range(m).selectExpr(
            "id AS c_custkey",
            "concat('Customer#', lpad(CAST(id AS STRING), 12, '0')) AS c_name",
            "CAST(id % 25 AS INT) AS c_nationkey",
            "CAST((id * 7919) % 1000000 AS DOUBLE) / 100.0 AS c_acctbal",
            f"element_at({segs}, CAST(id % 5 AS INT) + 1) AS c_mktsegment",
        )

    def dirty_of(c):
        return c.selectExpr(
            "c_custkey AS d_custkey",
            "CASE WHEN c_custkey % 7 = 0 "
            "THEN substr(c_name, 1, length(c_name) - 1) "
            "ELSE c_name END AS d_name",
            "CASE WHEN c_custkey % 13 = 0 "
            "THEN CAST((c_nationkey + 1) % 25 AS INT) "
            "ELSE c_nationkey END AS d_nation",
            "CASE WHEN c_custkey % 11 = 0 THEN 'SWAPPED' "
            "ELSE c_mktsegment END AS d_seg",
            "CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 1.0 "
            "ELSE c_acctbal END AS d_bal",
        )

    score_sql = (
        f"(CASE WHEN c_name = d_name THEN 40 "
        f"WHEN substr(c_name, 1, length(c_name) - 1) "
        f"= substr(d_name, 1, length(c_name) - 1) THEN 18 ELSE -25 END) "
        f"+ (CASE WHEN c_mktsegment = d_seg THEN 8 ELSE -12 END) "
        f"+ (CASE WHEN abs(c_acctbal - d_bal) <= 0.5 THEN 10 ELSE -15 END)"
    )

    def band_quality(pairs) -> dict:
        banded = pairs.selectExpr(
            f"CASE WHEN {score_sql} >= {_T_MATCH} THEN 'match' "
            f"WHEN {score_sql} >= {_T_POSSIBLE} THEN 'possible' "
            f"ELSE 'non_match' END AS band",
            "CAST(c_custkey = d_custkey AS INT) AS is_true",
        )
        rows = {
            r["band"]: r
            for r in banded.groupBy("band")
            .agg(
                F.count("*").alias("n_pairs"),
                F.sum("is_true").alias("n_true"),
            )
            .collect()
        }
        g = lambda b, k: int(rows[b][k]) if b in rows else 0  # noqa: E731
        n_match, t_match = g("match", "n_pairs"), g("match", "n_true")
        return {
            "pairs": sum(g(b, "n_pairs") for b in rows),
            "match_pairs": n_match,
            "match_true": t_match,
            "match_precision": round(t_match / n_match, 4) if n_match else None,
            "possible_pairs": g("possible", "n_pairs"),
            "possible_true": g("possible", "n_true"),
            "non_match_true": g("non_match", "n_true"),
            "coblocked_true": sum(g(b, "n_true") for b in rows),
        }

    # -- coarse pass: the registered operator on a capped corpus --------
    coarse_n = min(n, 20_000)
    coarse_dir = os.path.join(out_dir, "linkage_coarse")
    os.makedirs(coarse_dir, exist_ok=True)
    synth_customers(coarse_n).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(coarse_dir, "customer.parquet")
    )
    t0 = time.time()
    gate_rows = {
        r["band"]: r for r in customer_record_linkage(spark, coarse_dir).collect()
    }
    coarse_wall = round(time.time() - t0, 2)
    c = synth_customers(coarse_n)
    cq = band_quality(c.join(dirty_of(c), c["c_nationkey"] == F.col("d_nation")))
    cq.update(
        {
            "wall_s": coarse_wall,
            "corpus": coarse_n,
            "blocks": 25,
            "gate_bands": {
                b: [int(r["n_pairs"]), int(r["n_true_pairs"])]
                for b, r in gate_rows.items()
            },
        }
    )
    out["coarse_nation_only"] = cq

    # -- fine pass: (nation, balance-bucket) blocking at full n ---------
    c = synth_customers(n)
    d = dirty_of(c)
    cb = c.withColumn("blk", F.expr("CAST(c_acctbal / 50.0 AS INT)"))
    db = d.withColumn("blk", F.expr("CAST(d_bal / 50.0 AS INT)"))
    t0 = time.time()
    fine_pairs = cb.join(
        db,
        (cb["c_nationkey"] == db["d_nation"]) & (cb["blk"] == db["blk"]),
    )
    fq = band_quality(fine_pairs)
    fq.update(
        {
            "wall_s": round(time.time() - t0, 2),
            "corpus": n,
            "blocks": 25 * 200,
            # true pairs lost ONLY to the finer key (bucket-crossing
            # jitter), beyond the nation corruption both passes share
            "true_pairs_total": n,
        }
    )
    out["fine_nation_balance"] = fq
    shutil.rmtree(coarse_dir, ignore_errors=True)
    return out


def run_codecs(spark, n_images: int) -> dict:
    """Codec-lane throughput (r8): encode+decode n synthetic media items
    through each REAL from-scratch codec's mapInPandas lane — the
    byte-level cost of the multimodal decode plane, measured.  Each lane
    is a Spark job over a ``spark.range`` id column (no parquet), so the
    number is pure codec + Arrow-batch cost."""
    from pyspark.sql import functions as F

    from sparkroach._shiplib import ensure_shipped

    ensure_shipped(spark)
    docs = spark.range(n_images).select(F.col("id").alias("doc_id"))
    out: dict = {"n_images": n_images}

    def lane(name, synth, feats, byte_col="payload"):
        t0 = time.time()
        media = synth(docs).localCheckpoint(eager=True)
        enc_s = time.time() - t0
        nbytes = media.agg(
            F.sum(F.octet_length(byte_col)).alias("b")
        ).collect()[0]["b"]
        t0 = time.time()
        rows = feats(media).count()
        dec_s = time.time() - t0
        out[name] = {
            "rows": rows,
            "payload_mb": round(nbytes / 1e6, 2),
            "encode_s": round(enc_s, 2),
            "decode_s": round(dec_s, 2),
            "decode_items_per_s": round(rows / dec_s, 1) if dec_s else None,
        }

    from sparkroach.functions.g711 import g711_features, synthesize_g711_media
    from sparkroach.functions.gif import gif_features, synthesize_gif_media
    from sparkroach.functions.jpeg import jpeg_features, synthesize_jpeg_media
    from sparkroach.functions.png import png_features, synthesize_png_media
    from sparkroach.functions.qoi import qoi_features, synthesize_qoi_media
    from sparkroach.functions.rice import rice_features, synthesize_rice_media
    from sparkroach.functions.tiff import synthesize_tiff_media, tiff_features

    lane("png", synthesize_png_media, png_features)
    lane("gif", synthesize_gif_media, gif_features)
    lane("jpeg", synthesize_jpeg_media, jpeg_features)
    lane("g711", synthesize_g711_media, g711_features)
    lane("qoi", synthesize_qoi_media, qoi_features)
    lane("tiff", synthesize_tiff_media, tiff_features)
    lane("rice", synthesize_rice_media, rice_features)

    # byte codecs over synthesized word-soup text (the documents-table
    # shape): per-doc compress in one mapInPandas stage, strict
    # decompress+hash in the next — identical to the gate lanes
    words = (
        "array('scan','join','window','merge','batch','spark','hash',"
        "'sort')"
    )
    docs_txt = docs.selectExpr(
        "doc_id",
        f"concat_ws(' ', transform(sequence(1, 60), "
        f"i -> element_at({words}, "
        f"CAST((doc_id * 7 + i * 13) % 8 AS INT) + 1))) AS text",
    )

    def text_lane(name, compress, decompress):
        t0 = time.time()
        comp = compress(docs_txt).localCheckpoint(eager=True)
        enc_s = time.time() - t0
        nbytes = comp.agg(
            F.sum(F.octet_length("payload")).alias("b")
        ).collect()[0]["b"]
        t0 = time.time()
        rows = decompress(comp).count()
        dec_s = time.time() - t0
        out[name] = {
            "rows": rows,
            "payload_mb": round(nbytes / 1e6, 2),
            "encode_s": round(enc_s, 2),
            "decode_s": round(dec_s, 2),
            "decode_items_per_s": round(rows / dec_s, 1) if dec_s else None,
        }

    from sparkroach.functions import bwt as _bwt
    from sparkroach.functions import lz4block as _lz4

    text_lane("lz4", _lz4.compress_documents, _lz4.decompress_features)
    text_lane("bwt", _bwt.compress_documents, _bwt.decompress_features)
    return out


def run_rankstats(spark, n_rows: int) -> dict:
    """Exact rank statistics at volume (SCALE.md §23): Mann-Whitney U
    and Spearman's ρ over ``n_rows`` synthesized rows, CROSS-ENGINE
    VERIFIED — DuckDB recomputes the identical statistics from the
    identical arithmetic synthesis and every exact integer (and the one
    fixed-shape double each) must agree bit-for-bit.  The point: the
    distributed midrank machinery (grouped distinct values → prefix
    scan → value-keyed joins) carries EXACT order statistics at any n,
    where a sort-based rank would shuffle the world."""
    import duckdb

    from pyspark.sql import functions as F

    from sparkroach.queries.analytics29 import _rank2_table

    out: dict = {"n_rows": n_rows}
    # planted location shift between the two groups → a real z signal
    synth_cols = [
        "id % 2 AS grp",
        "CAST(((id * 2654435761) % 2147483647) % 40000 "
        "+ (id % 2) * 300 AS BIGINT) AS v",
        "CAST(((id * 1103515245) % 2147483647) % 40000 AS BIGINT) AS w",
    ]
    synth_sql = ", ".join(synth_cols)
    rows = spark.range(n_rows).selectExpr(*synth_cols).localCheckpoint(
        eager=True
    )

    # -- Mann-Whitney over grp 0 vs 1 on v --------------------------------
    t0 = time.time()
    g = rows.groupBy("v").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("cnt1"),
    )
    r = _rank2_table(g, "v")
    s = r.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum((F.col("cnt1") * F.col("rank2")).cast("decimal(38,0)")).alias(
            "r1s2"
        ),
        F.sum(
            F.col("cnt").cast("decimal(18,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("ties"),
    ).collect()[0]
    mw_wall = time.time() - t0
    import math

    n, n1 = int(s["n"]), int(s["n1"])
    n2 = n - n1
    r1s2, ties = int(s["r1s2"]), int(s["ties"])
    ud = r1s2 - n1 * (n1 + 1) - n1 * n2
    m = (n + 1) * n * (n - 1) - ties
    z = float(ud) / (
        2.0 * math.sqrt(float(n1 * n2) * float(m) / float(12 * n * (n - 1)))
    )

    con = duckdb.connect()
    dn, dn1, dr1s2, dties, dz = con.execute(
        f"""
        WITH q AS (SELECT {synth_sql.replace("id", "r.range")}
                   FROM range(0, {n_rows}) r),
        g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS cnt1
              FROM q GROUP BY v),
        r AS (SELECT *, SUM(cnt) OVER (ORDER BY v) AS run FROM g),
        a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                     CAST(SUM(cnt1) AS BIGINT) AS n1,
                     CAST(SUM(cnt1 * (2 * (run - cnt) + cnt + 1))
                          AS BIGINT) AS r1s2,
                     CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
                          AS BIGINT) AS ties
              FROM r)
        SELECT n, n1, r1s2, ties,
               CAST(r1s2 - n1 * (n1 + 1) - n1 * (n - n1) AS DOUBLE)
               / (2.0 * sqrt(CAST(n1 * (n - n1) AS DOUBLE)
                             * CAST((n + 1) * n * (n - 1) - ties AS DOUBLE)
                             / CAST(12 * n * (n - 1) AS DOUBLE)))
        FROM a
        """
    ).fetchone()
    out["mann_whitney"] = {
        "wall_s": round(mw_wall, 2),
        "z": z,
        "integers_equal": (int(dn), int(dn1), int(dr1s2), int(dties))
        == (n, n1, r1s2, ties),
        "z_bit_equal": dz == z,
    }

    # -- Spearman between v and w ----------------------------------------
    t0 = time.time()
    rx = _rank2_table(
        rows.groupBy("v").agg(F.count("*").cast("long").alias("cnt")), "v"
    ).select("v", (F.col("rank2") - (n_rows + 1)).alias("cx"))
    ry = _rank2_table(
        rows.groupBy("w").agg(F.count("*").cast("long").alias("cnt")), "w"
    ).select("w", (F.col("rank2") - (n_rows + 1)).alias("cy"))
    sp = (
        rows.join(rx, "v")
        .join(ry, "w")
        .agg(
            F.sum((F.col("cx") * F.col("cy")).cast("decimal(38,0)")).alias(
                "sxy"
            ),
            F.sum((F.col("cx") * F.col("cx")).cast("decimal(38,0)")).alias(
                "sxx"
            ),
            F.sum((F.col("cy") * F.col("cy")).cast("decimal(38,0)")).alias(
                "syy"
            ),
        )
        .collect()[0]
    )
    sp_wall = time.time() - t0
    sxy, sxx, syy = int(sp["sxy"]), int(sp["sxx"]), int(sp["syy"])
    rho = float(sxy) / (math.sqrt(float(sxx)) * math.sqrt(float(syy)))
    dsxy, dsxx, dsyy, drho = con.execute(
        f"""
        WITH q AS (SELECT {synth_sql.replace("id", "r.range")}
                   FROM range(0, {n_rows}) r),
        gx AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY v),
        rx AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1
                          AS rank2 FROM gx),
        gy AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY w),
        ry AS (SELECT w, 2 * (SUM(cnt) OVER (ORDER BY w) - cnt) + cnt + 1
                          AS rank2 FROM gy),
        c AS (SELECT rx.rank2 - {n_rows + 1} AS cx,
                     ry.rank2 - {n_rows + 1} AS cy
              FROM q JOIN rx ON rx.v = q.v JOIN ry ON ry.w = q.w),
        s AS (SELECT CAST(SUM(cx * cy) AS BIGINT) AS sxy,
                     CAST(SUM(cx * cx) AS BIGINT) AS sxx,
                     CAST(SUM(cy * cy) AS BIGINT) AS syy
              FROM c)
        SELECT sxy, sxx, syy,
               CAST(sxy AS DOUBLE)
               / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        FROM s
        """
    ).fetchone()
    out["spearman"] = {
        "wall_s": round(sp_wall, 2),
        "rho": rho,
        "integers_equal": (int(dsxy), int(dsxx), int(dsyy))
        == (sxy, sxx, syy),
        "rho_bit_equal": drho == rho,
    }
    return out


def run_micro(spark) -> dict:
    """Micro-stress for the wave-8+ operator plans (SCALE.md §19):
    synthesized inputs from ``spark.range`` expressions (no parquet),
    each measuring the plan shape's throughput claim directly.

    - SKYLINE at 10M points: the distributed prefix-max recipe must be
      grouped-agg-bound, not pair-bound (the NOT-EXISTS oracle would be
      10^14 comparisons; the measured wall shows the prefix plan is
      seconds).  Price domain 100k distinct → the prefix stage is
      domain-bounded, the fact scan corpus-bounded.
    - FEISTEL epoch shuffle at 100M ids: pure-projection throughput +
      the injectivity census (count distinct over 100M) — the shuffle's
      only real cost at scale.
    - SUBSTRING multi-pattern scan at 1M synthetic docs (~64 MB text):
      the replace()-identity pass is whole-stage-codegen string work;
      rows/s and bytes/s are the honest cost statement.
    """
    import pyspark.sql.functions as F

    out: dict = {}

    # -- skyline at 10M ---------------------------------------------------
    from sparkroach.queries.analytics25 import _exclusive_prefix_max

    n_sky = 10_000_000
    pts = spark.range(n_sky).selectExpr(
        "id AS p_partkey",
        # 100k distinct prices; size positively correlated with price
        # plus hash noise wider than the price step, so the frontier is
        # a genuine staircase of thousands of points (the join-back is
        # exercised, not a 1-row degenerate)
        "CAST((id * 7919) % 100000 AS DOUBLE) / 10.0 AS price",
        "CAST(((id * 7919) % 100000 div 100) + "
        "(hash(id) % 1009 + 1009) % 1009 AS BIGINT) AS size",
    )
    t0 = time.time()
    by_price = pts.groupBy("price").agg(F.max("size").alias("smax"))
    pref = _exclusive_prefix_max(by_price, "price", "smax")
    frontier = pref.filter(F.col("smax") > F.col("pmax")).select(
        F.col("price").alias("f_price"), F.col("smax").alias("f_smax")
    )
    got = (
        pts.join(
            F.broadcast(frontier),
            (F.col("price") == F.col("f_price"))
            & (F.col("size") == F.col("f_smax")),
        )
        .count()
    )
    wall = time.time() - t0
    out["skyline_10m"] = {
        "n_points": n_sky,
        "distinct_prices": 100000,
        "frontier_rows": int(got),
        "wall_s": round(wall, 2),
        "points_per_s": round(n_sky / wall),
    }

    # -- Feistel shuffle at 100M ------------------------------------------
    from sparkroach.queries.llm_ops14 import _FEISTEL_ROUNDS, _HALF, _feistel_f

    n_sh = 100_000_000
    cur = spark.range(n_sh).selectExpr(
        "id AS doc_id", f"id div {_HALF} AS l0", f"id % {_HALF} AS r0"
    )
    for i, (a, b) in enumerate(_FEISTEL_ROUNDS, start=1):
        p = i - 1
        cur = cur.selectExpr(
            "doc_id",
            f"r{p} AS l{i}",
            f"(l{p} + {_feistel_f(f'r{p}', a, b)}) % {_HALF} AS r{i}",
        )
    k = len(_FEISTEL_ROUNDS)
    pos = cur.selectExpr("doc_id", f"l{k} * {_HALF} + r{k} AS pos")
    t0 = time.time()
    census = pos.agg(
        F.count("*").alias("n"), F.countDistinct("pos").alias("nd")
    ).collect()[0]
    wall = time.time() - t0
    assert census["n"] == census["nd"] == n_sh, "bijection violated"
    out["feistel_100m"] = {
        "n_ids": n_sh,
        "distinct_positions": int(census["nd"]),
        "wall_s": round(wall, 2),
        "ids_per_s": round(n_sh / wall),
    }

    # -- substring scan at 1M docs -----------------------------------------
    from sparkroach.queries.llm_ops14 import _SUB_PATTERNS, _sub_occ_sql

    n_docs = 1_000_000
    docs = spark.range(n_docs).selectExpr(
        "concat_ws(' ', md5(CAST(id AS STRING)), "
        "md5(CAST(id + 1 AS STRING)), 'part table value fast hash') AS text"
    )
    total_bytes = 64 + 2 + 32 + 28  # ~126 B/doc
    occ_cols = [
        F.expr(_sub_occ_sql(p)).alias(f"occ_{i}")
        for i, p in enumerate(_SUB_PATTERNS)
    ]
    t0 = time.time()
    agg = docs.select(*occ_cols).agg(
        *[F.sum(f"occ_{i}").alias(f"s{i}") for i in range(len(_SUB_PATTERNS))]
    ).collect()[0]
    wall = time.time() - t0
    out["substring_scan_1m"] = {
        "n_docs": n_docs,
        "n_patterns": len(_SUB_PATTERNS),
        "approx_mb": round(n_docs * total_bytes / 1e6),
        "total_occurrences": int(sum(agg)),
        "wall_s": round(wall, 2),
        "docs_per_s": round(n_docs / wall),
    }
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/sparkroach_stress")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--ann", action="store_true",
        help="run the ANN-plane stress instead of the dedup plane",
    )
    ap.add_argument(
        "--pq-sweep", action="store_true",
        help="run the PQ dial sweep (codebook resolution × shortlist "
        "depth × trained/deterministic codebooks) on the ANN corpus",
    )
    ap.add_argument(
        "--formats", action="store_true",
        help="measure format-lane roundtrip throughput (parquet vs "
        "Avro vs WARC) on the stress corpus",
    )
    ap.add_argument(
        "--winnow", action="store_true",
        help="run the winnowing-fingerprint plane stress (census, "
        "boilerplate-cap behavior, pair precision, per-cluster-size "
        "recovery) on the dedup corpus",
    )
    ap.add_argument(
        "--spans", action="store_true",
        help="run the span-cut-list plane stress (dup_span_cut_list at "
        "scale, islands extraction validated against the planted "
        "ground truth) on the dedup corpus",
    )
    ap.add_argument(
        "--ahash", action="store_true",
        help="run the image-dedup (aHash) plane stress: synthesize+"
        "encode+decode+hash n images through the real JPEG codec, "
        "band-bucket census under a 10%% identical-image flood, capped "
        "pair join, perceptual recall on perturbed near-dups",
    )
    ap.add_argument(
        "--codecs", action="store_true",
        help="measure codec-lane throughput (PNG/GIF/JPEG/G.711/QOI/TIFF/"
        "Rice/LZ4/SBWT encode+decode items/s) on --n synthesized items",
    )
    ap.add_argument(
        "--micro", action="store_true",
        help="micro-stress the wave-8+ operator plans on synthesized "
        "spark.range inputs: skyline at 10M points, Feistel shuffle at "
        "100M ids, substring scan at 1M docs",
    )
    ap.add_argument(
        "--rankstats", action="store_true",
        help="exact rank statistics (Mann-Whitney U, Spearman rho) on "
        "--n synthesized rows, cross-engine bit-equality verified vs "
        "DuckDB; run at --n 2000000 (the BIGINT-exact guard boundary)",
    )
    ap.add_argument(
        "--linkage", action="store_true",
        help="run the record-linkage plane stress: coarse (nation-only, "
        "the gate's blocking, capped corpus) vs fine (nation+balance-"
        "bucket, full corpus) blocking with band precision/recall vs "
        "planted ground truth",
    )
    ap.add_argument(
        "--embed", action="store_true",
        help="run the embedding pair-scoring stress (dedup/semdedup/knn/"
        "dbscan at --n-vecs scale) with executed-plan broadcast audit "
        "— certifies the r8 no-corpus-broadcast fix past the old 50k pin",
    )
    ap.add_argument(
        "--n-vecs", type=int, default=None,
        help="vector count (default: dedup plane min(n,50k); ANN plane n)",
    )
    ap.add_argument(
        "--uniform-frac", type=float, default=None,
        help="fraction of unclustered uniform vectors (default: ANN 0.15, "
        "dedup 0.0 — keeps the §10 corpus byte-identical)",
    )
    args = ap.parse_args()

    from sparkroach.session import get_spark

    uniform = args.uniform_frac
    if uniform is None:
        uniform = 0.15 if (args.ann or args.pq_sweep) else 0.0
    n_vecs = args.n_vecs
    if n_vecs is None and (args.ann or args.pq_sweep):
        n_vecs = args.n
    report: dict = {}
    if not (args.ahash or args.linkage or args.micro or args.codecs or args.rankstats):
        # (these modes synthesize their own corpora)
        report["synth"] = synthesize(
            args.out, args.n, args.seed, n_vecs=n_vecs, uniform_frac=uniform
        )
    spark = get_spark("sparkroach-stress")
    try:
        t0 = time.time()
        if args.ahash:
            report.update(run_ahash(spark, args.n))
        elif args.codecs:
            report.update(run_codecs(spark, args.n))
        elif args.micro:
            report.update(run_micro(spark))
        elif args.rankstats:
            report.update(run_rankstats(spark, args.n))
        elif args.linkage:
            os.makedirs(args.out, exist_ok=True)
            report.update(run_linkage(spark, args.n, args.out))
        elif args.embed:
            report.update(run_embed(spark, args.out))
        elif args.pq_sweep:
            report.update(run_pq_sweep(spark, args.out))
        elif args.winnow:
            report.update(run_winnow(spark, args.out))
        elif args.spans:
            report.update(run_spans(spark, args.out))
        elif args.formats:
            report.update(run_formats(spark, args.out))
        else:
            runner = run_ann if args.ann else run
            report.update(runner(spark, args.out, verify=args.verify))
        report["total_wall_s"] = round(time.time() - t0, 2)
    finally:
        spark.stop()
        if not args.keep:
            shutil.rmtree(args.out, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
