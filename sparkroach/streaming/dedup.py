"""Incremental (streaming) near-dup deduplication with a persistent
kept-set signature store.

The reference is a write-only exporter with no dedup surface; this module
extends the LLM-data-pipeline plane (BASELINE.json north star) with the
shape a training-data ingest actually runs: documents arrive continuously,
and a doc is KEPT iff it has no LSH-verified near-dup among previously
kept documents — checked against a signature store that grows with the
kept set, never the raw corpus.

Semantics per micro-batch (greedy, deterministic):
1. cross-batch: batch docs whose band keys collide with a stored kept
   doc's band keys AND whose exact word-bigram Jaccard with that kept doc
   is >= tau are DROPPED;
2. within-batch: the survivors' verified pair graph is clustered with
   connected components and only each cluster's minimum doc_id survives
   (same canonical rule as queries.llm_ops.dedup_cc_clusters);
3. survivors append their (doc_id, shingles) and (doc_id, band_idx,
   band_val) rows to the state store and are emitted.

Greedy-vs-global note: streaming dedup is order-dependent by construction
(A~B, B~C, A!~C: one batch keeps {A}; A,B then C keeps {A, C}).  The exact
two-batch semantics are mirrored in SQL by the driver-gate twin
``dedup_streaming_kept`` (queries/llm_ops.py), so the greedy rule itself
is oracle-checked, not just invariant-checked.

100 TB design:
- the state store is keyed by band_val: at scale it is bucketed/clustered
  on band_val so the cross-batch candidate join is a bucket-pruned
  equi-join against kept-set signatures (a vanishing fraction of corpus
  bytes); shingle arrays live in a separate store joined only for the
  candidate pairs;
- each micro-batch's work is map-side signatures + two equi-joins + the
  CC loop over the batch's own (tiny) edge set;
- the store is append-only parquet here; production would use a
  transactional table format, same layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.llm_ops import (
    _JACC_SQL,
    _JACCARD_TAU,
    _capped_cand_sql,
    _lsh_candidates_cte,
    _with_shingles,
    capped_band_pairs,
    connected_components,
    lsh_bands,
)
from sparkroach.queries.registry import register
from sparkroach.tables import load


def _jaccard(sh_a, sh_b):
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(sh_a) + F.size(sh_b) - inter
    return inter.cast("double") / union


class StreamingDeduper:
    """Greedy streaming near-dup filter; see module docstring.

    ``state_dir`` holds two parquet stores: ``shingles/`` (doc_id,
    shingles) and ``bands/`` (doc_id, band_idx, band_val) for every KEPT
    document so far.
    """

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.shingle_dir = os.path.join(state_dir, "shingles")
        self.bands_dir = os.path.join(state_dir, "bands")

    def _have_state(self) -> bool:
        return os.path.isdir(self.shingle_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.shingle_dir)
        )

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Deduplicate one micro-batch of documents (doc_id, text, ...).

        Returns the kept rows of this batch as (doc_id,) and appends their
        signatures to the state store.
        """
        sh = _with_shingles(docs).localCheckpoint(eager=True)
        bands = lsh_bands(sh).localCheckpoint(eager=True)

        if self._have_state():
            kept_bands = self.spark.read.parquet(self.bands_dir)
            kept_sh = self.spark.read.parquet(self.shingle_dir)
            # The kept side is deliberately UNCAPPED (r4, fixing the r3
            # representative cap): docs sharing a band bucket in the KEPT
            # store are precisely those that failed Jaccard verification
            # against each other — mutually NON-dup — so a lowest-id
            # representative subset does NOT cover the bucket, and capping
            # it would wrongly keep a new doc whose only true near-dup
            # ranks past the cap (silently diverging from the uncapped
            # greedy oracle).  Scale posture: kept-store buckets cannot
            # degenerate under boilerplate floods, because a flood never
            # accumulates in the store — its first member is kept, every
            # later member Jaccard-matches that representative and is
            # dropped before writing.  Kept buckets therefore grow only at
            # the LSH false-positive rate (band collision AND Jaccard
            # < tau), which is a property of the band/row geometry, not of
            # corpus skew; the cross-batch join stays O(new × collisions).
            # The within-batch pair generation below remains capped
            # (capped_band_pairs) — that side DOES see raw floods.
            # cross-batch candidates: band-key equi-join against the kept
            # signature store (bucket-pruned at scale), then exact verify
            cand = (
                bands.alias("n")
                .join(
                    kept_bands.alias("k"),
                    (F.col("n.band_idx") == F.col("k.band_idx"))
                    & (F.col("n.band_val") == F.col("k.band_val")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("k.doc_id").alias("kept_id"),
                )
                .distinct()
            )
            dup_new = (
                cand.join(
                    sh.select(
                        F.col("doc_id").alias("new_id"),
                        F.col("shingles").alias("sh_n"),
                    ),
                    "new_id",
                )
                .join(
                    kept_sh.select(
                        F.col("doc_id").alias("kept_id"),
                        F.col("shingles").alias("sh_k"),
                    ),
                    "kept_id",
                )
                .where(_jaccard(F.col("sh_n"), F.col("sh_k")) >= _JACCARD_TAU)
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            sh = sh.join(dup_new, "doc_id", "left_anti").localCheckpoint(
                eager=True
            )

        # within-batch: verified pair graph → CC → keep min id per cluster
        # (capped_band_pairs applies the bucket-cardinality guard: exact
        # pairs under the cap, K-star + chain above — CC connectivity
        # intact; the oracle mirrors the cap at batch granularity)
        pairs = capped_band_pairs(lsh_bands(sh), "doc_id")
        edges = (
            pairs.join(
                sh.select(
                    F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
                ),
                "doc_a",
            )
            .join(
                sh.select(
                    F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
                ),
                "doc_b",
            )
            .where(_jaccard(F.col("sh_a"), F.col("sh_b")) >= _JACCARD_TAU)
            .select("doc_a", "doc_b")
        )
        labels = connected_components(edges)
        non_canonical = labels.where(F.col("node") != F.col("label")).select(
            F.col("node").alias("doc_id")
        )
        kept = sh.join(non_canonical, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )

        # persist the new kept signatures
        kept.write.mode("append").parquet(self.shingle_dir)
        lsh_bands(kept).write.mode("append").parquet(self.bands_dir)
        return kept.select("doc_id")


def run_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Wire the deduper into Structured Streaming: file source →
    foreachBatch(process_batch) → kept-id parquet sink.  AvailableNow
    drains the backlog and stops (the backfill trigger); a live deploy
    drops the trigger."""
    dedup = StreamingDeduper(spark, state_dir)
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)

    def _batch(df: DataFrame, batch_id: int) -> None:
        kept = dedup.process_batch(df)
        kept.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    (
        src.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _cc_keep_sql(tag: str, edges_src: str, universe: str) -> str:
    """CTE fragment: connected components over ``edges_src`` (restricted to
    ``universe``) and the kept set = universe minus non-canonical nodes."""
    return f"""
        e{tag} AS (
            SELECT doc_a, doc_b FROM {edges_src}
            WHERE doc_a IN (SELECT doc_id FROM {universe})
              AND doc_b IN (SELECT doc_id FROM {universe})
        ),
        sym{tag} AS (
            SELECT doc_a AS src, doc_b AS dst FROM e{tag}
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM e{tag}
        ),
        reach{tag}(node, r) AS (
            SELECT DISTINCT src, src FROM sym{tag}
            UNION
            SELECT s.dst, reach{tag}.r
            FROM reach{tag} JOIN sym{tag} s ON s.src = reach{tag}.node
        ),
        comp{tag} AS (
            SELECT node, MIN(r) AS root FROM reach{tag} GROUP BY node
        ),
        kept{tag} AS (
            SELECT doc_id FROM {universe}
            WHERE doc_id NOT IN (
                SELECT node FROM comp{tag} WHERE node <> root
            )
        )
    """


def _batch_edges_sql(tag: str, universe: str) -> str:
    """CTE fragment: WITHIN-BATCH verified edges for ``universe``, with the
    bucket cap mirrored at BATCH granularity — the engine computes
    capped_band_pairs on each micro-batch's own bands, so bucket counts
    (and the over-cap branch) must be evaluated against the batch subset,
    not the whole corpus."""
    capped = _capped_cand_sql(
        f"bands_u{tag}", "doc_id", ("band_idx", "band_val"), sfx=tag
    )
    return f"""
        bands_u{tag} AS (
            SELECT * FROM bands
            WHERE doc_id IN (SELECT doc_id FROM {universe})
        ),
        {capped.strip()},
        vedges{tag} AS (
            SELECT c.doc_a, c.doc_b
            FROM cand{tag} c
            JOIN shing sa ON sa.doc_id = c.doc_a
            JOIN shing sb ON sb.doc_id = c.doc_b
            WHERE {_JACC_SQL} >= {_JACCARD_TAU}
        )
    """


def _streaming_oracle() -> str:
    # corpus-level cand stays UNCAPPED: it feeds only the cross-batch
    # kept-store check, whose Spark twin (bands × kept_bands equi-join,
    # process_batch above) is itself uncapped
    lsh = _lsh_candidates_cte(capped=False).strip()
    assert lsh.startswith("WITH ")
    return f"""
        WITH RECURSIVE {lsh[len("WITH "):]},
        m AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
        edges AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN shing sa ON sa.doc_id = c.doc_a
            JOIN shing sb ON sb.doc_id = c.doc_b
            WHERE {_JACC_SQL} >= {_JACCARD_TAU}
        ),
        b1 AS (SELECT doc_id FROM documents, m WHERE doc_id < m.m),
        {_batch_edges_sql("1", "b1")},
        {_cc_keep_sql("1", "vedges1", "b1")},
        b2 AS (
            SELECT doc_id FROM documents, m
            WHERE doc_id >= m.m
              AND doc_id NOT IN (
                  SELECT e.doc_b FROM edges e JOIN kept1 k ON e.doc_a = k.doc_id
                  UNION
                  SELECT e.doc_a FROM edges e JOIN kept1 k ON e.doc_b = k.doc_id
              )
        ),
        {_batch_edges_sql("2", "b2")},
        {_cc_keep_sql("2", "vedges2", "b2")}
        SELECT doc_id, 0 AS batch_id FROM kept1
        UNION ALL
        SELECT doc_id, 1 AS batch_id FROM kept2
        ORDER BY doc_id
    """


@register(
    "dedup_streaming_kept",
    # r3: rotated INTO the driver gate window (never driver-recorded in r1/r2)
    oracle=_streaming_oracle(),
    survey_ref="LLM ops: incremental streaming dedup — greedy kept-set "
    "filter (cross-batch LSH vs signature store + within-batch CC)",
    description="batch twin of streaming/dedup.StreamingDeduper: documents "
    "split into two deterministic micro-batches; a doc survives iff no "
    "verified near-dup among previously-kept docs and it is its in-batch "
    "cluster's canonical. The SQL oracle replays the exact greedy rule, "
    "so the order-dependent streaming semantics are value-checked, not "
    "just invariant-checked",
)
def dedup_streaming_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents")
    m = d.agg(F.expr("(min(doc_id) + max(doc_id)) div 2")).collect()[0][0]
    state = tempfile.mkdtemp(prefix="sparkroach_sdedup_")
    try:
        dd = StreamingDeduper(spark, state)
        k0 = dd.process_batch(d.where(F.col("doc_id") < m)).withColumn(
            "batch_id", F.lit(0)
        )
        k1 = dd.process_batch(d.where(F.col("doc_id") >= m)).withColumn(
            "batch_id", F.lit(1)
        )
        # kept frames are localCheckpointed (block-manager backed), so the
        # on-disk state can be dropped before the caller collects
        return k0.unionByName(k1).orderBy("doc_id")
    finally:
        shutil.rmtree(state, ignore_errors=True)
