"""Streaming incremental dedup (round 3): the Structured Streaming
pipeline must reproduce the oracle-checked greedy batch-twin exactly, and
the kept-set invariants must hold.

The batch twin (queries registry: dedup_streaming_kept) is value-checked
against a recursive-CTE SQL replay by the oracle gate; here the REAL
stream (file source, maxFilesPerTrigger=1, foreachBatch) is checked
against the twin, closing the loop streaming == batch == SQL.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops import _JACCARD_TAU, _verified_pairs
from sparkroach.streaming.dedup import StreamingDeduper, run_stream
from sparkroach.tables import load
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def twin_rows(spark):
    return QUERIES["dedup_streaming_kept"].fn(spark, SF_SMALL).collect()


@pytest.mark.soak  # property/twin grade (r9 tiering)
def test_stream_matches_batch_twin(spark, tmp_path_factory, twin_rows):
    """File-source stream (one file per micro-batch, same split as the
    twin) keeps exactly the twin's docs with the same batch ids."""
    root = tmp_path_factory.mktemp("sdedup")
    src = str(root / "src")
    d = load(spark, SF_SMALL, "documents")
    m = d.agg(F.expr("(min(doc_id) + max(doc_id)) div 2")).collect()[0][0]
    # one file per half; file order = batch order (mtime-ordered source)
    os.makedirs(src)
    d.where(F.col("doc_id") < m).coalesce(1).write.mode("append").parquet(src)
    first = max(
        (os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    d.where(F.col("doc_id") >= m).coalesce(1).write.mode("append").parquet(src)
    # guarantee ordering even on coarse mtime granularity
    later = os.path.getmtime(first) + 10
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if f.endswith(".parquet") and p != first:
            os.utime(p, (later, later))

    out = str(root / "out")
    run_stream(
        spark,
        source_dir=src,
        state_dir=str(root / "state"),
        out_dir=out,
        checkpoint_dir=str(root / "ckpt"),
        max_files_per_trigger=1,
    )
    got = {
        (r["doc_id"], r["batch_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(r["doc_id"], r["batch_id"]) for r in twin_rows}


def test_kept_set_has_no_internal_near_dups(spark, twin_rows):
    """No two kept docs may be verified near-dups UNLESS the pair was
    unseen by the greedy order (both non-canonical timing); with two
    batches the only allowed kept-kept dup is batch1-doc ~ batch1-doc
    never — i.e. intra-batch pairs are always resolved, and batch2 docs
    near-dup a KEPT batch1 doc are dropped.  Verify both properties."""
    kept = {r["doc_id"]: r["batch_id"] for r in twin_rows}
    d = load(spark, SF_SMALL, "documents")
    dup_pairs = [
        (r["doc_a"], r["doc_b"])
        for r in _verified_pairs(d)
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .collect()
    ]
    for a, b in dup_pairs:
        if a in kept and b in kept:
            # a near-dup pair surviving entirely is a bug: same batch →
            # CC collapses it; cross-batch → the later doc is dropped
            raise AssertionError(
                f"kept near-dup pair {(a, kept[a])} ~ {(b, kept[b])}"
            )


def test_second_batch_drops_against_state_only_when_verified(
    spark, tmp_path_factory
):
    """A batch-2 doc with band collisions but sub-threshold Jaccard must
    survive: the state check is candidate-generate + exact-verify, not
    candidate == duplicate."""
    root = tmp_path_factory.mktemp("sdedup2")
    dd = StreamingDeduper(spark, str(root / "state"))
    d = load(spark, SF_SMALL, "documents")
    m = d.agg(F.expr("(min(doc_id) + max(doc_id)) div 2")).collect()[0][0]
    kept1 = {r["doc_id"] for r in dd.process_batch(d.where(F.col("doc_id") < m)).collect()}
    kept2 = {r["doc_id"] for r in dd.process_batch(d.where(F.col("doc_id") >= m)).collect()}
    assert kept1 and kept2
    # every dropped batch-2 doc must have a VERIFIED near-dup among kept1
    # or be a non-canonical member of a batch-2 cluster
    dup_pairs = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in _verified_pairs(d)
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .collect()
    }
    all2 = {r["doc_id"] for r in d.where(F.col("doc_id") >= m).select("doc_id").collect()}
    for doc in all2 - kept2:
        partners = {
            next(iter(p - {doc}))
            for p in dup_pairs
            if doc in p and len(p) == 2
        }
        assert partners & (kept1 | kept2 | (all2 - kept2)), (
            f"doc {doc} dropped without any verified near-dup"
        )


def test_deep_kept_bucket_near_dup_still_dropped(spark, tmp_path):
    """r4 regression (ADVICE r3): kept docs sharing a band bucket are
    mutually NON-dup by construction, so the kept side must NOT be capped
    to lowest-id representatives.  A new doc whose only true near-dup
    ranks past the old 64-rep cap in its bucket must still be dropped."""
    from sparkroach.queries.llm_ops import _with_shingles, lsh_bands

    new_doc = spark.createDataFrame(
        [(9999, "a shared footer sentence that appears across mirrored sites")],
        "doc_id long, text string",
    )
    sh = _with_shingles(new_doc).collect()[0]
    band = lsh_bands(_with_shingles(new_doc)).collect()[0]

    n_fill = 100  # > the old LSH_BUCKET_CAP of 64
    kept_sh_rows = [
        (i, [f"filler{i} a", f"a b{i}", f"b{i} c{i}"]) for i in range(n_fill)
    ]
    # the true near-dup: highest id in the bucket, identical shingles
    kept_sh_rows.append((5000, list(sh["shingles"])))
    kept_bands_rows = [
        (i, band["band_idx"], band["band_val"]) for i in range(n_fill)
    ] + [(5000, band["band_idx"], band["band_val"])]

    state = tmp_path / "state"
    spark.createDataFrame(
        kept_sh_rows, "doc_id long, shingles array<string>"
    ).write.parquet(str(state / "shingles"))
    spark.createDataFrame(
        kept_bands_rows, "doc_id long, band_idx int, band_val string"
    ).write.parquet(str(state / "bands"))

    kept = StreamingDeduper(spark, str(state)).process_batch(new_doc).collect()
    assert kept == []  # dropped: its near-dup ranks 101st in the bucket
