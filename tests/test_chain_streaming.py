"""Structured Streaming ingest (A1/A2): file-source block feed →
foreachBatch → round-gated tables, exactly-once across restart."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkroach.chain.ingest import ChainDB
from sparkroach.chain.schemas import block_schema
from tests import chain_fixtures as fx
import pytest


def _write_block_json(spark, path: str, blocks: list[dict]) -> None:
    # One file per append, written in round order: the file source processes
    # oldest-modification-time first, mirroring the ordered conduit feed.
    # (The round gate hard-errors on misordered delivery — the reference's
    # behavior — so the feeder owns ordering.)
    for b in blocks:
        fx.blocks_df(spark, [b]).repartition(1).write.mode("append").format(
            "json"
        ).save(path)


def test_stream_ingest_available_now(spark, tmp_path):
    src = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    db = ChainDB(spark, str(tmp_path / "chain"), n_buckets=4)

    _write_block_json(
        spark, src,
        [fx.make_block(0)]  # AddBlock0: header + special accounts only
        + [fx.make_block(r, payset=[fx.pay_txn(f"T{r}")],
                         accts=[fx.acct_delta(fx.ADDR_A, 100 + r)])
           for r in (1, 2)],
    )
    stream = spark.readStream.schema(block_schema()).json(src)
    q = db.stream_ingest(stream, ckpt, available_now=True)
    q.awaitTermination(120)
    assert db.next_round() == 3
    assert db.store.read("txn").count() == 2
    assert db.store.read("block_header").count() == 3

    # feed two more blocks; a fresh stream from the same checkpoint picks up
    # only the new files and the round gate keeps state exactly-once
    _write_block_json(
        spark, src,
        [fx.make_block(3, payset=[fx.pay_txn("T3")]),
         fx.make_block(4, accts=[fx.acct_delta(fx.ADDR_A, 0)])],
    )
    stream2 = spark.readStream.schema(block_schema()).json(src)
    q2 = db.stream_ingest(stream2, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert db.next_round() == 5
    assert db.store.read("txn").count() == 3
    acct = db.store.read("account").collect()[0]
    assert acct.deleted is True and acct.closed_at == 4
    # header idempotence under replay: still exactly 5 rounds
    assert db.store.read("block_header").count() == 5


@pytest.mark.soak  # property/twin grade (r9 tiering)
def test_stream_full_redelivery_after_checkpoint_loss(spark, tmp_path):
    """The at-least-once envelope, end to end: a multi-batch rate-limited
    stream (maxFilesPerTrigger=1 → one micro-batch per block) ingests 3
    blocks; then the CHECKPOINT IS LOST and a fresh stream redelivers every
    file plus two new ones.  The round gate + store watermark must make the
    replayed rounds no-ops and apply the new ones exactly once — the
    strongest form of the reference's 'txn tables ahead, never behind'
    replay tolerance (cockroach.go:189-199)."""
    import shutil

    src = str(tmp_path / "feed2")
    ckpt = str(tmp_path / "ckpt2")
    db = ChainDB(spark, str(tmp_path / "chain2"), n_buckets=4)

    _write_block_json(
        spark, src,
        [fx.make_block(0)]
        + [fx.make_block(r, payset=[fx.pay_txn(f"T{r}")],
                         accts=[fx.acct_delta(fx.ADDR_A, 100 + r)])
           for r in (1, 2)],
    )
    stream = (
        spark.readStream.schema(block_schema())
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per block
        .json(src)
    )
    q = db.stream_ingest(stream, ckpt, available_now=True)
    q.awaitTermination(120)
    assert db.next_round() == 3
    assert db.store.read("txn").count() == 2

    # checkpoint loss: the new stream redelivers ALL files from scratch
    shutil.rmtree(ckpt)
    _write_block_json(
        spark, src,
        [fx.make_block(3, payset=[fx.pay_txn("T3")]),
         fx.make_block(4, payset=[fx.pay_txn("T4")])],
    )
    stream2 = (
        spark.readStream.schema(block_schema())
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q2 = db.stream_ingest(stream2, str(tmp_path / "ckpt3"), available_now=True)
    q2.awaitTermination(180)
    assert db.next_round() == 5
    txn = db.store.read("txn").collect()
    assert len(txn) == 4  # T1..T4, zero duplicates from the replay
    assert len({(r.round, r.intra) for r in txn}) == 4
    assert db.store.read("block_header").count() == 5
