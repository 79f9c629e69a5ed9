"""Custom Python data source (`conduit_blocks`): the conduit
file-importer contract — round-ordered, gap-aware, exactly-once — that
the generic mtime-ordered file source cannot give (SURVEY §2A A1/A2;
conduit.yml:27-68 importer stage)."""

from __future__ import annotations

import time

import pytest

from sparkroach.chain.ingest import ChainDB
from sparkroach.sources import blocks_from_dir, write_block_file
from tests import chain_fixtures as fx


def _feed(spark, path: str, blocks: list[dict]) -> None:
    for b in blocks:
        write_block_file(spark, path, fx.blocks_df(spark, [b]))


def _wait_until(pred, timeout=120.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.5)
    return False


def test_batch_face_reads_all_rounds_typed(spark, tmp_path):
    src = str(tmp_path / "feed")
    _feed(spark, src, [fx.make_block(0),
                       fx.make_block(1, payset=[fx.pay_txn("T1")]),
                       fx.make_block(2, payset=[fx.pay_txn("T2")])])
    df = blocks_from_dir(spark, src, streaming=False)
    rows = df.select("round", "txn_counter").orderBy("round").collect()
    assert [r["round"] for r in rows] == [0, 1, 2]
    # typed all the way down: payset/txn structs survive the envelope
    payset = df.filter("round = 1").select("payset").collect()[0][0]
    assert payset is not None and len(payset) == 1
    # binary columns round-trip through the JSON envelope (base64 both ways)
    gh = df.filter("round = 0").select("genesis_hash").collect()[0][0]
    assert isinstance(gh, (bytes, bytearray)) and len(gh) == 32


@pytest.mark.soak
def test_gap_aware_round_order_delivery(spark, tmp_path):
    """Round 2's file lands BEFORE round 1's (late-arriving middle round).
    The mtime-ordered generic file source would deliver 2 first and the
    ordered-round gate would hard-error; conduit_blocks holds round 2
    until the gap fills, so ingest proceeds in round order."""
    src = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    db = ChainDB(spark, str(tmp_path / "chain"), n_buckets=4)

    _feed(spark, src, [fx.make_block(0)])
    _feed(spark, src, [fx.make_block(2, payset=[fx.pay_txn("T2")])])  # gap at 1

    stream = blocks_from_dir(spark, src, streaming=True)
    q = db.stream_ingest(stream, ckpt, available_now=False)
    try:
        assert _wait_until(lambda: db.next_round() == 1)
        time.sleep(2)  # extra micro-batches must NOT deliver round 2
        assert db.next_round() == 1

        _feed(spark, src, [fx.make_block(1, payset=[fx.pay_txn("T1")])])
        assert _wait_until(lambda: db.next_round() == 3)
    finally:
        q.stop()
    assert db.store.read("txn").count() == 2
    assert db.store.read("block_header").count() == 3


@pytest.mark.soak
def test_exporter_roundtrip_two_phase_commit(spark, tmp_path):
    """importer → exporter loop: blocks stream in via conduit_blocks and
    out via the conduit_block_files two-phase-commit sink; the exported
    dir must reproduce the feed (binary fields included), a checkpoint
    restart must export ONLY the new round, and no temp debris may leak
    into the visible namespace."""
    import os

    from sparkroach.sources import blocks_to_dir

    a = str(tmp_path / "a")
    bdir = str(tmp_path / "b")
    ck = str(tmp_path / "ck")
    _feed(spark, a, [fx.make_block(0),
                     fx.make_block(1, payset=[fx.pay_txn("T1")])])

    def export_once(expect: set[str]) -> None:
        q = blocks_to_dir(
            blocks_from_dir(spark, a, streaming=True), bdir, ck,
            available_now=False,
        )
        def ready() -> bool:
            if not os.path.isdir(bdir):
                return False
            return {f for f in os.listdir(bdir) if f.endswith(".json")} == expect

        try:
            assert _wait_until(ready), str(q.exception())
        finally:
            q.stop()

    export_once({"block_0.json", "block_1.json"})
    content0 = open(os.path.join(bdir, "block_0.json")).read()

    # restart on the same checkpoint: the new round is exported, and if
    # the engine replays the last batch (we stop the query as soon as
    # the files appear, which can precede the checkpoint commit) the
    # idempotent re-rename must reproduce byte-identical content — the
    # at-least-once→exactly-once contract is idempotence, not no-replay
    _feed(spark, a, [fx.make_block(2, payset=[fx.pay_txn("T2")])])
    export_once({"block_0.json", "block_1.json", "block_2.json"})
    assert open(os.path.join(bdir, "block_0.json")).read() == content0

    # the exported feed is itself a valid conduit_blocks feed with full
    # fidelity: typed fields (binary included) survive the round trip
    src = blocks_from_dir(spark, a, streaming=False)
    dst = blocks_from_dir(spark, bdir, streaming=False)
    pick = ["round", "timestamp", "genesis_hash", "txn_counter"]
    assert (
        [r.asDict() for r in dst.select(*pick).orderBy("round").collect()]
        == [r.asDict() for r in src.select(*pick).orderBy("round").collect()]
    )
    assert dst.selectExpr("sum(size(payset))").collect()[0][0] == \
        src.selectExpr("sum(size(payset))").collect()[0][0]
    # two-phase commit leaves no uncommitted temp files behind
    assert os.listdir(os.path.join(bdir, "_tmp")) == []


@pytest.mark.soak
def test_restart_exactly_once_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    db = ChainDB(spark, str(tmp_path / "chain"), n_buckets=4)

    _feed(spark, src, [fx.make_block(0),
                       fx.make_block(1, payset=[fx.pay_txn("T1")],
                                     accts=[fx.acct_delta(fx.ADDR_A, 101)])])
    stream = blocks_from_dir(spark, src, streaming=True)
    q = db.stream_ingest(stream, ckpt, available_now=False)
    try:
        assert _wait_until(lambda: db.next_round() == 2)
    finally:
        q.stop()

    # restart on the same checkpoint; only the new rounds are delivered,
    # and the already-ingested ones are not replayed out of band
    _feed(spark, src, [fx.make_block(2, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    stream2 = blocks_from_dir(spark, src, streaming=True)
    q2 = db.stream_ingest(stream2, ckpt, available_now=False)
    try:
        assert _wait_until(lambda: db.next_round() == 3)
    finally:
        q2.stop()

    assert db.store.read("txn").count() == 1
    assert db.store.read("block_header").count() == 3
    acct = db.store.read("account").collect()[0]
    assert acct.deleted is True and acct.closed_at == 2
