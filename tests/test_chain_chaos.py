"""Exactly-once chaos tests (round-4, verdict #8): crash the ingest AFTER
table writes but BEFORE the metastate commit (and, harder, in the middle
of the per-table fan-out), restart, re-deliver — and prove the reference
invariant that fact tables "can only be ahead, never behind" the round
high-water mark heals idempotently to the exact no-crash state
(cockroach.go:189-199; the MERGE idempotence that makes this true is the
Spark analog of the reference's ON CONFLICT clauses, writer.go:39-114).
"""

from __future__ import annotations

import pytest

from sparkroach.chain.ingest import ChainDB
from sparkroach.chain.schemas import TABLE_SCHEMAS
from tests import chain_fixtures as fx

# soak tier: excluded from the default driver-window run (pytest.ini)
pytestmark = pytest.mark.soak


def _batch_a() -> list[dict]:
    return [
        fx.make_block(0),
        fx.make_block(
            1,
            payset=[fx.pay_txn("T1")],
            accts=[
                fx.acct_delta(fx.ADDR_A, 10**9),
                fx.acct_delta(fx.ADDR_B, 500),
            ],
        ),
    ]


def _batch_b() -> list[dict]:
    # the crash batch touches facts (header/txn/participation), the account
    # plane AND the box plane, so partial application leaves several tables
    # genuinely ahead of the uncommitted round mark
    return [
        fx.make_block(
            2,
            payset=[fx.pay_txn("T2", amt=9)],
            accts=[fx.acct_delta(fx.ADDR_A, 10**9 - 9)],
            kv_mods=[(fx.box_key(7, b"k"), b"v1")],
        ),
        fx.make_block(
            3,
            payset=[fx.pay_txn("T3", amt=2)],
            accts=[fx.acct_delta(fx.ADDR_B, 502)],
            kv_mods=[(fx.box_key(7, b"k"), b"v2")],
        ),
    ]


def _content(db: ChainDB) -> dict:
    out = {}
    for t in TABLE_SCHEMAS:
        if t == "metastate":
            continue
        out[t] = sorted(
            (tuple(r) for r in db.store.read(t).collect()), key=str
        )
    out["__state__"] = db.store.get_metastate("state")
    out["__accounts__"] = db.store.get_metastate("accounts")
    return out


@pytest.fixture()
def control(spark, tmp_path):
    db = ChainDB(spark, str(tmp_path / "control"), n_buckets=4)
    db.add_blocks(fx.blocks_df(spark, _batch_a()))
    db.add_blocks(fx.blocks_df(spark, _batch_b()))
    return db


def test_crash_before_metastate_commit_heals(spark, tmp_path, control):
    """Kill between the table fan-out and the commit point: every table is
    ahead, the round mark is behind, and replaying the batch converges to
    the no-crash content."""
    db = ChainDB(spark, str(tmp_path / "chaos1"), n_buckets=4)
    db.add_blocks(fx.blocks_df(spark, _batch_a()))

    orig = db.store.merge_metastate

    def boom(updates):  # the commit point (ingest.py add_blocks tail)
        raise RuntimeError("injected crash before metastate commit")

    db.store.merge_metastate = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        db.add_blocks(fx.blocks_df(spark, _batch_b()))
    db.store.merge_metastate = orig

    # invariant mid-crash: facts AHEAD (rounds 2,3 present), mark BEHIND
    assert db.next_round() == 2
    got_rounds = {
        r["round"] for r in db.store.read("txn").select("round").collect()
    }
    assert {2, 3} <= got_rounds

    # restart/re-delivery (foreachBatch redelivers the whole batch)
    assert db.add_blocks(fx.blocks_df(spark, _batch_b())) == 2
    assert db.next_round() == 4
    assert _content(db) == _content(control)


def test_crash_mid_fanout_heals(spark, tmp_path, control):
    """Harder: one of the concurrent per-table jobs dies, so SOME tables
    applied the batch and some did not — replay must fill the holes without
    double-applying the survivors (created_at/closed_at preserved by the
    MERGE lineage clauses)."""
    db = ChainDB(spark, str(tmp_path / "chaos2"), n_buckets=4)
    db.add_blocks(fx.blocks_df(spark, _batch_a()))

    orig = db.store.append_facts
    state = {"armed": True}

    def flaky(table, rows):
        if state["armed"] and table == "txn_participation":
            state["armed"] = False
            raise RuntimeError("injected crash mid-fanout")
        return orig(table, rows)

    db.store.append_facts = flaky
    with pytest.raises(RuntimeError, match="injected crash"):
        db.add_blocks(fx.blocks_df(spark, _batch_b()))
    db.store.append_facts = orig

    assert db.next_round() == 2  # commit never ran
    assert db.add_blocks(fx.blocks_df(spark, _batch_b())) == 2
    assert db.next_round() == 4
    assert _content(db) == _content(control)
