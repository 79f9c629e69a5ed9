"""Chain-engine integration tests — the PySpark analogs of the reference's
writer_test.go scenarios (SURVEY §5 level 2), keyed to FIXTURES.md §B."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sparkroach.chain.ingest import ChainDB, RoundGateError
from tests import chain_fixtures as fx


@pytest.fixture()
def db(spark, tmp_path):
    return ChainDB(spark, str(tmp_path / "chain"), n_buckets=4)


def _ingest(db, spark, blocks):
    return db.add_blocks(fx.blocks_df(spark, blocks))


# -- txn flatten: preorder intra, inner txid/extra (writer_test.go:1386-1449) --


def test_inner_txn_flatten_preorder(db, spark):
    # root0(pay), root1(appl with 2 inners, second inner has 1 nested inner)
    nested = fx.pay_txn(None, snd=fx.ADDR_C, rcv=fx.ADDR_D, amt=7, sig=None)
    inner1 = fx.pay_txn(None, snd=fx.ADDR_B, rcv=fx.ADDR_C, amt=5, sig=None)
    inner2 = {**fx.appl_txn(None, apid=99, snd=fx.ADDR_B, lsig=False),
              "ad": {"dt": {"itx": [nested]}}}
    root0 = fx.pay_txn("TXID0")
    root1 = fx.appl_txn("TXID1", apid=42, inners=[inner1, inner2])
    _ingest(db, spark, [fx.make_block(0, payset=[root0, root1])])

    rows = (
        db.store.read("txn")
        .orderBy("intra")
        .select("round", "intra", "typeenum", "asset", "txid", "extra")
        .collect()
    )
    assert [(r.intra, r.typeenum) for r in rows] == [
        (0, 1),  # root0 pay
        (1, 6),  # root1 appl
        (2, 1),  # inner1 pay
        (3, 6),  # inner2 appl
        (4, 1),  # nested pay
    ]
    assert rows[0].txid == "TXID0" and rows[1].txid == "TXID1"
    for r in rows[2:]:
        assert r.txid is None
        extra = json.loads(r.extra)
        assert extra == {"root-intra": 1, "root-txid": "TXID1"}
    assert rows[1].asset == 42 and rows[3].asset == 99


def test_inner_txns_pruned_from_stored_json(db, spark):
    nested = fx.pay_txn(None, snd=fx.ADDR_C, rcv=fx.ADDR_D, amt=7, sig=None)
    inner = {**fx.appl_txn(None, apid=9, snd=fx.ADDR_B),
             "ad": {"dt": {"itx": [nested]}}}
    root = fx.appl_txn("R", apid=1, inners=[inner])
    _ingest(db, spark, [fx.make_block(0, payset=[root])])
    rows = db.store.read("txn").orderBy("intra").collect()
    assert '"itx"' in rows[0].txn  # root keeps the tree
    assert '"itx"' not in rows[1].txn  # inner stored without its own inners
    assert '"itx"' not in rows[2].txn


def test_creatable_id_from_counter(db, spark):
    # acfg with no caid anywhere → TxnCounter - len(payset) + intra + 1
    # (write_txn.go:25-63; asserted writer_test.go:1446-1449)
    acfg = {
        "txid": "CFG",
        "txn": {"type": "acfg", "snd": fx.ADDR_A, "fee": 1000},
        "sig": b"\x11" * 64,
    }
    _ingest(db, spark, [fx.make_block(0, payset=[acfg], txn_counter=1000)])
    row = db.store.read("txn").collect()[0]
    assert row.asset == 1000 - 1 + 0 + 1


# -- participation (writer_test.go:318-427, 1451-1522) ------------------------


def test_participation_roles_and_dedup(db, spark):
    # pay with close-to; axfer clawback; appl with accounts; dup addresses
    pay = fx.pay_txn("T0", snd=fx.ADDR_A, rcv=fx.ADDR_B, close=fx.ADDR_C)
    axfer = fx.axfer_txn("T1", xaid=5, aamt=10, snd=fx.ADDR_B, arcv=fx.ADDR_B,
                         asnd=fx.ADDR_D)
    appl = fx.appl_txn("T2", apid=7, snd=fx.ADDR_A, apat=[fx.ADDR_A, fx.ADDR_D])
    _ingest(db, spark, [fx.make_block(0, payset=[pay, axfer, appl])])
    got = {
        (bytes(r.addr), r.round, r.intra)
        for r in db.store.read("txn_participation").collect()
    }
    assert got == {
        (fx.ADDR_A, 0, 0), (fx.ADDR_B, 0, 0), (fx.ADDR_C, 0, 0),
        (fx.ADDR_B, 0, 1), (fx.ADDR_D, 0, 1),
        (fx.ADDR_A, 0, 2), (fx.ADDR_D, 0, 2),
    }


# -- account lifecycle (writer_test.go:430-691) -------------------------------


def test_account_create_then_delete(db, spark):
    _ingest(db, spark, [fx.make_block(0, accts=[fx.acct_delta(fx.ADDR_A, 5000)])])
    _ingest(db, spark, [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    row = db.store.read("account").collect()[0]
    assert row.deleted is True
    assert int(row.microalgos) == 0
    assert row.created_at == 0
    assert row.closed_at == 1
    assert row.account_data == "null"


def test_account_create_delete_same_round(db, spark):
    _ingest(
        db, spark,
        [fx.make_block(0, accts=[fx.acct_delta(fx.ADDR_A, 777),
                                 fx.acct_delta(fx.ADDR_A, 0)])],
    )
    row = db.store.read("account").collect()[0]
    assert row.deleted is True and row.created_at == 0 and row.closed_at == 0


def test_delete_preserves_keytype(db, spark):
    # round 0: pay txn from A (sig) establishes keytype
    _ingest(
        db, spark,
        [fx.make_block(0, payset=[fx.pay_txn("T0", snd=fx.ADDR_A)],
                       accts=[fx.acct_delta(fx.ADDR_A, 100)])],
    )
    assert db.store.read("account").collect()[0].keytype == "sig"
    # round 1: account closed with no new signature
    _ingest(db, spark, [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    row = db.store.read("account").collect()[0]
    assert row.deleted is True and row.keytype == "sig"


def test_account_reopen_preserves_created_at(db, spark):
    _ingest(db, spark, [fx.make_block(0, accts=[fx.acct_delta(fx.ADDR_A, 10)])])
    _ingest(db, spark, [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    _ingest(db, spark, [fx.make_block(2, accts=[fx.acct_delta(fx.ADDR_A, 99)])])
    row = db.store.read("account").collect()[0]
    assert row.deleted is False
    assert int(row.microalgos) == 99
    assert row.created_at == 0  # preserved across delete + reopen
    assert row.closed_at == 1  # upsert does not clear closed_at


# -- asset / holding lifecycle incl. uint64 max (writer_test.go:693-1032) -----


def test_asset_and_holding_lifecycle_uint64(db, spark):
    from decimal import Decimal

    max_u64 = 2**64 - 1
    params = {"total": Decimal(max_u64), "decimals": 0, "unit_name": b"COIN",
              "asset_name": b"MyCoin", "manager": fx.ADDR_A}
    _ingest(
        db, spark,
        [fx.make_block(0, asset_resources=[
            fx.asset_resource(5, fx.ADDR_A, params=params,
                              holding={"amount": Decimal(max_u64),
                                       "frozen": False}),
        ])],
    )
    arow = db.store.read("asset").collect()[0]
    assert arow.id == 5 and arow.deleted is False and arow.created_at == 0
    assert '"total":18446744073709551615' in arow.params
    hrow = db.store.read("account_asset").collect()[0]
    assert int(hrow.amount) == max_u64  # decimal(20,0) end-to-end

    _ingest(
        db, spark,
        [fx.make_block(1, asset_resources=[
            fx.asset_resource(5, fx.ADDR_A, params_deleted=True,
                              holding_deleted=True),
        ])],
    )
    arow = db.store.read("asset").collect()[0]
    assert arow.deleted is True and arow.params == "null" and arow.closed_at == 1
    hrow = db.store.read("account_asset").collect()[0]
    assert hrow.deleted is True and int(hrow.amount) == 0 and hrow.closed_at == 1


# -- app / local state (writer_test.go:1033-1350) -----------------------------


def test_app_and_localstate_lifecycle(db, spark):
    _ingest(
        db, spark,
        [fx.make_block(0, app_resources=[
            fx.app_resource(9, fx.ADDR_A,
                            params={"approv": b"\x01", "clearp": b"\x02"},
                            local_state={"schema": {"num_uint": 1,
                                                    "num_byte_slice": 2}}),
        ])],
    )
    assert db.store.read("app").collect()[0].deleted is False
    assert db.store.read("account_app").collect()[0].deleted is False
    _ingest(
        db, spark,
        [fx.make_block(1, app_resources=[
            fx.app_resource(9, fx.ADDR_A, params_deleted=True,
                            state_deleted=True),
        ])],
    )
    a = db.store.read("app").collect()[0]
    s = db.store.read("account_app").collect()[0]
    assert a.deleted is True and a.params == "null" and a.closed_at == 1
    assert s.deleted is True and s.localstate == "null"


# -- boxes (writer_test.go:1684-1857) -----------------------------------------


def test_box_lifecycle(db, spark):
    k = fx.box_key(12, b"box-name")
    _ingest(db, spark, [fx.make_block(0, kv_mods=[(k, b"v1")])])
    row = db.store.read("app_box").collect()[0]
    assert row.app == 12 and bytes(row.name) == b"box-name" and bytes(row.value) == b"v1"
    _ingest(db, spark, [fx.make_block(1, kv_mods=[(k, b"v2")])])  # mutate
    assert bytes(db.store.read("app_box").collect()[0].value) == b"v2"
    _ingest(db, spark, [fx.make_block(2, kv_mods=[(k, None)])])  # delete
    assert db.store.read("app_box").count() == 0
    _ingest(db, spark, [fx.make_block(3, kv_mods=[(k, b"v3")])])  # re-insert
    assert bytes(db.store.read("app_box").collect()[0].value) == b"v3"


# -- round gate / idempotence (cockroach.go:138-151) --------------------------


def test_round_gate_uninitialized_requires_round_zero(db, spark):
    # fresh DB expects round 0 (LoadGenesis → next_account_round=0);
    # a misordered feed fails loudly instead of losing blocks
    with pytest.raises(RoundGateError):
        _ingest(db, spark, [fx.make_block(1)])


def test_round_gate(db, spark):
    assert _ingest(db, spark, [fx.make_block(0)]) == 1
    assert _ingest(db, spark, [fx.make_block(1)]) == 1
    # replay of an old round is a no-op
    assert _ingest(db, spark, [fx.make_block(1)]) == 0
    assert db.store.read("block_header").count() == 2
    # gap is a hard error
    with pytest.raises(RoundGateError):
        _ingest(db, spark, [fx.make_block(5)])
    assert db.next_round() == 2


def test_block_header_contents(db, spark):
    _ingest(db, spark, [fx.make_block(0, timestamp=1_700_000_000)])
    row = db.store.read("block_header").collect()[0]
    assert row.round == 0
    assert row.realtime.isoformat().startswith("2023-11-14")
    hdr = json.loads(row.header)
    assert hdr["gen"] == "test-v1" and "ts" in hdr


# -- genesis + health + prune (A20-A25) ---------------------------------------


def test_genesis_health_prune(db, spark):
    db.load_genesis(
        [{"addr": fx.ADDR_A, "microalgos": 10**6},
         {"addr": fx.ADDR_B, "microalgos": 5}],
        genesis_hash=fx.GENESIS_HASH,
    )
    assert db.next_round() == 0
    accounts = db.store.read("account").collect()
    assert len(accounts) == 2
    # idempotent re-load with same hash; mismatch raises
    db.load_genesis([], genesis_hash=fx.GENESIS_HASH)
    from sparkroach.chain.ingest import GenesisHashMismatch
    with pytest.raises(GenesisHashMismatch):
        db.check_genesis_hash(b"\x00" * 32)

    for r in range(3):
        _ingest(db, spark, [fx.make_block(r, payset=[fx.pay_txn(f"T{r}")])])
    assert db.health()["round"] == 2
    deleted = db.delete_transactions(keep=2)
    assert deleted == 2
    assert db.store.read("txn").count() == 1
    assert json.loads(db.store.get_metastate("pruned"))["last_pruned_round"] == 2


def test_metastate_special_accounts(db, spark):
    _ingest(db, spark, [fx.make_block(0)])
    v = json.loads(db.store.get_metastate("accounts"))
    assert set(v) == {"FeeSink", "RewardsPool"}


def test_flatten_depth1_shortcut_matches_full_plan(db, spark):
    """For inner-free paysets the depth-1 fast path (no windows, no
    shuffle) must produce byte-identical rows to the general plan."""
    from sparkroach.chain import transforms

    payset = [fx.pay_txn(f"TX{i}") for i in range(5)]
    blocks = fx.blocks_df(spark, [fx.make_block(0, payset=payset),
                                  fx.make_block(1, payset=list(reversed(payset)))])
    cols = ["round", "intra", "root_intra", "is_root", "input_txid", "txtype"]
    fast = transforms.flatten_txns(blocks, depth=1).select(cols)
    full = transforms.flatten_txns(blocks).select(cols)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, full.collect()))
    # and the fast path really is shuffle-free
    assert "Exchange" not in fast._jdf.queryExecution().executedPlan().toString()
