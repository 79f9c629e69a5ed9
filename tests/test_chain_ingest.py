"""Chain-engine integration tests — the PySpark analogs of the reference's
writer_test.go scenarios (SURVEY §5 level 2), keyed to FIXTURES.md §B."""

from __future__ import annotations

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sparkroach.chain.ingest import ChainDB, RoundGateError
from tests import chain_fixtures as fx


@pytest.fixture()
def db(spark, tmp_path):
    return ChainDB(spark, str(tmp_path / "chain"), n_buckets=4)


def _ingest(db, spark, blocks):
    return db.add_blocks(fx.blocks_df(spark, blocks))


def _init0(db, spark):
    """Ingest a bare round-0 block.  AddBlock routes round 0 to AddBlock0
    (cockroach.go:159-165), which writes only the header + special
    accounts — so payload-bearing fixtures start at round 1, like the
    reference's writer tests do."""
    return db.add_blocks(fx.blocks_df(spark, [fx.make_block(0)]))


# -- txn flatten: preorder intra, inner txid/extra (writer_test.go:1386-1449) --


def test_inner_txn_flatten_preorder(db, spark):
    # root0(pay), root1(appl with 2 inners, second inner has 1 nested inner)
    nested = fx.pay_txn(None, snd=fx.ADDR_C, rcv=fx.ADDR_D, amt=7, sig=None)
    inner1 = fx.pay_txn(None, snd=fx.ADDR_B, rcv=fx.ADDR_C, amt=5, sig=None)
    inner2 = {**fx.appl_txn(None, apid=99, snd=fx.ADDR_B, lsig=False),
              "ad": {"dt": {"itx": [nested]}}}
    root0 = fx.pay_txn("TXID0")
    root1 = fx.appl_txn("TXID1", apid=42, inners=[inner1, inner2])
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, payset=[root0, root1])])

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
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, payset=[root])])
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
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, payset=[acfg], txn_counter=1000)])
    row = db.store.read("txn").collect()[0]
    assert row.asset == 1000 - 1 + 0 + 1


# -- participation (writer_test.go:318-427, 1451-1522) ------------------------


def test_participation_roles_and_dedup(db, spark):
    # pay with close-to; axfer clawback; appl with accounts; dup addresses
    pay = fx.pay_txn("T0", snd=fx.ADDR_A, rcv=fx.ADDR_B, close=fx.ADDR_C)
    axfer = fx.axfer_txn("T1", xaid=5, aamt=10, snd=fx.ADDR_B, arcv=fx.ADDR_B,
                         asnd=fx.ADDR_D)
    appl = fx.appl_txn("T2", apid=7, snd=fx.ADDR_A, apat=[fx.ADDR_A, fx.ADDR_D])
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, payset=[pay, axfer, appl])])
    got = {
        (bytes(r.addr), r.round, r.intra)
        for r in db.store.read("txn_participation").collect()
    }
    assert got == {
        (fx.ADDR_A, 1, 0), (fx.ADDR_B, 1, 0), (fx.ADDR_C, 1, 0),
        (fx.ADDR_B, 1, 1), (fx.ADDR_D, 1, 1),
        (fx.ADDR_A, 1, 2), (fx.ADDR_D, 1, 2),
    }


# -- account lifecycle (writer_test.go:430-691) -------------------------------


def test_account_create_then_delete(db, spark):
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 5000)])])
    _ingest(db, spark, [fx.make_block(2, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    row = db.store.read("account").collect()[0]
    assert row.deleted is True
    assert int(row.microalgos) == 0
    assert row.created_at == 1
    assert row.closed_at == 2
    assert row.account_data == "null"


def test_account_create_delete_same_round(db, spark):
    _init0(db, spark)
    _ingest(
        db, spark,
        [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 777),
                                 fx.acct_delta(fx.ADDR_A, 0)])],
    )
    row = db.store.read("account").collect()[0]
    assert row.deleted is True and row.created_at == 1 and row.closed_at == 1


def test_delete_preserves_keytype(db, spark):
    _init0(db, spark)
    # round 1: pay txn from A (sig) establishes keytype
    _ingest(
        db, spark,
        [fx.make_block(1, payset=[fx.pay_txn("T0", snd=fx.ADDR_A)],
                       accts=[fx.acct_delta(fx.ADDR_A, 100)])],
    )
    assert db.store.read("account").collect()[0].keytype == "sig"
    # round 2: account closed with no new signature
    _ingest(db, spark, [fx.make_block(2, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    row = db.store.read("account").collect()[0]
    assert row.deleted is True and row.keytype == "sig"


def test_account_reopen_preserves_created_at(db, spark):
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 10)])])
    _ingest(db, spark, [fx.make_block(2, accts=[fx.acct_delta(fx.ADDR_A, 0)])])
    _ingest(db, spark, [fx.make_block(3, accts=[fx.acct_delta(fx.ADDR_A, 99)])])
    row = db.store.read("account").collect()[0]
    assert row.deleted is False
    assert int(row.microalgos) == 99
    assert row.created_at == 1  # preserved across delete + reopen
    assert row.closed_at == 2  # upsert does not clear closed_at


# -- asset / holding lifecycle incl. uint64 max (writer_test.go:693-1032) -----


def test_asset_and_holding_lifecycle_uint64(db, spark):
    from decimal import Decimal

    max_u64 = 2**64 - 1
    params = {"total": Decimal(max_u64), "decimals": 0, "unit_name": b"COIN",
              "asset_name": b"MyCoin", "manager": fx.ADDR_A}
    _init0(db, spark)
    _ingest(
        db, spark,
        [fx.make_block(1, asset_resources=[
            fx.asset_resource(5, fx.ADDR_A, params=params,
                              holding={"amount": Decimal(max_u64),
                                       "frozen": False}),
        ])],
    )
    arow = db.store.read("asset").collect()[0]
    assert arow.id == 5 and arow.deleted is False and arow.created_at == 1
    assert '"total":18446744073709551615' in arow.params
    hrow = db.store.read("account_asset").collect()[0]
    assert int(hrow.amount) == max_u64  # decimal(20,0) end-to-end

    _ingest(
        db, spark,
        [fx.make_block(2, asset_resources=[
            fx.asset_resource(5, fx.ADDR_A, params_deleted=True,
                              holding_deleted=True),
        ])],
    )
    arow = db.store.read("asset").collect()[0]
    assert arow.deleted is True and arow.params == "null" and arow.closed_at == 2
    hrow = db.store.read("account_asset").collect()[0]
    assert hrow.deleted is True and int(hrow.amount) == 0 and hrow.closed_at == 2


# -- app / local state (writer_test.go:1033-1350) -----------------------------


def test_app_and_localstate_lifecycle(db, spark):
    _init0(db, spark)
    _ingest(
        db, spark,
        [fx.make_block(1, app_resources=[
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
        [fx.make_block(2, app_resources=[
            fx.app_resource(9, fx.ADDR_A, params_deleted=True,
                            state_deleted=True),
        ])],
    )
    a = db.store.read("app").collect()[0]
    s = db.store.read("account_app").collect()[0]
    assert a.deleted is True and a.params == "null" and a.closed_at == 2
    assert s.deleted is True and s.localstate == "null"


# -- boxes (writer_test.go:1684-1857) -----------------------------------------


def test_box_lifecycle(db, spark):
    k = fx.box_key(12, b"box-name")
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, kv_mods=[(k, b"v1")])])
    row = db.store.read("app_box").collect()[0]
    assert row.app == 12 and bytes(row.name) == b"box-name" and bytes(row.value) == b"v1"
    _ingest(db, spark, [fx.make_block(2, kv_mods=[(k, b"v2")])])  # mutate
    assert bytes(db.store.read("app_box").collect()[0].value) == b"v2"
    _ingest(db, spark, [fx.make_block(3, kv_mods=[(k, None)])])  # delete
    assert db.store.read("app_box").count() == 0
    _ingest(db, spark, [fx.make_block(4, kv_mods=[(k, b"v3")])])  # re-insert
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

    # migration sentinel written by LoadGenesis (cockroach.go:227-232):
    # "no migration needed" → health reports available, not migrating
    from sparkroach.chain.ingest import MIGRATION_DONE_SENTINEL
    assert db.migration_state() == {"next": MIGRATION_DONE_SENTINEL}
    assert db.get_network_state()["genesis-hash"] is not None

    for r in range(3):
        _ingest(db, spark, [fx.make_block(r, payset=[fx.pay_txn(f"T{r}")])])
    h = db.health()
    assert h["round"] == 2
    assert h["is-migrating"] is False and h["db-available"] is True
    assert h["data"]["migration-required"] is False
    # round 0 wrote only header + special accounts (AddBlock0), so the txn
    # table holds T1, T2
    assert db.store.read("txn").count() == 2
    deleted = db.delete_transactions(keep=2)
    assert deleted == 1
    assert db.store.read("txn").count() == 1
    pruned = json.loads(db.store.get_metastate("pruned"))
    # DeleteStatus shape (types.go:32-36): last_pruned timestamp text +
    # oldest_txn_round
    assert pruned["oldest_txn_round"] == 2
    assert "last_pruned" in pruned


def test_keytype_cleared_by_rekey_last_wins(db, spark):
    """getSigTypeDeltas (writer.go:155-179): a rekeyed sender's delta sets
    keytype to NULL, and the sender's LAST root txn wins — sig-then-rekey
    in one batch clears, rekey-then-sig re-establishes."""
    _init0(db, spark)
    # sig txn then rekey txn from the same sender in ONE block → cleared
    _ingest(
        db, spark,
        [fx.make_block(1,
                       payset=[fx.pay_txn("S0", snd=fx.ADDR_A),
                               fx.pay_txn("S1", snd=fx.ADDR_A,
                                          rekey=fx.ADDR_B)],
                       accts=[fx.acct_delta(fx.ADDR_A, 100)])],
    )
    assert db.store.read("account").collect()[0].keytype is None
    # rekey then sig → last wins re-establishes 'sig'
    _ingest(
        db, spark,
        [fx.make_block(2,
                       payset=[fx.pay_txn("S2", snd=fx.ADDR_A,
                                          rekey=fx.ADDR_B),
                               fx.pay_txn("S3", snd=fx.ADDR_A)],
                       accts=[fx.acct_delta(fx.ADDR_A, 101)])],
    )
    assert db.store.read("account").collect()[0].keytype == "sig"
    # stateproof txn also clears (writer.go:166 Type != StateProofTx)
    stpf = {"txid": "SP", "txn": {"type": "stpf", "snd": fx.ADDR_A},
            "sig": b"\x11" * 64}
    _ingest(
        db, spark,
        [fx.make_block(3, payset=[stpf],
                       accts=[fx.acct_delta(fx.ADDR_A, 102)])],
    )
    assert db.store.read("account").collect()[0].keytype is None


def test_sigtype_delta_without_account_delta_writes_nothing(db, spark):
    """writeAccountDeltas applies sig-type deltas only to accounts present
    in delta.Accts (writer.go:181-225 iterates the account deltas, not the
    sigtype map) — a sender with a txn but no balance change must not
    materialize an account row."""
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, payset=[fx.pay_txn("T0")])])
    assert db.store.read("account").count() == 0


def test_holding_delete_preserves_frozen(db, spark):
    """deleteAccountAsset updates only amount/deleted/closed_at on conflict
    (writer.go:95-98): an existing row's frozen survives the delete; FALSE
    applies only to newly-inserted tombstones."""
    from decimal import Decimal

    _init0(db, spark)
    _ingest(
        db, spark,
        [fx.make_block(1, asset_resources=[
            fx.asset_resource(7, fx.ADDR_A,
                              holding={"amount": Decimal(10), "frozen": True}),
        ])],
    )
    _ingest(
        db, spark,
        [fx.make_block(2, asset_resources=[
            fx.asset_resource(7, fx.ADDR_A, holding_deleted=True),
        ])],
    )
    row = db.store.read("account_asset").collect()[0]
    assert row.deleted is True and row.frozen is True  # preserved
    # delete of a row that never existed → tombstone inserts frozen=FALSE
    _ingest(
        db, spark,
        [fx.make_block(3, asset_resources=[
            fx.asset_resource(8, fx.ADDR_B, holding_deleted=True),
        ])],
    )
    fresh = [r for r in db.store.read("account_asset").collect()
             if r.assetid == 8][0]
    assert fresh.deleted is True and fresh.frozen is False


def test_root_txn_extra_carries_asset_close_amount(db, spark):
    """Root rows store TxnExtra for every txn (write_txn.go:136-142): the
    asset-close-amount under 'aca' (omit-empty → '{}' when zero); inner
    rows keep {root-intra, root-txid}."""
    from decimal import Decimal

    _init0(db, spark)
    ax = fx.axfer_txn("AX", xaid=5, aamt=100, snd=fx.ADDR_A, aclose=fx.ADDR_C)
    ax["ad"] = {"aca": Decimal(250)}
    plain = fx.pay_txn("P0")
    _ingest(db, spark, [fx.make_block(1, payset=[ax, plain])])
    rows = {r.txid: r for r in db.store.read("txn").collect()}
    assert json.loads(rows["AX"].extra) == {"aca": 250}
    assert rows["P0"].extra == "{}"


def test_round0_block_payload_is_skipped(db, spark):
    """AddBlock0 (cockroach.go:159-165): a round-0 block carrying a payset
    or delta writes ONLY the header + special accounts — genesis
    allocations arrive via LoadGenesis, never via block 0."""
    _ingest(
        db, spark,
        [fx.make_block(0, payset=[fx.pay_txn("T0")],
                       accts=[fx.acct_delta(fx.ADDR_A, 123)])],
    )
    assert db.store.read("block_header").count() == 1
    assert db.store.read("txn").count() == 0
    assert db.store.read("txn_participation").count() == 0
    assert db.store.read("account").count() == 0
    assert db.store.get_metastate("accounts") is not None
    assert db.next_round() == 1


def test_metastate_special_accounts(db, spark):
    _ingest(db, spark, [fx.make_block(0)])
    v = json.loads(db.store.get_metastate("accounts"))
    assert set(v) == {"FeeSink", "RewardsPool"}


def test_crash_after_fact_append_replays_exactly_once(db, spark):
    """Reference invariant 'txn tables can only be ahead, never behind'
    (cockroach.go:189-199): kill ingest AFTER the fact appends but BEFORE
    the metastate commit, then replay the batch.  The replay must apply the
    skipped metastate without duplicating a single fact row, and the state
    tables must converge to the same values."""
    _init0(db, spark)
    _ingest(
        db, spark,
        [fx.make_block(1, payset=[fx.pay_txn("T1")],
                       accts=[fx.acct_delta(fx.ADDR_A, 100)])],
    )

    # crash injection: the metastate merge at the end of add_blocks fails
    batch = [
        fx.make_block(2, payset=[fx.pay_txn("T2"), fx.pay_txn("T2B")],
                      accts=[fx.acct_delta(fx.ADDR_A, 200)]),
        fx.make_block(3, payset=[fx.pay_txn("T3")],
                      accts=[fx.acct_delta(fx.ADDR_B, 50)]),
    ]
    real_merge = db.store.merge_metastate
    calls = {"n": 0}

    def exploding_merge(updates):
        calls["n"] += 1
        raise RuntimeError("injected crash before metastate commit")

    db.store.merge_metastate = exploding_merge
    with pytest.raises(RuntimeError, match="injected crash"):
        _ingest(db, spark, batch)
    db.store.merge_metastate = real_merge

    # facts are AHEAD of the gate: rows applied, high-water mark not
    assert calls["n"] == 1
    assert db.next_round() == 2
    assert db.store.read("txn").count() == 4  # T1 + T2,T2B,T3

    # Structured Streaming redelivers the same batch; the gate still sees
    # next=2 so the rounds re-apply — fact appends must be no-ops
    assert _ingest(db, spark, batch) == 2
    assert db.next_round() == 4
    txn = db.store.read("txn").collect()
    assert len(txn) == 4  # no duplicate (round, intra) rows
    assert len({(r.round, r.intra) for r in txn}) == 4
    hdr = db.store.read("block_header").collect()
    assert sorted(r.round for r in hdr) == [0, 1, 2, 3]
    part = db.store.read("txn_participation").collect()
    assert len(part) == len({(bytes(r.addr), r.round, r.intra) for r in part})
    # state converged: the replayed MERGEs are deterministic
    accts = {bytes(r.addr): r for r in db.store.read("account").collect()}
    assert int(accts[fx.ADDR_A].microalgos) == 200
    assert int(accts[fx.ADDR_B].microalgos) == 50


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


# ---------------------------------------------------------------------------
# round-3: ingest-time txid derivation (verdict "What's missing #2")
# ---------------------------------------------------------------------------


def test_derive_missing_txids(spark):
    """Roots without an input txid get base32(sha512/256('TX'||canonical
    JSON)) at ingest (write_txn.go:134 analog); inner rows stay txid-NULL
    but their extra carries the DERIVED root txid; payload-provided txids
    are never overwritten."""
    import re

    from sparkroach.chain import transforms
    from sparkroach.chain.encoding import synthetic_txid
    from sparkroach.chain.schemas import block_schema
    from sparkroach.queries.chain_demo import ADDR_A, ADDR_B, GENESIS

    inner = {"txn": {"type": "pay", "snd": ADDR_B, "rcv": ADDR_A, "amt": Decimal(1)}}
    blocks = [{
        "round": 1,
        "timestamp": 1_700_000_000,
        "genesis_id": "t",
        "genesis_hash": GENESIS,
        "rewards_level": 0,
        "txn_counter": 10,
        "fee_sink": b"\xfe" * 32,
        "rewards_pool": b"\xaa" * 32,
        "payset": [
            {   # no txid provided
                "txn": {"type": "pay", "snd": ADDR_A, "rcv": ADDR_B,
                        "amt": Decimal(5), "fee": 1000},
                "sig": b"\x11" * 64,
                "ad": {"dt": {"itx": [inner]}},
            },
            {   # txid provided: must be kept verbatim
                "txid": "GIVEN",
                "txn": {"type": "pay", "snd": ADDR_B, "rcv": ADDR_A,
                        "amt": Decimal(7), "fee": 1000},
                "sig": b"\x11" * 64,
            },
        ],
        "delta": {"accts": [], "asset_resources": [], "app_resources": [],
                  "kv_mods": []},
    }]
    bdf = spark.createDataFrame(blocks, block_schema())

    # default path unchanged: missing txid stays NULL
    plain = {(r["round"], r["intra"]): r for r in transforms.txns(bdf).collect()}
    assert plain[(1, 0)]["txid"] is None

    rows = {
        (r["round"], r["intra"]): r
        for r in transforms.txns(bdf, derive_missing_txids=True).collect()
    }
    root, inner_row, given = rows[(1, 0)], rows[(1, 1)], rows[(1, 2)]
    # derived txid: 52-char unpadded base32 of a 32-byte digest, equal to
    # the fixture helper over the SAME canonical bytes
    assert root["txid"] == synthetic_txid(root["txn"])
    assert re.fullmatch(r"[A-Z2-7]{52}", root["txid"])
    # inner row: txid NULL, extra back-filled with the derived root txid
    assert inner_row["txid"] is None
    assert json.loads(inner_row["extra"]) == {
        "root-intra": 0, "root-txid": root["txid"],
    }
    assert given["txid"] == "GIVEN"
    # deterministic across plans/invocations
    again = {
        (r["round"], r["intra"]): r["txid"]
        for r in transforms.txns(bdf, derive_missing_txids=True).collect()
    }
    assert again[(1, 0)] == root["txid"]


def test_time_travel_reads_account_state_as_of_earlier_round(db, spark):
    """The store's snapshot retention through the REAL ingest path: the
    account table as of the round-1 commit stays readable (and correct)
    after rounds 2-3 rewrote its buckets — the audit/debug read the
    SCD-lite lineage columns cannot answer by themselves (they track
    created/closed rounds, not intermediate balances)."""
    _init0(db, spark)
    _ingest(db, spark, [fx.make_block(1, accts=[fx.acct_delta(fx.ADDR_A, 5000)])])
    v_r1 = db.store._manifest("account").version
    _ingest(db, spark, [fx.make_block(2, accts=[fx.acct_delta(fx.ADDR_A, 7777)])])
    _ingest(db, spark, [fx.make_block(3, accts=[fx.acct_delta(fx.ADDR_A, 0)])])

    now = {bytes(r.addr): r for r in db.store.read("account").collect()}
    then = {
        bytes(r.addr): r
        for r in db.store.read("account", version=v_r1).collect()
    }
    assert int(now[fx.ADDR_A].microalgos) == 0
    assert now[fx.ADDR_A].deleted is True
    # as of round 1: the balance mid-history, not derivable from lineage
    assert int(then[fx.ADDR_A].microalgos) == 5000
    assert then[fx.ADDR_A].deleted is False
    assert then[fx.ADDR_A].created_at == 1 and then[fx.ADDR_A].closed_at is None
    # vacuum keeps the live read intact and bounds the window
    db.store.vacuum("account", keep_snapshots=1)
    assert int(db.store.read("account").collect()[0].microalgos) == 0
    with pytest.raises(ValueError, match="not retained"):
        db.store.read("account", version=v_r1)
