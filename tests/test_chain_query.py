"""Read-surface tests (idb.go:171-387 semantics) + encoding goldens."""

from __future__ import annotations

from datetime import datetime, timezone
from decimal import Decimal

import pytest

from sparkroach.chain import encoding
from sparkroach.chain.ingest import ChainDB
from sparkroach.chain.query import (
    ROLE_RECEIVER,
    ROLE_SENDER,
    AccountQueryOptions,
    ApplicationBoxQuery,
    ApplicationQuery,
    AssetBalanceQuery,
    AssetsQuery,
    GetBlockOptions,
    MaxTransactionsError,
    TransactionFilter,
)
from tests import chain_fixtures as fx


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    """A small chain: 3 blocks with txns, accounts, assets, apps, boxes."""
    d = ChainDB(spark, str(tmp_path_factory.mktemp("chainq")), n_buckets=4)
    b1 = fx.make_block(
        1,
        payset=[
            fx.pay_txn("PAY0", snd=fx.ADDR_A, rcv=fx.ADDR_B, amt=500,
                       note=b"hello-world"),
            fx.axfer_txn("AX0", xaid=5, aamt=100, snd=fx.ADDR_B,
                         arcv=fx.ADDR_C, msig=True),
        ],
        accts=[fx.acct_delta(fx.ADDR_A, 1_000_000),
               fx.acct_delta(fx.ADDR_B, 2_000_000),
               fx.acct_delta(fx.ADDR_C, 50)],
        asset_resources=[
            fx.asset_resource(5, fx.ADDR_A,
                              params={"total": Decimal(1000), "decimals": 0,
                                      "unit_name": b"GOLD",
                                      "asset_name": b"GoldCoin"},
                              holding={"amount": Decimal(900), "frozen": False}),
            fx.asset_resource(5, fx.ADDR_C,
                              holding={"amount": Decimal(100), "frozen": False}),
        ],
        app_resources=[
            fx.app_resource(20, fx.ADDR_B, params={"approv": b"\x01"},
                            local_state={"schema": {"num_uint": 1}}),
        ],
        kv_mods=[(fx.box_key(20, b"alpha"), b"v-alpha"),
                 (fx.box_key(20, b"beta"), b"v-beta")],
    )
    b2 = fx.make_block(
        2,
        payset=[fx.pay_txn("PAY1", snd=fx.ADDR_B, rcv=fx.ADDR_A, amt=9000)],
        timestamp=1_700_003_600,
    )
    b3 = fx.make_block(
        3,
        payset=[fx.pay_txn("PAY2", snd=fx.ADDR_C, rcv=fx.ADDR_A, amt=10)],
        timestamp=1_700_007_200,
    )
    d.add_blocks(fx.blocks_df(d.spark, [fx.make_block(0), b1, b2, b3]))
    return d


def test_txn_filter_round_range(db):
    assert TransactionFilter(min_round=2).compile(db).count() == 2
    assert TransactionFilter(round=1).compile(db).count() == 2


def test_txn_filter_txid_and_type(db):
    rows = TransactionFilter(txid="AX0").compile(db).collect()
    assert len(rows) == 1 and rows[0].typeenum == 4
    assert TransactionFilter(type_enum=1).compile(db).count() == 3


def test_txn_filter_address_and_role(db):
    # ADDR_A participates in PAY0 (sender), PAY1 (rcv), PAY2 (rcv)
    assert TransactionFilter(address=fx.ADDR_A).compile(db).count() == 3
    as_sender = TransactionFilter(
        address=fx.ADDR_A, address_role=ROLE_SENDER
    ).compile(db)
    assert [r.txid for r in as_sender.collect()] == ["PAY0"]
    as_rcv = TransactionFilter(
        address=fx.ADDR_A, address_role=ROLE_RECEIVER
    ).compile(db)
    assert {r.txid for r in as_rcv.collect()} == {"PAY1", "PAY2"}


def test_txn_filter_note_prefix_and_amounts(db):
    assert TransactionFilter(note_prefix=b"hello").compile(db).count() == 1
    assert TransactionFilter(note_prefix=b"xx").compile(db).count() == 0
    assert TransactionFilter(algos_gt=600).compile(db).count() == 1  # PAY1
    assert TransactionFilter(algos_lt=100).compile(db).count() == 1  # PAY2
    assert TransactionFilter(asset_id=5).compile(db).count() == 1
    assert TransactionFilter(asset_amount_gt=50).compile(db).count() == 1
    assert TransactionFilter(sig_type="msig").compile(db).count() == 1


def test_txn_filter_offset_rekey_appid(db):
    # Offset / OffsetLT / OffsetGT (idb.go:199-201)
    assert TransactionFilter(round=1, offset=1).compile(db).count() == 1
    assert TransactionFilter(round=1, offset_lt=1).compile(db).count() == 1
    assert TransactionFilter(round=1, offset_gt=0).compile(db).count() == 1
    # RekeyTo presence/absence (idb.go:206)
    assert TransactionFilter(rekey_to=True).compile(db).count() == 0
    assert TransactionFilter(rekey_to=False).compile(db).count() == 4
    # ApplicationID scopes to appl txns only (idb.go:212)
    assert TransactionFilter(application_id=5).compile(db).count() == 0


def test_txn_filter_time_window(db):
    t0 = datetime(2023, 11, 14, 22, 30, tzinfo=timezone.utc)
    out = TransactionFilter(after_time=t0).compile(db)
    assert {r.txid for r in out.collect()} == {"PAY1", "PAY2"}


def test_txn_pagination_tokens(db):
    page1 = TransactionFilter(limit=2).compile(db).collect()
    assert [r.txid for r in page1] == ["PAY0", "AX0"]
    token = TransactionFilter.page_token(page1[-1])
    page2 = TransactionFilter(next_token=token, limit=2).compile(db).collect()
    assert [r.txid for r in page2] == ["PAY1"] or [r.txid for r in page2] == [
        "PAY1",
        "PAY2",
    ]


def test_txn_max_limit_guard(db):
    with pytest.raises(MaxTransactionsError):
        TransactionFilter(max_transactions_limit=2).compile(db)


def test_accounts_query(db):
    assert AccountQueryOptions().compile(db).count() == 3
    assert AccountQueryOptions(algos_greater_than=100).compile(db).count() == 2
    assert (
        AccountQueryOptions(greater_than_address=fx.ADDR_A, limit=1)
        .compile(db)
        .collect()[0]
        .addr
        == bytearray(fx.ADDR_B)
    )
    holders = AccountQueryOptions(has_asset_id=5).compile(db)
    assert {bytes(r.addr) for r in holders.collect()} == {fx.ADDR_A, fx.ADDR_C}
    rich_holders = AccountQueryOptions(has_asset_id=5, asset_gt=500).compile(db)
    assert {bytes(r.addr) for r in rich_holders.collect()} == {fx.ADDR_A}
    assert AccountQueryOptions(has_app_id=20).compile(db).count() == 1


def test_inner_root_resolution(spark, tmp_path_factory):
    # idb.go:222-228: matched inner rows resolve to their root txn unless
    # SkipInnerTransactionConversion
    d = ChainDB(spark, str(tmp_path_factory.mktemp("chainroot")), n_buckets=2)
    inner = fx.pay_txn(None, snd=fx.ADDR_B, rcv=fx.ADDR_C, amt=7, sig=None)
    root = fx.appl_txn("ROOT0", apid=42, inners=[inner])
    d.add_blocks(fx.blocks_df(spark, [fx.make_block(0),
                                      fx.make_block(1, payset=[root])]))

    rows = {r.intra: r for r in TransactionFilter().compile(d).collect()}
    assert rows[0].root_txn is None  # root row: nothing to resolve
    assert rows[1].txid is None and rows[1].root_txn == rows[0].txn

    raw = TransactionFilter(skip_inner_transaction_conversion=True).compile(d)
    assert all(r.root_txn is None for r in raw.collect())
    only_roots = TransactionFilter(skip_inner_transactions=True).compile(d)
    assert [r.intra for r in only_roots.collect()] == [0]


def test_account_resource_inclusion(db):
    from sparkroach.chain.query import MaxResourcesError

    out = {
        bytes(r.addr): r
        for r in AccountQueryOptions(
            include_asset_holdings=True,
            include_asset_params=True,
            include_app_local_state=True,
            include_app_params=True,
        )
        .compile(db)
        .collect()
    }
    a, b = out[fx.ADDR_A], out[fx.ADDR_B]
    assert [int(h.amount) for h in a.assets] == [900]
    assert [c.id for c in a.created_assets] == [5]
    assert a.created_apps is None and a.apps_local_state is None
    assert [c.id for c in b.created_apps] == [20]
    assert [s.app for s in b.apps_local_state] == [20]

    with pytest.raises(MaxResourcesError):
        AccountQueryOptions(
            include_asset_holdings=True,
            include_asset_params=True,
            max_resources=1,
        ).compile(db)


def test_assets_query_ilike(db):
    assert AssetsQuery(query="goldc").compile(db).count() == 1
    assert AssetsQuery(unit="gold").compile(db).count() == 1
    assert AssetsQuery(query="nope").compile(db).count() == 0
    assert AssetsQuery(asset_id_greater_than=4, limit=10).compile(db).count() == 1


def test_asset_balances(db):
    rows = AssetBalanceQuery(asset_id=5).compile(db).collect()
    assert [int(r.amount) for r in rows] == [900, 100]  # ordered by addr
    rows = AssetBalanceQuery(asset_id=5, prev_address=fx.ADDR_A).compile(db).collect()
    assert len(rows) == 1 and int(rows[0].amount) == 100
    assert AssetBalanceQuery(asset_id=5, amount_gt=500).compile(db).count() == 1


def test_applications_and_boxes(db):
    assert ApplicationQuery(application_id=20).compile(db).count() == 1
    assert ApplicationQuery(creator=fx.ADDR_B).compile(db).count() == 1
    assert ApplicationQuery(local_state=True, address=fx.ADDR_B).compile(db).count() == 1
    boxes = ApplicationBoxQuery(application_id=20).compile(db).collect()
    assert [bytes(r.name) for r in boxes] == [b"alpha", b"beta"]
    page = ApplicationBoxQuery(
        application_id=20, prev_final_box=b"alpha"
    ).compile(db).collect()
    assert [bytes(r.name) for r in page] == [b"beta"]
    novals = ApplicationBoxQuery(application_id=20, omit_values=True).compile(db)
    assert novals.columns == ["app", "name"]


def test_get_block(db):
    hdr = GetBlockOptions(round=2).compile(db).collect()
    assert len(hdr) == 1 and hdr[0].round == 2
    full = GetBlockOptions(round=1, transactions=True).compile(db).collect()
    assert len(full) == 2
    with pytest.raises(MaxTransactionsError):
        GetBlockOptions(round=1, transactions=True, max_transactions_limit=1).compile(db)


# -- encoding goldens (encoding_test.go analogs) ------------------------------


def test_canonical_json_byte_map_keys():
    # golden {"/w==":3} for a 0xff byte key (encoding_test.go:255-275)
    assert encoding.canonical_json({b"\xff": 3}) == '{"/w==":3}'


def test_canonical_json_omit_empty_and_sorted():
    obj = {"b": 0, "a": 1, "z": "", "m": [], "k": None, "c": {"x": False, "y": 2}}
    assert encoding.canonical_json(obj) == '{"a":1,"c":{"y":2}}'


def test_address_roundtrip():
    addr = encoding.encode_address(fx.ADDR_A)
    assert len(addr) == 58
    assert encoding.decode_address(addr) == fx.ADDR_A
    with pytest.raises(ValueError):
        encoding.decode_address("A" * 58)


def test_pagination_token_codec():
    # 12-byte LE round-trip (idb_test.go:14-99)
    tok = encoding.encode_txn_next_token(7, 3)
    assert encoding.decode_txn_next_token(tok) == (7, 3)
    tok = encoding.encode_txn_next_token(2**40, 2**31)
    assert encoding.decode_txn_next_token(tok) == (2**40, 2**31)


def _app_call_with_inner_txns() -> str:
    """Canonical JSON analog of test.MakeAppCallWithInnerTxn: an appl whose
    eval delta carries 2 inner txns, the second of which carries 2 nested
    inners → countInner == 4 (idb_test.go:17 comment says 2+2)."""
    import json as _json

    nested = {"txn": {"type": "pay", "amt": 1}}
    inner_pay = {"txn": {"type": "pay", "amt": 5}}
    inner_appl = {
        "txn": {"type": "appl", "apid": 9},
        "ad": {"dt": {"itx": [nested, nested]}},
    }
    root = {
        "txn": {"type": "appl", "apid": 7},
        "ad": {"dt": {"itx": [inner_pay, inner_appl]}},
    }
    return _json.dumps(root)


def test_txn_row_next_matrix():
    """Port of TestTxnRowNext (idb_test.go:14-99)."""
    # simple 1: root row, descending — token is the row's own position
    tok = encoding.txn_row_next_token(0, 0, None, False, '{"txn":{}}', None)
    assert encoding.decode_txn_next_token(tok) == (0, 0)
    # simple 2
    tok = encoding.txn_row_next_token(
        1_234_567_890, 500, None, False, '{"txn":{}}', None
    )
    assert encoding.decode_txn_next_token(tok) == (1_234_567_890, 500)
    root_json = _app_call_with_inner_txns()
    assert encoding.count_inner_txns(root_json) == 4
    # inner txns descending: token = RootIntra
    tok = encoding.txn_row_next_token(1_234_567_890, 51, 50, False, None, root_json)
    assert encoding.decode_txn_next_token(tok) == (1_234_567_890, 50)
    # inner txns ascending: token = RootIntra + countInner(root) = 54
    tok = encoding.txn_row_next_token(1_234_567_890, 51, 50, True, None, root_json)
    assert encoding.decode_txn_next_token(tok) == (1_234_567_890, 54)
    # root txn absent ascending → error
    with pytest.raises(ValueError, match="was not given transaction"):
        encoding.txn_row_next_token(1_234_567_890, 51, 50, True, None, None)


def test_paging_over_inner_txns_skips_subtree(spark, tmp_path_factory):
    """End-to-end: an ascending token taken on ANY row of a root's subtree
    resumes past the whole subtree; a descending token from an inner row
    resumes before the root."""
    d = ChainDB(spark, str(tmp_path_factory.mktemp("chainpage")), n_buckets=2)
    inner = fx.pay_txn(None, snd=fx.ADDR_B, rcv=fx.ADDR_C, amt=7, sig=None)
    root0 = fx.appl_txn("ROOT0", apid=42, inners=[inner, inner])  # intra 0,1,2
    root1 = fx.pay_txn("PAY3")  # intra 3
    d.add_blocks(fx.blocks_df(spark, [fx.make_block(0),
                                      fx.make_block(1, payset=[root0, root1])]))

    # ascending, page size 2 → last row of page 1 is the first inner
    page1 = TransactionFilter(limit=2).compile(d).collect()
    assert [r.intra for r in page1] == [0, 1]
    tok = TransactionFilter.page_token(page1[-1], ascending=True)
    # inner row: token = root_intra(0) + countInner(2) = 2 → next page
    # starts past the subtree at PAY3, never re-returning inner #2
    assert encoding.decode_txn_next_token(tok) == (1, 2)
    page2 = TransactionFilter(next_token=tok, limit=2).compile(d).collect()
    assert [r.txid for r in page2] == ["PAY3"]

    # token on the root row itself also skips its inners
    tok0 = TransactionFilter.page_token(page1[0], ascending=True)
    assert encoding.decode_txn_next_token(tok0) == (1, 2)

    # descending: page 1 returns PAY3 then inner #2 (resolved to root)
    dpage1 = TransactionFilter(limit=2, ascending=False).compile(d).collect()
    assert [r.intra for r in dpage1] == [3, 2]
    dtok = TransactionFilter.page_token(dpage1[-1], ascending=False)
    # inner row descending → token = root intra → next page precedes the
    # whole subtree (here: nothing, since ROOT0 is the block's first txn)
    assert encoding.decode_txn_next_token(dtok) == (1, 0)
    dpage2 = TransactionFilter(
        next_token=dtok, ascending=False
    ).compile(d).collect()
    assert dpage2 == []


def test_asset_params_printable_vs_b64():
    out = encoding.convert_asset_params(
        {"unit_name": b"OK", "asset_name": b"\xff\xfe", "url": b"http://x"}
    )
    assert out["unit_name"] == "OK" and out["url"] == "http://x"
    assert "asset_name" not in out and out["an64"] == b"\xff\xfe"


def test_sig_type_matrix():
    assert encoding.sig_type(b"\x01", None, None, None, None) == "sig"
    assert encoding.sig_type(None, True, None, None, None) == "msig"
    assert encoding.sig_type(None, None, True, b"\x01", None) == "sig"
    assert encoding.sig_type(None, None, True, None, True) == "msig"
    assert encoding.sig_type(None, None, True, None, None) == "lsig"
    assert encoding.sig_type(None, None, None, None, None) is None
