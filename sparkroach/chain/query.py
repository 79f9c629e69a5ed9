"""The Indexer read surface (idb.go:171-387) compiled to DataFrames.

Each parameter object from the reference becomes a dataclass whose
``compile(db)`` returns a DataFrame; Catalyst replaces the upstream
Indexer's SQL generation (SURVEY §3.3).  Keyset pagination uses the
reference's 12-byte token codec (idb.go:56-100, chain.encoding).

Planner notes (SURVEY §4 "custom work" item 4): when an Address filter is
present, the plan routes through the txn_participation inverted index
(semi-join); otherwise it scans txn directly with file-level round pruning
— the same choice the upstream SQL generator makes with its optimization
pass, here a one-line heuristic.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, functions as F

from sparkroach.chain.encoding import (
    decode_txn_next_token,
    txn_row_next_token as encoding_next_token,
)
from sparkroach.chain.ingest import ChainDB

# AddressRole bitfield (address_role.go:8-15)
ROLE_SENDER = 0x01
ROLE_RECEIVER = 0x02
ROLE_CLOSE_TO = 0x04
ROLE_ASSET_SENDER = 0x08
ROLE_ASSET_RECEIVER = 0x10
ROLE_ASSET_CLOSE_TO = 0x20
ROLE_FREEZE = 0x40


class MaxTransactionsError(ValueError):
    """Result exceeds MaxTransactionsLimit (idb.go:418-423)."""


class MaxResourcesError(ValueError):
    """An account exceeds MaxResources (MaxAPIResourcesPerAccountError,
    idb.go:278-286)."""


@dataclass
class TransactionFilter:
    """idb.go:180-233."""

    address: bytes | None = None
    address_role: int = 0
    min_round: int | None = None
    max_round: int | None = None
    round: int | None = None
    after_time: datetime | None = None
    before_time: datetime | None = None
    type_enum: int | None = None
    txid: str | None = None
    offset: int | None = None
    offset_lt: int | None = None
    offset_gt: int | None = None
    sig_type: str | None = None
    note_prefix: bytes | None = None
    algos_gt: int | None = None
    algos_lt: int | None = None
    asset_id: int | None = None
    asset_amount_gt: int | None = None
    asset_amount_lt: int | None = None
    application_id: int | None = None
    effective_amount_gt: int | None = None
    effective_amount_lt: int | None = None
    rekey_to: bool | None = None
    next_token: str | None = None
    limit: int | None = None
    skip_inner_transactions: bool = False
    skip_inner_transaction_conversion: bool = False
    max_transactions_limit: int | None = None
    # result order (idb.go:56-84 TxnRow.Next(ascending); the reference ships
    # a DESC participation index, setup_cockroachdb.sql:33-40, precisely so
    # this path is cheap)
    ascending: bool = True

    def compile(self, db: ChainDB) -> DataFrame:
        lo = self.round if self.round is not None else self.min_round
        hi = self.round if self.round is not None else self.max_round
        txn = db.store.read("txn", min_round=lo, max_round=hi)

        if self.skip_inner_transactions:
            txn = txn.where(F.col("extra").isNull() | (F.get_json_object("extra", "$['root-intra']").isNull()))
        if self.type_enum is not None:
            txn = txn.where(F.col("typeenum") == self.type_enum)
        if self.txid is not None:
            txn = txn.where(F.col("txid") == self.txid)
        for off, op in ((self.offset, "="), (self.offset_lt, "<"), (self.offset_gt, ">")):
            if off is not None:
                txn = txn.where(F.expr(f"intra {op} {int(off)}"))
        if self.note_prefix is not None:
            # canonical JSON stores note as base64; prefix match on raw bytes
            b64ish = F.get_json_object("txn", "$.txn.note")
            txn = txn.where(
                F.unbase64(b64ish).startswith(F.lit(self.note_prefix))
            )
        if self.algos_gt is not None:
            txn = txn.where(
                (F.col("typeenum") == 1)
                & (F.get_json_object("txn", "$.txn.amt").cast("decimal(20,0)") > self.algos_gt)
            )
        if self.algos_lt is not None:
            txn = txn.where(
                (F.col("typeenum") == 1)
                & (
                    F.coalesce(
                        F.get_json_object("txn", "$.txn.amt").cast("decimal(20,0)"),
                        F.lit(0).cast("decimal(20,0)"),
                    )
                    < self.algos_lt
                )
            )
        if self.asset_id is not None:
            txn = txn.where(F.col("asset") == self.asset_id)
        if self.application_id is not None:
            txn = txn.where(
                (F.col("typeenum") == 6) & (F.col("asset") == self.application_id)
            )
        if self.asset_amount_gt is not None:
            txn = txn.where(
                F.get_json_object("txn", "$.txn.aamt").cast("decimal(20,0)")
                > self.asset_amount_gt
            )
        if self.asset_amount_lt is not None:
            txn = txn.where(
                F.get_json_object("txn", "$.txn.aamt").cast("decimal(20,0)")
                < self.asset_amount_lt
            )
        if self.effective_amount_gt is not None or self.effective_amount_lt is not None:
            amt = F.coalesce(
                F.get_json_object("txn", "$.txn.amt").cast("decimal(20,0)"), F.lit(0)
            )
            ca = F.coalesce(
                F.get_json_object("txn", "$.ad.ca").cast("decimal(20,0)"), F.lit(0)
            )
            eff = amt + ca
            if self.effective_amount_gt is not None:
                txn = txn.where(eff > self.effective_amount_gt)
            if self.effective_amount_lt is not None:
                txn = txn.where(eff < self.effective_amount_lt)
        if self.rekey_to is True:
            txn = txn.where(F.get_json_object("txn", "$.txn.rekey").isNotNull())
        elif self.rekey_to is False:
            txn = txn.where(F.get_json_object("txn", "$.txn.rekey").isNull())
        if self.sig_type is not None:
            present = {
                "sig": F.get_json_object("txn", "$.sig").isNotNull(),
                "msig": F.get_json_object("txn", "$.msig_present").isNotNull(),
                "lsig": F.get_json_object("txn", "$.lsig_present").isNotNull(),
            }[self.sig_type]
            txn = txn.where(present)

        # time window via block_header join (idb.go:194-195; index sql:15)
        if self.after_time is not None or self.before_time is not None:
            hdr = db.store.read("block_header")
            if self.after_time is not None:
                hdr = hdr.where(F.col("realtime") > F.lit(self.after_time))
            if self.before_time is not None:
                hdr = hdr.where(F.col("realtime") < F.lit(self.before_time))
            txn = txn.join(
                F.broadcast(hdr.select(F.col("round").alias("h_round"))),
                F.col("round") == F.col("h_round"),
                "inner",
            ).drop("h_round")

        # address participation semi-join (idb.go:188-190) — the inverted
        # index path, only taken when the filter needs it
        if self.address is not None:
            part = db.store.read(
                "txn_participation", min_round=lo, max_round=hi
            ).where(F.col("addr") == F.lit(self.address))
            txn = txn.join(
                part.selectExpr("round AS p_round", "intra AS p_intra"),
                (F.col("round") == F.col("p_round"))
                & (F.col("intra") == F.col("p_intra")),
                "left_semi",
            )
            if self.address_role:
                txn = txn.where(self._role_predicate())

        # keyset pagination (idb.go:56-100); the comparison flips with the
        # result order
        if self.next_token is not None:
            r, i = decode_txn_next_token(self.next_token)
            if self.ascending:
                txn = txn.where(
                    (F.col("round") > r)
                    | ((F.col("round") == r) & (F.col("intra") > i))
                )
            else:
                txn = txn.where(
                    (F.col("round") < r)
                    | ((F.col("round") == r) & (F.col("intra") < i))
                )

        if self.max_transactions_limit is not None:
            if txn.limit(self.max_transactions_limit + 1).count() > self.max_transactions_limit:
                raise MaxTransactionsError(
                    f"more than {self.max_transactions_limit} results"
                )

        # inner → root resolution (idb.go:222-228: TxnRow.RootTxn): matched
        # inner rows carry their root's stored txn alongside; only joined
        # when inner rows can appear in the result at all
        if self.skip_inner_transactions or self.skip_inner_transaction_conversion:
            txn = txn.withColumn("root_txn", F.lit(None).cast("string"))
        else:
            roots = db.store.read("txn", min_round=lo, max_round=hi).select(
                F.col("round").alias("rt_round"),
                F.col("intra").alias("rt_intra"),
                F.col("txn").alias("root_txn"),
            )
            ri = F.get_json_object("extra", "$['root-intra']").cast("int")
            txn = txn.join(
                roots,
                (F.col("round") == F.col("rt_round")) & (ri == F.col("rt_intra")),
                "left",
            ).drop("rt_round", "rt_intra")

        if self.ascending:
            txn = txn.orderBy("round", "intra")
        else:
            txn = txn.orderBy(F.col("round").desc(), F.col("intra").desc())
        if self.limit is not None:
            txn = txn.limit(self.limit)
        return txn

    def _role_predicate(self):
        import base64

        addr_b64 = base64.b64encode(self.address).decode()
        checks = []
        role_fields = [
            (ROLE_SENDER, "$.txn.snd"),
            (ROLE_RECEIVER, "$.txn.rcv"),
            (ROLE_CLOSE_TO, "$.txn.close"),
            (ROLE_ASSET_SENDER, "$.txn.asnd"),
            (ROLE_ASSET_RECEIVER, "$.txn.arcv"),
            (ROLE_ASSET_CLOSE_TO, "$.txn.aclose"),
            (ROLE_FREEZE, "$.txn.fadd"),
        ]
        for bit, path in role_fields:
            if self.address_role & bit:
                checks.append(F.get_json_object("txn", path) == addr_b64)
        pred = F.lit(False)
        for c in checks:
            pred = pred | c
        return pred

    @staticmethod
    def page_token(last_row, ascending: bool = True) -> str:
        """Next-token from the last returned row (TxnRow.Next, idb.go:56-84).

        An inner row's token carries its ROOT's intra; ascending tokens add
        countInner(root) so the next page skips the whole inner subtree.
        Raises if ascending and the row carries no txn document (an inner
        row fetched with skip_inner_transaction_conversion — the
        reference's "Next() was not given transaction" case)."""
        import json as _json

        root_intra = None
        extra = last_row["extra"]
        if extra:
            ri = _json.loads(extra).get("root-intra")
            root_intra = int(ri) if ri is not None else None
        root_txn = (
            last_row["root_txn"] if "root_txn" in last_row.__fields__ else None
        )
        return encoding_next_token(
            last_row["round"],
            last_row["intra"],
            root_intra,
            ascending,
            last_row["txn"],
            root_txn,
        )


@dataclass
class AccountQueryOptions:
    """idb.go:236-269."""

    greater_than_address: bytes | None = None
    equal_to_address: bytes | None = None
    equal_to_auth_addr: bytes | None = None
    algos_greater_than: int | None = None
    algos_less_than: int | None = None
    has_asset_id: int | None = None
    asset_gt: int | None = None
    asset_lt: int | None = None
    has_app_id: int | None = None
    include_deleted: bool = False
    limit: int | None = None
    # resource inclusion (idb.go:257-263) — left joins + per-addr array agg,
    # the Indexer's JSON aggregation re-expressed as sort_array(collect_list)
    include_asset_holdings: bool = False
    include_asset_params: bool = False
    include_app_local_state: bool = False
    include_app_params: bool = False
    max_resources: int | None = None

    def _resource_agg(
        self, db: ChainDB, table: str, key: str, alias: str, cols: list[str]
    ) -> DataFrame:
        t = db.store.read(table)
        if not self.include_deleted:
            t = t.where(~F.coalesce(F.col("deleted"), F.lit(False)))
        return t.groupBy(F.col(key).alias("addr")).agg(
            F.sort_array(F.collect_list(F.struct(*cols))).alias(alias),
            F.count("*").alias(f"n_{alias}"),
        )

    def compile(self, db: ChainDB) -> DataFrame:
        # point lookup by PK → bucket-pruned read (one bucket's files, the
        # B-tree point-read analog); the predicate still applies below
        point = (
            (self.equal_to_address,) if self.equal_to_address is not None else None
        )
        acct = db.store.read("account", key=point)
        if not self.include_deleted:
            acct = acct.where(~F.coalesce(F.col("deleted"), F.lit(False)))
        if self.equal_to_address is not None:
            acct = acct.where(F.col("addr") == F.lit(self.equal_to_address))
        if self.greater_than_address is not None:
            acct = acct.where(F.col("addr") > F.lit(self.greater_than_address))
        if self.equal_to_auth_addr is not None:
            import base64

            acct = acct.where(
                F.get_json_object("account_data", "$.spend")
                == base64.b64encode(self.equal_to_auth_addr).decode()
            )
        if self.algos_greater_than is not None:
            acct = acct.where(F.col("microalgos") > self.algos_greater_than)
        if self.algos_less_than is not None:
            acct = acct.where(F.col("microalgos") < self.algos_less_than)
        if self.has_asset_id is not None:
            aa = db.store.read("account_asset").where(
                F.col("assetid") == self.has_asset_id
            )
            if not self.include_deleted:
                aa = aa.where(~F.coalesce(F.col("deleted"), F.lit(False)))
            if self.asset_gt is not None:
                aa = aa.where(F.col("amount") > self.asset_gt)
            if self.asset_lt is not None:
                aa = aa.where(F.col("amount") < self.asset_lt)
            acct = acct.join(aa.select("addr"), "addr", "left_semi")
        if self.has_app_id is not None:
            ap = db.store.read("account_app").where(F.col("app") == self.has_app_id)
            if not self.include_deleted:
                ap = ap.where(~F.coalesce(F.col("deleted"), F.lit(False)))
            acct = acct.join(ap.select("addr"), "addr", "left_semi")

        includes = [
            (self.include_asset_holdings, "account_asset", "addr", "assets",
             ["assetid", "amount", "frozen", "deleted", "created_at", "closed_at"]),
            (self.include_asset_params, "asset", "creator_addr", "created_assets",
             ["id", "params", "deleted", "created_at", "closed_at"]),
            (self.include_app_local_state, "account_app", "addr", "apps_local_state",
             ["app", "localstate", "deleted", "created_at", "closed_at"]),
            (self.include_app_params, "app", "creator", "created_apps",
             ["id", "params", "deleted", "created_at", "closed_at"]),
        ]
        res_counts = []
        for on, table, key, alias, cols in includes:
            if not on:
                continue
            acct = acct.join(self._resource_agg(db, table, key, alias, cols), "addr", "left")
            res_counts.append(F.coalesce(F.col(f"n_{alias}"), F.lit(0)))
        if self.max_resources is not None and res_counts:
            total = res_counts[0]
            for c in res_counts[1:]:
                total = total + c
            over = acct.where(total > self.max_resources).select("addr").limit(1).collect()
            if over:
                raise MaxResourcesError(
                    f"account {over[0]['addr']!r} exceeds {self.max_resources} resources"
                )
        acct = acct.drop(*[f"n_{a}" for _, _, _, a, _ in includes])

        acct = acct.orderBy("addr")
        if self.limit is not None:
            acct = acct.limit(self.limit)
        return acct


@dataclass
class AssetsQuery:
    """idb.go:289-307."""

    asset_id: int | None = None
    asset_id_greater_than: int | None = None
    creator: bytes | None = None
    name: str = ""
    unit: str = ""
    query: str = ""  # fuzzy: name OR unit, case-insensitive substring
    include_deleted: bool = False
    limit: int | None = None

    def compile(self, db: ChainDB) -> DataFrame:
        point = (self.asset_id,) if self.asset_id is not None else None
        a = db.store.read("asset", key=point)
        if not self.include_deleted:
            a = a.where(~F.coalesce(F.col("deleted"), F.lit(False)))
        if self.asset_id is not None:
            a = a.where(F.col("id") == self.asset_id)
        if self.asset_id_greater_than is not None:
            a = a.where(F.col("id") > self.asset_id_greater_than)
        if self.creator is not None:
            a = a.where(F.col("creator_addr") == F.lit(self.creator))
        name_col = F.lower(
            F.coalesce(F.get_json_object("params", "$.asset_name"), F.lit(""))
        )
        unit_col = F.lower(
            F.coalesce(F.get_json_object("params", "$.unit_name"), F.lit(""))
        )
        if self.name:
            a = a.where(name_col.contains(self.name.lower()))
        if self.unit:
            a = a.where(unit_col.contains(self.unit.lower()))
        if self.query:
            q = self.query.lower()
            a = a.where(name_col.contains(q) | unit_col.contains(q))
        a = a.orderBy("id")
        if self.limit is not None:
            a = a.limit(self.limit)
        return a


@dataclass
class AssetBalanceQuery:
    """idb.go:321-337."""

    asset_id: int | None = None
    asset_id_gt: int | None = None
    amount_gt: int | None = None
    amount_lt: int | None = None
    prev_address: bytes | None = None
    include_deleted: bool = False
    limit: int | None = None

    def compile(self, db: ChainDB) -> DataFrame:
        aa = db.store.read("account_asset")
        if not self.include_deleted:
            aa = aa.where(~F.coalesce(F.col("deleted"), F.lit(False)))
        if self.asset_id is not None:
            aa = aa.where(F.col("assetid") == self.asset_id)
        if self.asset_id_gt is not None:
            aa = aa.where(F.col("assetid") > self.asset_id_gt)
        if self.amount_gt is not None:
            aa = aa.where(F.col("amount") > self.amount_gt)
        if self.amount_lt is not None:
            aa = aa.where(F.col("amount") < self.amount_lt)
        if self.prev_address is not None:
            aa = aa.where(F.col("addr") > F.lit(self.prev_address))
        aa = aa.orderBy("addr")
        if self.limit is not None:
            aa = aa.limit(self.limit)
        return aa


@dataclass
class ApplicationQuery:
    """idb.go:358-364 (+ AppLocalState via local_state=True)."""

    application_id: int | None = None
    application_id_greater_than: int | None = None
    creator: bytes | None = None
    address: bytes | None = None  # local-state owner
    include_deleted: bool = False
    limit: int | None = None
    local_state: bool = False

    def compile(self, db: ChainDB) -> DataFrame:
        if self.local_state:
            t = db.store.read("account_app")
            id_col = "app"
        else:
            t = db.store.read("app")
            id_col = "id"
        if not self.include_deleted:
            t = t.where(~F.coalesce(F.col("deleted"), F.lit(False)))
        if self.application_id is not None:
            t = t.where(F.col(id_col) == self.application_id)
        if self.application_id_greater_than is not None:
            t = t.where(F.col(id_col) > self.application_id_greater_than)
        if self.creator is not None and not self.local_state:
            t = t.where(F.col("creator") == F.lit(self.creator))
        if self.address is not None and self.local_state:
            t = t.where(F.col("addr") == F.lit(self.address))
        t = t.orderBy(id_col)
        if self.limit is not None:
            t = t.limit(self.limit)
        return t


@dataclass
class ApplicationBoxQuery:
    """idb.go:373-380 — hard-coded ASC name order."""

    application_id: int
    box_name: bytes | None = None
    prev_final_box: bytes | None = None
    omit_values: bool = False
    limit: int | None = None

    def compile(self, db: ChainDB) -> DataFrame:
        point = (
            (self.application_id, self.box_name)
            if self.box_name is not None
            else None
        )
        b = db.store.read("app_box", key=point).where(
            F.col("app") == self.application_id
        )
        if self.box_name is not None:
            b = b.where(F.col("name") == F.lit(self.box_name))
        if self.prev_final_box is not None:
            b = b.where(F.col("name") > F.lit(self.prev_final_box))
        if self.omit_values:
            b = b.select("app", "name")
        b = b.orderBy("name")
        if self.limit is not None:
            b = b.limit(self.limit)
        return b


@dataclass
class GetBlockOptions:
    """idb.go:171-177: header point lookup + optional payset join."""

    round: int
    transactions: bool = False
    max_transactions_limit: int | None = None

    def compile(self, db: ChainDB) -> DataFrame:
        hdr = db.store.read("block_header", min_round=self.round, max_round=self.round)
        if not self.transactions:
            return hdr
        txn = db.store.read("txn", min_round=self.round, max_round=self.round)
        if self.max_transactions_limit is not None:
            if txn.limit(self.max_transactions_limit + 1).count() > self.max_transactions_limit:
                raise MaxTransactionsError(
                    f"block {self.round} exceeds {self.max_transactions_limit} txns"
                )
        return hdr.join(txn, "round", "left").orderBy("intra")
