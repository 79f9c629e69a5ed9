"""Schemas: the input block stream and the nine maintained tables.

Input side mirrors FIXTURES.md §A (data.BlockData as exercised by the
reference's tests, plugin/exporter/exporter.go:131-142); output side is
setup_cockroachdb.sql:7-122 re-expressed per SURVEY.md §1.2's type map:
bigint→Long, numeric(20)→Decimal(20,0), bytea→Binary, jsonb→canonical JSON
string (StringType — produced by chain.encoding, byte-stable), timestamp→
TimestampType(UTC).

Spark structs cannot be recursive, so the transaction type (which nests
inner transactions, FIXTURES A.2) is generated to a fixed depth
``TXN_DEPTH``; the reference's own tests nest two levels (idb_test.go:14-99).
"""

from __future__ import annotations

from pyspark.sql import types as T

TXN_DEPTH = 4  # max inner-txn nesting supported by the generated schema

UINT64 = T.DecimalType(20, 0)  # numeric(20): full uint64 range (sql:59)


def _asset_params() -> T.StructType:
    # sdk AssetParams (encoding/types.go:10-24): names may be arbitrary bytes
    return T.StructType(
        [
            T.StructField("total", UINT64),
            T.StructField("decimals", T.LongType()),
            T.StructField("default_frozen", T.BooleanType()),
            T.StructField("unit_name", T.BinaryType()),
            T.StructField("asset_name", T.BinaryType()),
            T.StructField("url", T.BinaryType()),
            T.StructField("metadata_hash", T.BinaryType()),
            T.StructField("manager", T.BinaryType()),
            T.StructField("reserve", T.BinaryType()),
            T.StructField("freeze", T.BinaryType()),
            T.StructField("clawback", T.BinaryType()),
        ]
    )


def _state_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("num_uint", T.LongType()),
            T.StructField("num_byte_slice", T.LongType()),
        ]
    )


def _teal_kv() -> T.MapType:
    # TEAL key-value: keys are arbitrary bytes → base64-encoded string keys
    # (encoding/types.go:32-48); values tagged tt/tb/tu (types.go:73-76)
    return T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField("tt", T.LongType()),
                T.StructField("tb", T.BinaryType()),
                T.StructField("tu", UINT64),
            ]
        ),
    )


def _eval_delta(inner: T.StructType | None) -> T.StructType:
    fields = [
        T.StructField("gd", _teal_kv()),  # global delta
        T.StructField(
            "ld", T.MapType(T.StringType(), _teal_kv())
        ),  # local deltas keyed by account index
        T.StructField("lg", T.ArrayType(T.BinaryType())),  # logs
    ]
    if inner is not None:
        fields.append(T.StructField("itx", T.ArrayType(inner)))  # inner txns
    return T.StructType(fields)


def txn_schema(depth: int = TXN_DEPTH) -> T.StructType:
    """SignedTxnWithAD to a fixed nesting depth (FIXTURES A.2)."""
    inner: T.StructType | None = None
    for _ in range(depth):
        inner = _txn_level(inner)
    assert inner is not None
    return inner


def _txn_level(inner: T.StructType | None) -> T.StructType:
    apply_data = T.StructType(
        [
            T.StructField("ca", UINT64),  # closing amount (pay)
            T.StructField("aca", UINT64),  # asset closing amount
            T.StructField("caid", T.LongType()),  # created asset id
            T.StructField("apid", T.LongType()),  # created app id
            T.StructField("dt", _eval_delta(inner)),  # eval delta (+ inners)
        ]
    )
    txn_body = T.StructType(
        [
            T.StructField("type", T.StringType()),  # pay/keyreg/acfg/axfer/afrz/appl/stpf
            T.StructField("snd", T.BinaryType()),
            T.StructField("rekey", T.BinaryType()),
            T.StructField("note", T.BinaryType()),
            T.StructField("fee", T.LongType()),
            T.StructField("fv", T.LongType()),
            T.StructField("lv", T.LongType()),
            # pay
            T.StructField("rcv", T.BinaryType()),
            T.StructField("amt", UINT64),
            T.StructField("close", T.BinaryType()),
            # axfer
            T.StructField("xaid", T.LongType()),
            T.StructField("aamt", UINT64),
            T.StructField("asnd", T.BinaryType()),
            T.StructField("arcv", T.BinaryType()),
            T.StructField("aclose", T.BinaryType()),
            # afrz
            T.StructField("fadd", T.BinaryType()),
            T.StructField("faid", T.LongType()),
            T.StructField("afrz", T.BooleanType()),
            # acfg
            T.StructField("caid", T.LongType()),
            T.StructField("apar", _asset_params()),
            # appl
            T.StructField("apid", T.LongType()),
            T.StructField("apan", T.LongType()),  # on-completion
            T.StructField("apat", T.ArrayType(T.BinaryType())),  # accounts
            T.StructField("apap", T.BinaryType()),  # approval program
            T.StructField("apsu", T.BinaryType()),  # clear program
            T.StructField("apaa", T.ArrayType(T.BinaryType())),  # app args
        ]
    )
    return T.StructType(
        [
            T.StructField("txid", T.StringType()),  # precomputed at import (A15)
            T.StructField("txn", txn_body),
            # signature fields for sig-type classification (sig_type.go:45-64)
            T.StructField("sig", T.BinaryType()),
            T.StructField("msig_present", T.BooleanType()),
            T.StructField("lsig_present", T.BooleanType()),
            T.StructField("lsig_sig", T.BinaryType()),
            T.StructField("lsig_msig_present", T.BooleanType()),
            T.StructField("ad", apply_data),
        ]
    )


def delta_schema() -> T.StructType:
    """Ledger state delta (FIXTURES A.3; writer.go:354-374)."""
    acct = T.StructType(
        [
            T.StructField("addr", T.BinaryType()),
            T.StructField("microalgos", UINT64),
            T.StructField("rewards_base", T.LongType()),
            T.StructField("rewards_total", UINT64),
            T.StructField("status", T.LongType()),  # 0 offline / 1 online / 2 not-part
            T.StructField("auth_addr", T.BinaryType()),
            T.StructField("total_apps", T.LongType()),
            T.StructField("total_assets", T.LongType()),
            T.StructField("total_boxes", T.LongType()),
            T.StructField("total_box_bytes", T.LongType()),
        ]
    )
    asset_res = T.StructType(
        [
            T.StructField("aidx", T.LongType()),
            T.StructField("addr", T.BinaryType()),
            T.StructField("params_deleted", T.BooleanType()),
            T.StructField("params", _asset_params()),
            T.StructField("holding_deleted", T.BooleanType()),
            T.StructField(
                "holding",
                T.StructType(
                    [
                        T.StructField("amount", UINT64),
                        T.StructField("frozen", T.BooleanType()),
                    ]
                ),
            ),
        ]
    )
    app_res = T.StructType(
        [
            T.StructField("aidx", T.LongType()),
            T.StructField("addr", T.BinaryType()),
            T.StructField("params_deleted", T.BooleanType()),
            T.StructField(
                "params",
                T.StructType(
                    [
                        T.StructField("approv", T.BinaryType()),
                        T.StructField("clearp", T.BinaryType()),
                        T.StructField("global_state", _teal_kv()),
                        T.StructField("lsch", _state_schema()),
                        T.StructField("gsch", _state_schema()),
                    ]
                ),
            ),
            T.StructField("state_deleted", T.BooleanType()),
            T.StructField(
                "local_state",
                T.StructType(
                    [
                        T.StructField("schema", _state_schema()),
                        T.StructField("key_value", _teal_kv()),
                    ]
                ),
            ),
        ]
    )
    kv_mod = T.StructType(
        [
            T.StructField("key", T.BinaryType()),  # composite box key (app || name)
            T.StructField("value", T.BinaryType()),  # null ⇒ physical delete
        ]
    )
    return T.StructType(
        [
            T.StructField("accts", T.ArrayType(acct)),
            T.StructField("asset_resources", T.ArrayType(asset_res)),
            T.StructField("app_resources", T.ArrayType(app_res)),
            T.StructField("kv_mods", T.ArrayType(kv_mod)),
        ]
    )


def block_schema(depth: int = TXN_DEPTH) -> T.StructType:
    """One row per block (FIXTURES A.1)."""
    return T.StructType(
        [
            T.StructField("round", T.LongType(), nullable=False),
            T.StructField("timestamp", T.LongType()),  # unix seconds
            T.StructField("genesis_id", T.StringType()),
            T.StructField("genesis_hash", T.BinaryType()),
            T.StructField("rewards_level", T.LongType()),
            T.StructField("txn_counter", T.LongType()),
            T.StructField("fee_sink", T.BinaryType()),
            T.StructField("rewards_pool", T.BinaryType()),
            T.StructField("payset", T.ArrayType(txn_schema(depth))),
            T.StructField("delta", delta_schema()),
        ]
    )


# ---------------------------------------------------------------------------
# The nine maintained tables (setup_cockroachdb.sql:7-122; SURVEY §1.4)
# ---------------------------------------------------------------------------

BLOCK_HEADER = T.StructType(
    [
        T.StructField("round", T.LongType(), nullable=False),
        T.StructField("realtime", T.TimestampType()),
        T.StructField("rewardslevel", T.LongType()),
        T.StructField("header", T.StringType()),  # canonical JSON
    ]
)

TXN = T.StructType(
    [
        T.StructField("round", T.LongType(), nullable=False),
        T.StructField("intra", T.IntegerType(), nullable=False),
        T.StructField("typeenum", T.ShortType()),
        T.StructField("asset", T.LongType()),
        T.StructField("txid", T.StringType()),  # NULL on inner txns
        T.StructField("txn", T.StringType()),  # canonical JSON
        T.StructField("extra", T.StringType()),  # {"root-intra":..,"root-txid":..}
    ]
)

TXN_PARTICIPATION = T.StructType(
    [
        T.StructField("addr", T.BinaryType(), nullable=False),
        T.StructField("round", T.LongType(), nullable=False),
        T.StructField("intra", T.IntegerType(), nullable=False),
    ]
)

ACCOUNT = T.StructType(
    [
        T.StructField("addr", T.BinaryType(), nullable=False),
        T.StructField("microalgos", UINT64),
        T.StructField("rewardsbase", T.LongType()),
        T.StructField("rewards_total", UINT64),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("created_at", T.LongType()),
        T.StructField("closed_at", T.LongType()),
        T.StructField("keytype", T.StringType()),  # sig/msig/lsig
        T.StructField("account_data", T.StringType()),  # canonical JSON
    ]
)

ACCOUNT_ASSET = T.StructType(
    [
        T.StructField("addr", T.BinaryType(), nullable=False),
        T.StructField("assetid", T.LongType(), nullable=False),
        T.StructField("amount", UINT64),
        T.StructField("frozen", T.BooleanType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("created_at", T.LongType()),
        T.StructField("closed_at", T.LongType()),
    ]
)

ASSET = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("creator_addr", T.BinaryType()),
        T.StructField("params", T.StringType()),  # canonical JSON
        T.StructField("deleted", T.BooleanType()),
        T.StructField("created_at", T.LongType()),
        T.StructField("closed_at", T.LongType()),
    ]
)

METASTATE = T.StructType(
    [
        T.StructField("k", T.StringType(), nullable=False),
        T.StructField("v", T.StringType()),
    ]
)

APP = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("creator", T.BinaryType()),
        T.StructField("params", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("created_at", T.LongType()),
        T.StructField("closed_at", T.LongType()),
    ]
)

ACCOUNT_APP = T.StructType(
    [
        T.StructField("addr", T.BinaryType(), nullable=False),
        T.StructField("app", T.LongType(), nullable=False),
        T.StructField("localstate", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("created_at", T.LongType()),
        T.StructField("closed_at", T.LongType()),
    ]
)

APP_BOX = T.StructType(
    [
        T.StructField("app", T.LongType(), nullable=False),
        T.StructField("name", T.BinaryType(), nullable=False),
        T.StructField("value", T.BinaryType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "block_header": BLOCK_HEADER,
    "txn": TXN,
    "txn_participation": TXN_PARTICIPATION,
    "account": ACCOUNT,
    "account_asset": ACCOUNT_ASSET,
    "asset": ASSET,
    "metastate": METASTATE,
    "app": APP,
    "account_app": ACCOUNT_APP,
    "app_box": APP_BOX,
}

# primary keys (sql:7-122) — MERGE keys for the state tables, dedup keys for facts
TABLE_KEYS: dict[str, list[str]] = {
    "block_header": ["round"],
    "txn": ["round", "intra"],
    "txn_participation": ["addr", "round", "intra"],
    "account": ["addr"],
    "account_asset": ["addr", "assetid"],
    "asset": ["id"],
    "metastate": ["k"],
    "app": ["id"],
    "account_app": ["addr", "app"],
    "app_box": ["app", "name"],
}

# txn type → enum (txn_type_enum.go:16-33)
TXN_TYPE_ENUM: dict[str, int] = {
    "pay": 1,
    "keyreg": 2,
    "acfg": 3,
    "axfer": 4,
    "afrz": 5,
    "appl": 6,
    "stpf": 7,
}
