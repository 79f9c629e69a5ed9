"""Synthetic block-stream fixtures (FIXTURES.md §A), mirroring the
scenarios of the reference's writer_test.go."""

from __future__ import annotations

from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sparkroach.chain.schemas import block_schema

ADDR_A = b"\x01" * 32
ADDR_B = b"\x02" * 32
ADDR_C = b"\x03" * 32
ADDR_D = b"\x04" * 32
FEE_SINK = b"\xfe" * 32
REWARDS_POOL = b"\xaa" * 32
GENESIS_HASH = b"\x42" * 32


def pay_txn(
    txid: str,
    snd: bytes = ADDR_A,
    rcv: bytes = ADDR_B,
    amt: int = 1000,
    close: bytes | None = None,
    note: bytes | None = None,
    sig: bytes | None = b"\x11" * 64,
    rekey: bytes | None = None,
    inners: list[dict] | None = None,
    closing_amount: int = 0,
) -> dict[str, Any]:
    return {
        "txid": txid,
        "txn": {
            "type": "pay",
            "snd": snd,
            "rcv": rcv,
            "amt": Decimal(amt),
            "close": close,
            "note": note,
            "rekey": rekey,
            "fee": 1000,
            "fv": 1,
            "lv": 1000,
        },
        "sig": sig,
        "ad": {
            "ca": Decimal(closing_amount),
            "dt": {"itx": inners} if inners is not None else None,
        },
    }


def axfer_txn(
    txid: str,
    xaid: int,
    aamt: int,
    snd: bytes = ADDR_A,
    arcv: bytes = ADDR_B,
    asnd: bytes | None = None,
    aclose: bytes | None = None,
    msig: bool = False,
) -> dict[str, Any]:
    return {
        "txid": txid,
        "txn": {
            "type": "axfer",
            "snd": snd,
            "xaid": xaid,
            "aamt": Decimal(aamt),
            "arcv": arcv,
            "asnd": asnd,
            "aclose": aclose,
            "fee": 1000,
        },
        "sig": None if msig else b"\x11" * 64,
        "msig_present": msig,
    }


def appl_txn(
    txid: str,
    apid: int = 0,
    snd: bytes = ADDR_A,
    apat: list[bytes] | None = None,
    inners: list[dict] | None = None,
    created_apid: int | None = None,
    lsig: bool = False,
) -> dict[str, Any]:
    return {
        "txid": txid,
        "txn": {
            "type": "appl",
            "snd": snd,
            "apid": apid,
            "apat": apat,
            "fee": 1000,
        },
        "sig": None if lsig else b"\x11" * 64,
        "lsig_present": lsig,
        "ad": {
            "apid": created_apid,
            "dt": {"itx": inners} if inners is not None else None,
        },
    }


def acct_delta(
    addr: bytes,
    microalgos: int,
    rewards_base: int = 0,
    rewards_total: int = 0,
    status: int = 0,
    auth_addr: bytes | None = None,
    total_boxes: int = 0,
    total_box_bytes: int = 0,
) -> dict[str, Any]:
    return {
        "addr": addr,
        "microalgos": Decimal(microalgos),
        "rewards_base": rewards_base,
        "rewards_total": Decimal(rewards_total),
        "status": status,
        "auth_addr": auth_addr,
        "total_boxes": total_boxes,
        "total_box_bytes": total_box_bytes,
    }


def asset_resource(
    aidx: int,
    addr: bytes,
    params: dict | None = None,
    params_deleted: bool = False,
    holding: dict | None = None,
    holding_deleted: bool = False,
) -> dict[str, Any]:
    return {
        "aidx": aidx,
        "addr": addr,
        "params_deleted": params_deleted,
        "params": params,
        "holding_deleted": holding_deleted,
        "holding": holding,
    }


def app_resource(
    aidx: int,
    addr: bytes,
    params: dict | None = None,
    params_deleted: bool = False,
    local_state: dict | None = None,
    state_deleted: bool = False,
) -> dict[str, Any]:
    return {
        "aidx": aidx,
        "addr": addr,
        "params_deleted": params_deleted,
        "params": params,
        "state_deleted": state_deleted,
        "local_state": local_state,
    }


def box_key(app: int, name: bytes) -> bytes:
    """Composite box key: 'bx' + 8-byte big-endian app id + name (public
    apps.MakeBoxKey layout)."""
    return b"bx" + app.to_bytes(8, "big") + name


def make_block(
    round_: int,
    payset: list[dict] | None = None,
    accts: list[dict] | None = None,
    asset_resources: list[dict] | None = None,
    app_resources: list[dict] | None = None,
    kv_mods: list[tuple[bytes, bytes | None]] | None = None,
    timestamp: int = 1_700_000_000,
    txn_counter: int = 1000,
) -> dict[str, Any]:
    return {
        "round": round_,
        "timestamp": timestamp + round_,
        "genesis_id": "test-v1",
        "genesis_hash": GENESIS_HASH,
        "rewards_level": 0,
        "txn_counter": txn_counter,
        "fee_sink": FEE_SINK,
        "rewards_pool": REWARDS_POOL,
        "payset": payset or [],
        "delta": {
            "accts": accts or [],
            "asset_resources": asset_resources or [],
            "app_resources": app_resources or [],
            "kv_mods": [{"key": k, "value": v} for k, v in (kv_mods or [])],
        },
    }


def blocks_df(spark: SparkSession, blocks: list[dict]) -> DataFrame:
    return spark.createDataFrame(blocks, block_schema())
