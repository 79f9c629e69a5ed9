"""Canonical encoding: byte-stable JSON, addresses, txids, page tokens.

Re-implements the reference's canonical codec semantics
(internal/encoding/encoding.go:19-28: sorted keys, omit-empty,
map-keys-as-string) from its published behavior:

- empty values (0, "", b"", [], {}, None, False) are omitted
  (encoding.go omit-empty struct tags, types.go:101-116);
- bytes render as std base64 strings; map keys that are arbitrary bytes
  become base64 string keys (byteArray.MarshalText types.go:32-48; golden
  {"/w==":3} encoding_test.go:255-275);
- keys sort lexicographically (Canonical=true);
- asset name/unit/url: printable UTF-8 wins the plain field, otherwise the
  value moves to the *64 base64 field (encoding.go:123-148);
- addresses inside block headers render as algod base32 text
  (AlgodEncodedAddress encoding.go:54-70).

This is driver-side/UDF Python — the hot path stays in column expressions;
canonical JSON is produced once per row at ingest by a vectorized UDF (see
chain.transforms).
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
from decimal import Decimal
from typing import Any

# ---------------------------------------------------------------------------
# canonical JSON
# ---------------------------------------------------------------------------


def _is_empty(v: Any) -> bool:
    if v is None or v is False:
        return True
    if isinstance(v, (int, Decimal)) and not isinstance(v, bool) and v == 0:
        return True
    if isinstance(v, float) and v == 0.0:
        return True
    if isinstance(v, (str, bytes, bytearray, list, tuple, dict)) and len(v) == 0:
        return True
    return False


def _canonicalize(v: Any) -> Any:
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, Decimal):
        return int(v)
    if isinstance(v, dict):
        out = {}
        for k, val in v.items():
            # prune bottom-up: a nested document that becomes empty after
            # its own pruning is itself omitted
            cv = _canonicalize(val)
            if _is_empty(cv):
                continue
            if isinstance(k, (bytes, bytearray)):
                k = base64.b64encode(bytes(k)).decode("ascii")
            out[str(k)] = cv
        return out
    if isinstance(v, (list, tuple)):
        return [_canonicalize(x) for x in v]
    return v


def canonical_json(obj: Any) -> str:
    """Byte-stable canonical JSON: sorted keys, omit-empty, b64 bytes.

    `json.dumps(sort_keys=True, separators=(',', ':'))` matches the Go
    canonical encoder's layout (no whitespace, lexicographic keys).
    """
    canon = _canonicalize(obj)
    if isinstance(canon, dict):
        canon = {k: canon[k] for k in sorted(canon)}
    return json.dumps(canon, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def trim_account_data(acct: dict[str, Any]) -> dict[str, Any]:
    """Zero the fields stored in dedicated columns before JSON-ing the rest
    (TrimLcAccountData encoding.go:640-668): microalgos, rewards base/total
    live in their own columns."""
    trimmed = dict(acct)
    for k in ("microalgos", "rewards_base", "rewards_total", "addr"):
        trimmed.pop(k, None)
    return trimmed


def _printable_utf8(b: bytes) -> str | None:
    try:
        s = b.decode("utf-8")
    except UnicodeDecodeError:
        return None
    return s if all(c.isprintable() for c in s) else None


def convert_asset_params(params: dict[str, Any]) -> dict[str, Any]:
    """Printable name/unit/url win the plain field; otherwise the bytes move
    to the *64 base64 fields (encoding.go:123-148; types.go:15-20)."""
    out = dict(params)
    for plain, b64field in (
        ("unit_name", "un64"),
        ("asset_name", "an64"),
        ("url", "au64"),
    ):
        raw = out.get(plain)
        if raw is None:
            continue
        if isinstance(raw, str):
            continue
        s = _printable_utf8(bytes(raw))
        if s is not None:
            out[plain] = s
        else:
            del out[plain]
            out[b64field] = bytes(raw)
    return out


# ---------------------------------------------------------------------------
# addresses / hashes
# ---------------------------------------------------------------------------

_B32_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def sha512_256(data: bytes) -> bytes:
    return hashlib.new("sha512_256", data).digest()


def encode_address(pubkey: bytes) -> str:
    """Algod base32 address text: pubkey + 4-byte sha512/256 checksum,
    base32 without padding (public Algorand address format;
    AlgodEncodedAddress encoding.go:54-70)."""
    if len(pubkey) != 32:
        raise ValueError(f"address must be 32 bytes, got {len(pubkey)}")
    checksum = sha512_256(pubkey)[-4:]
    return base64.b32encode(pubkey + checksum).decode("ascii").rstrip("=")


def decode_address(addr: str) -> bytes:
    padded = addr + "=" * ((8 - len(addr) % 8) % 8)
    raw = base64.b32decode(padded)
    pubkey, checksum = raw[:32], raw[32:]
    if sha512_256(pubkey)[-4:] != checksum:
        raise ValueError("address checksum mismatch")
    return pubkey


def synthetic_txid(canonical_txn_json: str) -> str:
    """Deterministic stand-in txid for synthetic fixtures: base32(sha512/256
    of 'TX' || canonical txn JSON), no padding.  Real deployments carry the
    importer-computed txid through the block stream (SURVEY A15: txid is an
    input column; the reference computes it from the SDK at ingest,
    write_txn.go:134)."""
    digest = sha512_256(b"TX" + canonical_txn_json.encode("utf-8"))
    return base64.b32encode(digest).decode("ascii").rstrip("=")


# ---------------------------------------------------------------------------
# pagination tokens (idb.go:56-100)
# ---------------------------------------------------------------------------


def encode_txn_next_token(round_: int, intra: int) -> str:
    """12-byte little-endian (uint64 round, uint32 intra) → base64url
    (idb.go:87-100)."""
    raw = struct.pack("<QI", round_, intra)
    return base64.urlsafe_b64encode(raw).decode("ascii").rstrip("=")


def decode_txn_next_token(token: str) -> tuple[int, int]:
    padded = token + "=" * ((4 - len(token) % 4) % 4)
    raw = base64.urlsafe_b64decode(padded)
    if len(raw) != 12:
        raise ValueError(f"expected 12-byte token, got {len(raw)}")
    round_, intra = struct.unpack("<QI", raw)
    return round_, intra


def count_inner_txns(txn_obj: Any) -> int:
    """Recursive inner-transaction count (countInner, idb.go:46-53) over a
    stored canonical txn document (dict or JSON string): each entry of
    ``ad.dt.itx`` counts 1 plus its own inners."""
    if txn_obj is None:
        return 0
    if isinstance(txn_obj, str):
        txn_obj = json.loads(txn_obj)
    inners = ((txn_obj.get("ad") or {}).get("dt") or {}).get("itx") or []
    return sum(1 + count_inner_txns(i) for i in inners)


def txn_row_next_token(
    round_: int,
    intra: int,
    root_intra: int | None,
    ascending: bool,
    txn_json: str | None,
    root_txn_json: str | None,
) -> str:
    """TxnRow.Next (idb.go:56-84): the keyset token for the page AFTER this
    row.

    - an inner row initializes intra to its ROOT's intra (so a descending
      page skips the whole subtree — inners sort after the root DESC);
    - ascending adds countInner(root) so the next ascending page starts
      past every inner of the root instead of re-returning resolved inners.
    """
    if root_intra is not None:
        intra = root_intra
    if ascending:
        stxn = root_txn_json if root_txn_json is not None else txn_json
        if stxn is None:
            raise ValueError("Next() was not given transaction")
        intra += count_inner_txns(stxn)
    return encode_txn_next_token(round_, intra)


# ---------------------------------------------------------------------------
# sig-type classification (sig_type.go:45-64)
# ---------------------------------------------------------------------------


def sig_type(
    sig: bytes | None,
    msig_present: bool | None,
    lsig_present: bool | None,
    lsig_sig: bytes | None,
    lsig_msig_present: bool | None,
) -> str | None:
    """sig → 'sig'; msig → 'msig'; lsig: inner sig wins 'sig', inner msig
    wins 'msig', else 'lsig'."""
    if sig:
        return "sig"
    if msig_present:
        return "msig"
    if lsig_present:
        if lsig_sig:
            return "sig"
        if lsig_msig_present:
            return "msig"
        return "lsig"
    return None
