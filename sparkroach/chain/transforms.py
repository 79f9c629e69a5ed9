"""Pure DataFrame transforms: one micro-batch of blocks → per-table rows.

Each function is ``DataFrame[block_schema] → DataFrame[table rows]`` with no
side effects — the deterministic plan SURVEY §3.1 calls for.  The reference
equivalents are cited per function.

Design notes for scale:
- the txn-tree flatten (A14) is level-by-level ``posexplode`` — each level
  is one narrow projection of the previous, no shuffle at all; the preorder
  ``intra`` rank is a single window over ``round`` (blocks are independent,
  so the window key is round — thousands of small groups, no skew);
- every per-row derivation (typeenum, asset id, participants, keytype) is a
  JVM column expression; the ONLY Python is the canonical-JSON codec, an
  Arrow-batched pandas UDF applied once per emitted row (correctness
  requires Python string semantics per SURVEY §1.3);
- participation is `explode(array_distinct(...))` — map-side only.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from sparkroach.chain import encoding
from sparkroach.chain.schemas import TXN_DEPTH, TXN_TYPE_ENUM, UINT64

# ---------------------------------------------------------------------------
# canonical JSON pandas UDFs (the sanctioned Python path)
# ---------------------------------------------------------------------------


def _prune(v: Any) -> Any:
    """Recursively drop omit-empty values (0, '', [], {}, false, null)."""
    if isinstance(v, dict):
        out = {}
        for k, val in v.items():
            pv = _prune(val)
            if encoding._is_empty(pv):
                continue
            out[k] = pv
        return out
    if isinstance(v, list):
        return [_prune(x) for x in v]
    return v


def _canon_txn(raw: str | None, is_root: bool) -> str | None:
    if raw is None:
        return None
    obj = json.loads(raw)
    if not is_root:
        # inner rows are stored without their own nested inners
        # (write_txn.go:88-94; asserted writer_test.go:1439)
        obj.get("ad", {}).get("dt", {}).pop("itx", None)
    obj.pop("txid", None)  # txid lives in its own column
    # asset params: non-printable name/unit/url move to *64 base64 fields
    apar = obj.get("txn", {}).get("apar")
    if apar:
        for plain, b64f in (("unit_name", "un64"), ("asset_name", "an64"), ("url", "au64")):
            raw_b64 = apar.get(plain)
            if raw_b64 is None:
                continue
            # to_json rendered the binary field as base64 already
            import base64 as _b64

            data = _b64.b64decode(raw_b64)
            s = encoding._printable_utf8(data)
            if s is not None:
                apar[plain] = s
            else:
                del apar[plain]
                apar[b64f] = raw_b64
    pruned = _prune(obj)
    return json.dumps(pruned, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


@pandas_udf(T.StringType())
def canonical_txn_json(raw: pd.Series, is_root: pd.Series) -> pd.Series:
    return pd.Series(
        [_canon_txn(r, bool(b)) for r, b in zip(raw, is_root)], dtype=object
    )


@pandas_udf(T.StringType())
def derive_txid(canonical_json: pd.Series) -> pd.Series:
    """Ingest-time txid derivation: base32-no-pad(SHA-512/256('TX' ||
    canonical txn bytes)) — the executable analog of the reference's
    crypto.TransactionIDString at ingest (write_txn.go:134).  Deviation,
    documented: the reference hashes the canonical *msgpack* encoding via
    the SDK; this engine's blocks arrive as structured columns, so the
    canonical JSON bytes are the hashing domain.  Same construction
    (domain-separation prefix 'TX', SHA-512/256, base32), deterministic,
    collision-resistant — and identical to encoding.synthetic_txid so
    fixtures and ingest agree."""
    import base64 as _b64
    import hashlib as _hl

    def one(s: str | None) -> str | None:
        if s is None:
            return None
        d = _hl.new("sha512_256", b"TX" + s.encode("utf-8")).digest()
        return _b64.b32encode(d).decode("ascii").rstrip("=")

    return canonical_json.map(one)


def _canon_asset_params(raw: str | None) -> str | None:
    """Asset params canonicalizer: printable unit/name/url stay plain text,
    non-printable bytes move to the *64 fields (encoding.go:123-148)."""
    if raw is None:
        return None
    import base64 as _b64

    obj = json.loads(raw)
    for plain, b64f in (("unit_name", "un64"), ("asset_name", "an64"), ("url", "au64")):
        raw_b64 = obj.get(plain)
        if raw_b64 is None:
            continue
        data = _b64.b64decode(raw_b64)
        s = encoding._printable_utf8(data)
        if s is not None:
            obj[plain] = s
        else:
            del obj[plain]
            obj[b64f] = raw_b64
    return json.dumps(
        _prune(obj), sort_keys=True, separators=(",", ":"), ensure_ascii=False
    )


@pandas_udf(T.StringType())
def canonical_asset_params_json(raw: pd.Series) -> pd.Series:
    return pd.Series([_canon_asset_params(r) for r in raw], dtype=object)


@pandas_udf(T.StringType())
def canonical_json_udf(raw: pd.Series) -> pd.Series:
    """Generic canonicalizer for header / account_data / params documents."""

    def conv(r):
        if r is None:
            return None
        return json.dumps(
            _prune(json.loads(r)), sort_keys=True, separators=(",", ":"),
            ensure_ascii=False,
        )

    return pd.Series([conv(r) for r in raw], dtype=object)


# ---------------------------------------------------------------------------
# A5: block_header rows
# ---------------------------------------------------------------------------


def block_headers(blocks: DataFrame) -> DataFrame:
    """(round, realtime, rewardslevel, header) — writer.go:144-149.

    realtime = to UTC timestamp from unix seconds (writer.go:147); header =
    canonical JSON of the header fields (payset/delta excluded).
    """
    header_struct = F.to_json(
        F.struct(
            F.col("genesis_id").alias("gen"),
            F.col("genesis_hash").alias("gh"),
            F.col("round").alias("rnd"),
            F.col("timestamp").alias("ts"),
            F.col("rewards_level").alias("earn"),
            F.col("txn_counter").alias("tc"),
            F.col("fee_sink").alias("fees"),
            F.col("rewards_pool").alias("rwd"),
        )
    )
    return blocks.select(
        F.col("round"),
        F.timestamp_seconds(F.col("timestamp")).alias("realtime"),
        F.col("rewards_level").alias("rewardslevel"),
        canonical_json_udf(header_struct).alias("header"),
    )


# ---------------------------------------------------------------------------
# A14/A15/A16: txn-tree flatten with preorder intra
# ---------------------------------------------------------------------------


def _has_itx(struct_type: T.StructType) -> bool:
    """True if the txn struct at this level can still carry inner txns."""
    try:
        ad = struct_type["ad"].dataType
        dt = ad["dt"].dataType
        return "itx" in dt.fieldNames()
    except (KeyError, AttributeError):
        return False


def _level_columns(txn_col: str) -> list[Column]:
    """Uniform projection of one nesting level (typed struct → flat cols)."""
    t = F.col(txn_col)
    return [
        t["txid"].alias("input_txid"),
        t["txn"]["type"].alias("txtype"),
        t["txn"]["snd"].alias("snd"),
        t["txn"]["rekey"].alias("rekey"),
        t["txn"]["rcv"].alias("rcv"),
        t["txn"]["close"].alias("close"),
        t["txn"]["asnd"].alias("asnd"),
        t["txn"]["arcv"].alias("arcv"),
        t["txn"]["aclose"].alias("aclose"),
        t["txn"]["fadd"].alias("fadd"),
        t["txn"]["apat"].alias("apat"),
        t["txn"]["xaid"].alias("xaid"),
        t["txn"]["faid"].alias("faid"),
        t["txn"]["caid"].alias("caid"),
        t["txn"]["apid"].alias("apid"),
        t["ad"]["caid"].alias("ad_caid"),
        t["ad"]["apid"].alias("ad_apid"),
        t["ad"]["aca"].alias("ad_aca"),
        t["sig"].alias("sig"),
        t["msig_present"].alias("msig_present"),
        t["lsig_present"].alias("lsig_present"),
        t["lsig_sig"].alias("lsig_sig"),
        t["lsig_msig_present"].alias("lsig_msig_present"),
        F.to_json(t).alias("txn_raw_json"),
    ]


def flatten_txns(blocks: DataFrame, depth: int = TXN_DEPTH) -> DataFrame:
    """Preorder DFS over payset + inner txns (yieldInnerTransactions,
    write_txn.go:68-110) as iterative posexplode.

    Each row carries ``path`` (positions from the root) whose lexicographic
    order IS preorder; ``intra`` = dense preorder rank per round.  Inner
    rows: txid NULL, root_intra/root_txid set (write_txn.go:88-94).
    """
    pos6 = lambda: F.lpad(F.col("pos").cast("string"), 6, "0")  # noqa: E731

    base = blocks.select(
        "round",
        "txn_counter",
        F.size("payset").alias("payset_len"),
        F.posexplode_outer("payset").alias("pos", "t"),
    ).where(F.col("t").isNotNull())

    parent = base.select(
        "round", "txn_counter", "payset_len",
        F.array(pos6()).alias("path"),
        F.col("pos").alias("root_pos"),
        F.col("t")["txid"].alias("root_txid"),
        F.col("t").alias("t"),
    )
    levels = [
        parent.select(
            "round", "txn_counter", "payset_len", "path", "root_pos",
            F.lit(True).alias("is_root"),
            "root_txid",
            *_level_columns("t"),
        )
    ]
    for _ in range(1, depth):
        t_type = parent.schema["t"].dataType
        if not _has_itx(t_type):
            break
        child = parent.select(
            "round", "txn_counter", "payset_len", "root_pos", "root_txid",
            F.col("path").alias("parent_path"),
            F.posexplode_outer(F.col("t")["ad"]["dt"]["itx"]).alias("pos", "t"),
        ).where(F.col("t").isNotNull())
        child = child.withColumn(
            "path", F.concat(F.col("parent_path"), F.array(pos6()))
        ).drop("parent_path")
        levels.append(
            child.select(
                "round", "txn_counter", "payset_len", "path", "root_pos",
                F.lit(False).alias("is_root"),
                "root_txid",
                *_level_columns("t"),
            )
        )
        parent = child
    if len(levels) == 1:
        # No inner-txn levels: preorder degenerates to payset order, so
        # intra == root_pos and every row is its own root.  Skipping both
        # windows keeps the whole flatten narrow (explode + project, zero
        # shuffles) — the common case on payment-heavy traffic, selected
        # data-adaptively by the ingest layer's batch-wide inner count.
        return levels[0].withColumn(
            "intra", F.col("root_pos").cast("int")
        ).withColumn("root_intra", F.col("root_pos").cast("int"))

    rows = levels[0]
    for extra in levels[1:]:
        rows = rows.unionByName(extra)

    # lexicographic order of the zero-padded path IS preorder (parent's path
    # is a strict prefix of its children's; siblings order by position)
    w = Window.partitionBy("round").orderBy(F.array_join("path", "."))
    rows = rows.withColumn("intra", (F.row_number().over(w) - 1).cast("int"))

    # root_intra: the root is preorder-first within its (round, root_pos)
    # subtree, so its intra is the group minimum.  A window over a SUPERSET
    # of the rank window's partition keys reuses the same exchange (hash on
    # `round` already clusters (round, root_pos)) — no join, no second
    # shuffle, and no recomputation of the ranked branch as a join side.
    wg = Window.partitionBy("round", "root_pos")
    return rows.withColumn("root_intra", F.min("intra").over(wg))


def txns(
    blocks: DataFrame,
    depth: int = TXN_DEPTH,
    rows: DataFrame | None = None,
    derive_missing_txids: bool = False,
) -> DataFrame:
    """The `txn` table rows (yieldTransactions write_txn.go:113-157).

    Pass precomputed (cached) ``rows`` from :func:`flatten_txns` when
    deriving several tables from one batch — the flatten is the expensive
    shared stage (ingest does this).

    ``derive_missing_txids=True`` computes a txid at ingest for root rows
    whose payload carries none (the reference always computes txids itself,
    write_txn.go:134; SURVEY A15 made txid an input column — this flag
    closes that gap with :func:`derive_txid`).  Inner rows' ``extra``
    root-txid is back-filled from the derived root via a (round,
    root_intra) self-join against the root rows only — inner rows
    themselves always keep txid NULL (write_txn.go:88-94)."""
    rows = rows if rows is not None else flatten_txns(blocks, depth)
    te = F.lit(None).cast("short")
    for name, enum in TXN_TYPE_ENUM.items():
        te = F.when(F.col("txtype") == name, F.lit(enum).cast("short")).otherwise(te)

    nz = lambda c: F.when(F.col(c).isNotNull() & (F.col(c) != 0), F.col(c))  # noqa: E731
    counter_id = F.col("txn_counter") - F.col("payset_len") + F.col("intra") + 1
    asset = (
        F.when(F.col("txtype") == "appl", F.coalesce(nz("apid"), nz("ad_apid"), counter_id))
        .when(F.col("txtype") == "acfg", F.coalesce(nz("caid"), nz("ad_caid"), counter_id))
        .when(F.col("txtype") == "axfer", F.coalesce(nz("xaid"), F.lit(0)))
        .when(F.col("txtype") == "afrz", F.coalesce(nz("faid"), F.lit(0)))
        .otherwise(F.lit(0))
    )
    # extra is written for EVERY row (write_txn.go:136-142): root rows carry
    # TxnExtra{AssetCloseAmount} (omit-empty → "{}" when zero), inner rows
    # carry {root-intra, root-txid}.  aca is decimal(20,0) so the string
    # cast renders the bare integer.
    root_extra = F.when(
        F.col("ad_aca").isNotNull() & (F.col("ad_aca") != 0),
        F.concat(F.lit('{"aca":'), F.col("ad_aca").cast("string"), F.lit("}")),
    ).otherwise(F.lit("{}"))
    extra = F.when(
        ~F.col("is_root"),
        F.to_json(
            F.struct(
                F.col("root_intra").alias("root-intra"),
                F.col("root_txid").alias("root-txid"),
            )
        ),
    ).otherwise(root_extra)
    out = rows.select(
        "round",
        "intra",
        te.alias("typeenum"),
        asset.cast("long").alias("asset"),
        F.when(F.col("is_root"), F.col("input_txid")).alias("txid"),
        canonical_txn_json(F.col("txn_raw_json"), F.col("is_root")).alias("txn"),
        extra.alias("extra"),
        "is_root",
        "root_intra",
    )
    if not derive_missing_txids:
        return out.drop("is_root", "root_intra")
    out = out.withColumn(
        "txid",
        F.when(
            F.col("is_root") & F.col("txid").isNull(), derive_txid(F.col("txn"))
        ).otherwise(F.col("txid")),
    )
    roots = out.where("is_root").select(
        F.col("round").alias("_r_rnd"),
        F.col("intra").alias("_r_intra"),
        F.col("txid").alias("_r_txid"),
    )
    return (
        out.join(
            roots,
            (out["round"] == roots["_r_rnd"])
            & (out["root_intra"] == roots["_r_intra"]),
            "left",
        )
        .withColumn(
            "extra",
            F.when(
                ~F.col("is_root"),
                F.to_json(
                    F.struct(
                        F.col("root_intra").alias("root-intra"),
                        F.col("_r_txid").alias("root-txid"),
                    )
                ),
            ).otherwise(F.col("extra")),
        )
        .select("round", "intra", "typeenum", "asset", "txid", "txn", "extra")
    )


# ---------------------------------------------------------------------------
# A18: participation
# ---------------------------------------------------------------------------


def participation(
    blocks: DataFrame, depth: int = TXN_DEPTH, rows: DataFrame | None = None
) -> DataFrame:
    """(addr, round, intra) — per-type roles, dedup, inners by direct
    participants only (write_txn_participation.go:14-110)."""
    rows = rows if rows is not None else flatten_txns(blocks, depth)
    base = F.array(F.col("snd"))
    by_type = (
        F.when(F.col("txtype") == "pay", F.concat(base, F.array("rcv", "close")))
        .when(
            F.col("txtype") == "axfer",
            F.concat(base, F.array("asnd", "arcv", "aclose")),
        )
        .when(F.col("txtype") == "afrz", F.concat(base, F.array("fadd")))
        .when(
            F.col("txtype") == "appl",
            F.concat(
                base,
                F.coalesce(F.col("apat"), F.expr("CAST(array() AS array<binary>)")),
            ),
        )
        .otherwise(base)
    )
    participants = F.array_distinct(
        F.filter(by_type, lambda a: a.isNotNull() & (F.length(a) > 0))
    )
    return (
        rows.select(
            "round", "intra", F.explode(participants).alias("addr")
        )
        .select("addr", "round", "intra")
    )


# ---------------------------------------------------------------------------
# A7: sig-type deltas (keytype per sender)
# ---------------------------------------------------------------------------


def sigtype_delta_rows(
    blocks: DataFrame, depth: int = TXN_DEPTH, rows: DataFrame | None = None
) -> DataFrame:
    """Pre-aggregation sig-type delta stream: one ``(round, intra, addr,
    keytype)`` row per delta-bearing root txn — the un-folded input to
    :func:`sigtype_deltas`.  Exposed so the account merge can fold it in
    the SAME ``groupBy(addr)`` as the balance-update stream (one exchange
    instead of two aggregations joined back together)."""
    rows = rows if rows is not None else flatten_txns(blocks, depth)
    rows = rows.where("is_root")
    keytype = (
        F.when(F.length("sig") > 0, F.lit("sig"))
        .when(F.col("msig_present"), F.lit("msig"))
        .when(F.col("lsig_present") & (F.length("lsig_sig") > 0), F.lit("sig"))
        .when(F.col("lsig_present") & F.col("lsig_msig_present"), F.lit("msig"))
        .when(F.col("lsig_present"), F.lit("lsig"))
    )
    cleared = (
        (F.col("rekey").isNotNull() & (F.length("rekey") > 0))
        | (F.col("txtype") == "stpf")
    )
    return rows.select(
        "round",
        "intra",
        F.col("snd").alias("addr"),
        F.when(cleared, F.lit(None).cast("string"))
        .otherwise(keytype)
        .alias("keytype"),
        (cleared | keytype.isNotNull()).alias("has_delta"),
    ).where("has_delta").drop("has_delta")


def sigtype_deltas(
    blocks: DataFrame, depth: int = TXN_DEPTH, rows: DataFrame | None = None
) -> DataFrame:
    """Per-sender last-wins keytype delta from ROOT txns (writer.go:155-179;
    sig_type.go:45-64).

    The reference emits an entry for EVERY root txn's sender: a rekeyed or
    stateproof txn contributes an EMPTY delta (present=false → keytype is
    set to NULL), a signed txn contributes its sig/msig/lsig class, and the
    sender's LAST root txn in payset order wins — so sig-txn-then-rekey in
    one batch must CLEAR keytype, not keep 'sig'.  Output is one row per
    sender with a nullable ``keytype`` (NULL = clear the column); the mere
    presence of a row means "a delta arrived" (writeAccount's
    optionalSigTypeDelta.present).

    Fixture-only corner: an eligible root txn carrying no signature at all
    is a hard error in the reference (sig_type.go:63); here such rows are
    excluded from the delta stream rather than failing the batch."""
    # last-wins over ALL delta-bearing root txns; the value rides inside a
    # (non-null) struct so max_by can carry a NULL keytype out of the agg
    return (
        sigtype_delta_rows(blocks, depth, rows)
        .groupBy("addr")
        .agg(
            F.max_by(
                F.struct(F.col("keytype")),
                F.struct(F.col("round"), F.col("intra")),
            ).alias("d")
        )
        .select(
            "addr",
            F.col("d.keytype").alias("keytype"),
            F.lit(True).alias("delta_present"),
        )
    )


# ---------------------------------------------------------------------------
# A8-A13: state-table update streams (one row per key-mutation, op-tagged)
# ---------------------------------------------------------------------------


def account_updates(blocks: DataFrame) -> DataFrame:
    """Account upsert/delete stream (writeAccount writer.go:186-225):
    microalgos == 0 ⇒ logical delete; account_data trimmed of the
    dedicated-column fields (TrimLcAccountData encoding.go:640-668)."""
    acct = blocks.select(
        "round", F.posexplode_outer("delta.accts").alias("pos", "a")
    ).where(F.col("a").isNotNull())
    is_delete = F.col("a.microalgos") == 0
    data_struct = F.to_json(
        F.struct(
            F.col("a.status").alias("onl"),
            F.col("a.auth_addr").alias("spend"),
            F.col("a.total_apps").alias("tapp"),
            F.col("a.total_assets").alias("tas"),
            F.col("a.total_boxes").alias("tbx"),
            F.col("a.total_box_bytes").alias("tbxb"),
        )
    )
    return acct.select(
        "round",
        "pos",
        F.col("a.addr").alias("addr"),
        F.when(is_delete, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.when(is_delete, F.lit(0).cast(UINT64))
        .otherwise(F.col("a.microalgos"))
        .alias("microalgos"),
        F.when(is_delete, F.lit(0)).otherwise(F.col("a.rewards_base")).alias(
            "rewardsbase"
        ),
        F.when(is_delete, F.lit(0).cast(UINT64))
        .otherwise(F.col("a.rewards_total"))
        .alias("rewards_total"),
        F.when(is_delete, F.lit("null")).otherwise(
            canonical_json_udf(data_struct)
        ).alias("account_data"),
    )


def asset_updates(blocks: DataFrame) -> DataFrame:
    """asset table stream (writeAssetResource writer.go:227-249)."""
    res = blocks.select(
        "round", F.posexplode_outer("delta.asset_resources").alias("pos", "r")
    ).where(F.col("r").isNotNull() & (F.col("r.params_deleted") | F.col("r.params").isNotNull()))
    params_json = F.to_json(F.col("r.params"))
    return res.select(
        "round",
        "pos",
        F.col("r.aidx").alias("id"),
        F.col("r.addr").alias("creator_addr"),
        F.when(F.col("r.params_deleted"), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.when(F.col("r.params_deleted"), F.lit("null"))
        .otherwise(canonical_asset_params_json(params_json))
        .alias("params"),
    )


def account_asset_updates(blocks: DataFrame) -> DataFrame:
    """account_asset stream (writer.go:239-248); amount is numeric(20,0)."""
    res = blocks.select(
        "round", F.posexplode_outer("delta.asset_resources").alias("pos", "r")
    ).where(
        F.col("r").isNotNull()
        & (F.col("r.holding_deleted") | F.col("r.holding").isNotNull())
    )
    return res.select(
        "round",
        "pos",
        F.col("r.addr").alias("addr"),
        F.col("r.aidx").alias("assetid"),
        F.when(F.col("r.holding_deleted"), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.when(F.col("r.holding_deleted"), F.lit(0).cast(UINT64))
        .otherwise(F.col("r.holding.amount"))
        .alias("amount"),
        F.when(F.col("r.holding_deleted"), F.lit(False))
        .otherwise(F.coalesce(F.col("r.holding.frozen"), F.lit(False)))
        .alias("frozen"),
    )


def app_updates(blocks: DataFrame) -> DataFrame:
    """app table stream (writeAppResource writer.go:251-271)."""
    res = blocks.select(
        "round", F.posexplode_outer("delta.app_resources").alias("pos", "r")
    ).where(
        F.col("r").isNotNull() & (F.col("r.params_deleted") | F.col("r.params").isNotNull())
    )
    params_json = F.to_json(F.col("r.params"))
    return res.select(
        "round",
        "pos",
        F.col("r.aidx").alias("id"),
        F.col("r.addr").alias("creator"),
        F.when(F.col("r.params_deleted"), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.when(F.col("r.params_deleted"), F.lit("null"))
        .otherwise(canonical_json_udf(params_json))
        .alias("params"),
    )


def account_app_updates(blocks: DataFrame) -> DataFrame:
    """account_app stream (writer.go:262-270)."""
    res = blocks.select(
        "round", F.posexplode_outer("delta.app_resources").alias("pos", "r")
    ).where(
        F.col("r").isNotNull()
        & (F.col("r.state_deleted") | F.col("r.local_state").isNotNull())
    )
    ls_json = F.to_json(F.col("r.local_state"))
    return res.select(
        "round",
        "pos",
        F.col("r.addr").alias("addr"),
        F.col("r.aidx").alias("app"),
        F.when(F.col("r.state_deleted"), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.when(F.col("r.state_deleted"), F.lit("null"))
        .otherwise(canonical_json_udf(ls_json))
        .alias("localstate"),
    )


def box_updates(blocks: DataFrame) -> DataFrame:
    """app_box stream (writeBoxMods writer.go:302-321): composite key splits
    into (app, name) — the key layout is 'bx' + 8-byte big-endian app + name
    (public apps.SplitBoxKey semantics); null data ⇒ physical delete."""
    kv = blocks.select(
        "round", F.posexplode_outer("delta.kv_mods").alias("pos", "m")
    ).where(F.col("m").isNotNull())
    key = F.col("m.key")
    # substr is 1-based; skip the 2-byte 'bx' prefix, take 8 bytes of app id
    app_bytes = F.substring(key, 3, 8)
    app_id = F.conv(F.hex(app_bytes), 16, 10).cast("long")
    name = F.expr("substring(m.key, 11, length(m.key) - 10)")
    return kv.select(
        "round",
        "pos",
        app_id.alias("app"),
        name.alias("name"),
        F.when(F.col("m.value").isNull(), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("m.value").alias("value"),
    )


def special_accounts(blocks: DataFrame) -> DataFrame:
    """metastate 'accounts' upsert (writer.go:151-154) — latest block wins."""
    last = blocks.orderBy(F.col("round").desc()).limit(1)
    v = F.to_json(
        F.struct(
            F.col("fee_sink").alias("FeeSink"),
            F.col("rewards_pool").alias("RewardsPool"),
        )
    )
    return last.select(F.lit("accounts").alias("k"), v.alias("v"))
