"""Bucketed copy-on-write parquet store with MERGE semantics.

The reference maintains its nine tables with `INSERT ... ON CONFLICT`
prepared statements inside serializable transactions (writer.go:39-114,
util.go:43-68).  The Spark-native equivalent is a lakehouse MERGE; since
this environment has bare parquet only, this module implements the minimal
table format those semantics need:

- every table is a manifest (JSON) pointing at immutable parquet files;
- **state tables** are hash-bucketed by primary key.  A MERGE folds the
  update stream per key, touches ONLY the buckets containing updated keys,
  and rewrites just those buckets into a new version (copy-on-write at
  bucket granularity) — untouched buckets are carried by reference.  At
  100 TB with e.g. 4096 buckets, a block's worth of account updates
  rewrites a handful of buckets, not the table;
- **fact tables** (txn, txn_participation, block_header) are append-only;
  each appended file records its (min_round, max_round) so readers prune
  files by round range — the scan-side replacement for the reference's
  B-tree PK index;
- manifest swap is atomic (os.replace).  Production would swap a
  transactional catalog (Delta/Iceberg) in behind the same API.

Idempotence contract (SURVEY A2/A19): the ingest layer gates on the round
high-water mark, so re-delivered micro-batches are skipped before they
reach the store; fact appends additionally dedup on PK within the batch.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkroach.chain.schemas import TABLE_KEYS, TABLE_SCHEMAS

DEFAULT_BUCKETS = 16  # local test default; cluster deployments use 1024+

STATE_TABLES = (
    "account",
    "account_asset",
    "asset",
    "app",
    "account_app",
    "app_box",
    "metastate",
)
FACT_TABLES = ("block_header", "txn", "txn_participation")


@dataclass
class Manifest:
    version: int = 0
    # state tables: bucket id (as str) → relative parquet dir
    buckets: dict[str, str] = field(default_factory=dict)
    # fact tables: [{path, min_round, max_round, rows}]
    files: list[dict] = field(default_factory=list)

    @classmethod
    def load(cls, path: str) -> "Manifest":
        if not os.path.exists(path):
            return cls()
        with open(path) as f:
            d = json.load(f)
        return cls(version=d["version"], buckets=d.get("buckets", {}), files=d.get("files", []))

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {"version": self.version, "buckets": self.buckets, "files": self.files},
                f,
            )
        os.replace(tmp, path)


class ChainStore:
    """The nine maintained tables under one base directory."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        n_buckets: int = DEFAULT_BUCKETS,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.n_buckets = n_buckets
        os.makedirs(base_dir, exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.base_dir, table, "manifest.json")


    def _snapshot_path(self, table: str, version: int) -> str:
        return os.path.join(
            self.base_dir, table, f"manifest.v{version:06d}.json"
        )

    def _commit(self, table: str, m: Manifest) -> None:
        """Atomically publish the new manifest AND retain it as an
        immutable snapshot — the data files are already copy-on-write,
        so retained snapshots make every committed version readable
        (time travel) until :meth:`vacuum` reclaims it."""
        m.save(self._manifest_path(table))
        m.save(self._snapshot_path(table, m.version))

    def _manifest(self, table: str, version: int | None = None) -> Manifest:
        if version is None:
            return Manifest.load(self._manifest_path(table))
        snap = self._snapshot_path(table, version)
        if not os.path.exists(snap):
            raise ValueError(
                f"{table}: snapshot v{version} is not retained "
                f"(never committed, or reclaimed by vacuum); available: "
                f"{self.snapshot_versions(table)}"
            )
        return Manifest.load(snap)

    def snapshot_versions(self, table: str) -> list[int]:
        """Committed versions currently readable via time travel."""
        import glob as _glob

        out = []
        for p in _glob.glob(
            os.path.join(self.base_dir, table, "manifest.v*.json")
        ):
            name = os.path.basename(p)
            out.append(int(name[len("manifest.v"):-len(".json")]))
        return sorted(out)

    def vacuum(self, table: str, keep_snapshots: int = 2) -> tuple[int, int]:
        """Reclaim copy-on-write storage: retain the newest
        ``keep_snapshots`` snapshot manifests (the live manifest is
        always among them — it IS the newest snapshot) and delete every
        version directory no retained manifest references, plus the
        expired snapshot files.  The Delta-VACUUM analog for this store;
        time travel then reaches exactly the retained versions.

        Returns (version_dirs_deleted, snapshots_expired)."""
        import glob as _glob
        import shutil as _shutil

        assert keep_snapshots >= 1
        tdir = os.path.join(self.base_dir, table)
        versions = self.snapshot_versions(table)
        retained = set(versions[-keep_snapshots:])
        manifests = [self._manifest(table)] + [
            self._manifest(table, v) for v in retained
        ]
        referenced: set[str] = set()
        for m in manifests:
            for rel in list(m.buckets.values()) + [e["path"] for e in m.files]:
                # dir-granular GC: the version dir is the reclaim unit
                referenced.add(rel.split("/")[0])
        dirs_deleted = 0
        for d in _glob.glob(os.path.join(tdir, "v*")):
            if os.path.isdir(d) and os.path.basename(d) not in referenced:
                _shutil.rmtree(d)
                dirs_deleted += 1
        snaps_deleted = 0
        for v in versions:
            if v not in retained:
                os.remove(self._snapshot_path(table, v))
                snaps_deleted += 1
        return dirs_deleted, snaps_deleted

    def _new_version_dir(self, table: str, version: int) -> str:
        d = os.path.join(self.base_dir, table, f"v{version:06d}")
        os.makedirs(d, exist_ok=True)
        return d

    def _empty(self, table: str) -> DataFrame:
        return self.spark.createDataFrame([], TABLE_SCHEMAS[table])

    def _bucket_col(self, table: str) -> F.Column:
        """PK → bucket id, via a PORTABLE hash (md5 of a canonical key
        string) rather than Spark's Murmur3: the same function is
        computable driver-side (:meth:`bucket_of`), which is what lets a
        point read open ONE bucket instead of scanning the table — the
        store-side replacement for the reference's B-tree PK point reads
        (setup_cockroachdb.sql PKs)."""
        parts = []
        for k in TABLE_KEYS[table]:
            f = TABLE_SCHEMAS[table][k]
            if isinstance(f.dataType, T.BinaryType):
                parts.append(F.hex(F.col(k)))
            else:
                parts.append(F.col(k).cast("string"))
        canon = F.concat_ws("\x1f", *parts)
        h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
        return F.pmod(h, F.lit(self.n_buckets))

    def bucket_of(self, table: str, key: tuple) -> int:
        """Driver-side mirror of :meth:`_bucket_col` for point reads."""
        import hashlib

        parts = []
        for k, v in zip(TABLE_KEYS[table], key):
            f = TABLE_SCHEMAS[table][k]
            if isinstance(f.dataType, T.BinaryType):
                parts.append(bytes(v).hex().upper())  # Spark hex() is uppercase
            else:
                parts.append(str(v))
        canon = "\x1f".join(parts)
        h = int(hashlib.md5(canon.encode("utf-8")).hexdigest()[:8], 16)
        return h % self.n_buckets

    # -- reads ----------------------------------------------------------------

    def read(
        self,
        table: str,
        min_round: int | None = None,
        max_round: int | None = None,
        key: tuple | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Current snapshot — or, with ``version``, TIME TRAVEL to any
        retained committed version (the data files are copy-on-write and
        every commit retains its manifest until vacuum, so an old version
        is just an old file listing).  For fact tables a round range
        prunes files before Spark ever lists them (manifest min/max
        stats).  For state tables a full PK ``key`` prunes to the ONE
        bucket that can hold it (portable-hash bucketing) — a point read
        touches 1/n_buckets of the table, like the reference's B-tree PK
        lookup.  The key predicate itself is still applied by the caller;
        this only narrows the file listing."""
        m = self._manifest(table, version)
        schema = TABLE_SCHEMAS[table]
        if table in STATE_TABLES:
            if key is not None:
                b = str(self.bucket_of(table, key))
                paths = [m.buckets[b]] if b in m.buckets else []
            else:
                paths = sorted(set(m.buckets.values()))
        else:
            paths = [
                e["path"]
                for e in m.files
                if (min_round is None or e["max_round"] >= min_round)
                and (max_round is None or e["min_round"] <= max_round)
            ]
        if not paths:
            return self._empty(table)
        abs_paths = [os.path.join(self.base_dir, table, p) for p in paths]
        df = self.spark.read.schema(schema).parquet(*abs_paths)
        if table in FACT_TABLES:
            if min_round is not None:
                df = df.where(F.col("round") >= min_round)
            if max_round is not None:
                df = df.where(F.col("round") <= max_round)
        return df

    # -- fact append ----------------------------------------------------------

    def append_facts(self, table: str, rows: DataFrame) -> int:
        """Append-only write, idempotent across redelivery.

        In-batch PK dedup (ON CONFLICT DO NOTHING within the batch) PLUS a
        per-table applied-round watermark: rows at or below the highest
        round already in the manifest are dropped before writing.  Fact
        rounds are strictly monotone (the ingest gate orders them), so the
        watermark makes a replayed batch a no-op even when the crash
        happened AFTER this table's append but BEFORE the metastate commit
        — the reference's "txn tables can only be ahead, never behind"
        invariant (cockroach.go:189-199, unique-violation tolerance).  The
        watermark is free: it is the max over the manifest's per-file
        max_round stats, no data read.

        File-level (min_round, max_round) stats are collected with
        ``observe()`` during the write job itself — one pass over the data,
        no re-scan of the output (at 100 TB a stats re-read would double
        the append's IO)."""
        assert table in FACT_TABLES, table
        from pyspark.sql import Observation

        m = self._manifest(table)
        watermark = max((e["max_round"] for e in m.files), default=None)
        if watermark is not None:
            rows = rows.where(F.col("round") > watermark)

        keys = TABLE_KEYS[table]
        obs = Observation()
        rows = rows.dropDuplicates(keys).observe(
            obs,
            F.min("round").alias("lo"),
            F.max("round").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        version = m.version + 1
        vdir = self._new_version_dir(table, version)
        out = os.path.join(vdir, "data")
        rows.write.mode("overwrite").parquet(out)
        stats = obs.get
        if stats["n"] == 0:
            return 0
        m.files.append(
            {
                "path": os.path.relpath(out, os.path.join(self.base_dir, table)),
                "min_round": stats["lo"],
                "max_round": stats["hi"],
                "rows": stats["n"],
                "ts": time.time(),
            }
        )
        m.version = version
        self._commit(table, m)
        return stats["n"]

    def compact_facts(
        self, table: str, target_rows: int = 1_000_000
    ) -> tuple[int, int]:
        """OPTIMIZE-style small-file compaction for a fact table.

        Per-micro-batch appends necessarily create one file set per batch;
        at mainnet cadence that is thousands of small files per day — the
        classic lakehouse ingest pathology.  This maintenance pass greedily
        groups round-adjacent manifest files until ``target_rows`` and
        rewrites each group as one file set, preserving the per-file
        (min_round, max_round) stats the reader prunes on.  Round ranges
        stay disjoint (appends are round-monotone), so pruning selectivity
        is unchanged; the round watermark (max over max_round) is
        byte-identical before and after.  Runs out-of-band like any
        OPTIMIZE job; the manifest swap is atomic.

        Returns (files_before, files_after)."""
        assert table in FACT_TABLES, table
        m = self._manifest(table)
        before = len(m.files)
        ordered = sorted(m.files, key=lambda e: e["min_round"])
        groups: list[list[dict]] = []
        cur: list[dict] = []
        cur_rows = 0
        for e in ordered:
            if cur and cur_rows + e["rows"] > target_rows:
                groups.append(cur)
                cur, cur_rows = [], 0
            cur.append(e)
            cur_rows += e["rows"]
        if cur:
            groups.append(cur)
        if all(len(g) == 1 for g in groups):
            return before, before  # nothing to merge

        version = m.version + 1
        vdir = self._new_version_dir(table, version)
        new_files: list[dict] = []
        for gi, g in enumerate(groups):
            if len(g) == 1:
                new_files.append(g[0])
                continue
            paths = [os.path.join(self.base_dir, table, e["path"]) for e in g]
            out = os.path.join(vdir, f"g{gi:04d}")
            self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(*paths).write.mode(
                "overwrite"
            ).parquet(out)
            new_files.append(
                {
                    "path": os.path.relpath(out, os.path.join(self.base_dir, table)),
                    "min_round": min(e["min_round"] for e in g),
                    "max_round": max(e["max_round"] for e in g),
                    "rows": sum(e["rows"] for e in g),
                    "ts": time.time(),
                }
            )
        m.files = new_files
        m.version = version
        self._commit(table, m)
        return before, len(new_files)

    def delete_facts_below(self, table: str, keep_round: int) -> int:
        """Pruning (A25): drop whole files above the cutoff for free; rewrite
        the single boundary-straddling file."""
        assert table in FACT_TABLES
        m = self._manifest(table)
        version = m.version + 1
        kept: list[dict] = []
        dropped_rows = 0
        rewrite: list[dict] = []
        for e in m.files:
            if e["min_round"] >= keep_round:
                kept.append(e)
            elif e["max_round"] < keep_round:
                dropped_rows += e["rows"]
            else:
                rewrite.append(e)
        if rewrite:
            vdir = self._new_version_dir(table, version)
            paths = [os.path.join(self.base_dir, table, e["path"]) for e in rewrite]
            df = (
                self.spark.read.schema(TABLE_SCHEMAS[table])
                .parquet(*paths)
                .where(F.col("round") >= keep_round)
            )
            out = os.path.join(vdir, "data")
            df.write.mode("overwrite").parquet(out)
            stats = (
                self.spark.read.parquet(out)
                .agg(F.min("round").alias("lo"), F.max("round").alias("hi"), F.count("*").alias("n"))
                .collect()[0]
            )
            before = sum(e["rows"] for e in rewrite)
            dropped_rows += before - stats["n"]
            if stats["n"]:
                kept.append(
                    {
                        "path": os.path.relpath(out, os.path.join(self.base_dir, table)),
                        "min_round": stats["lo"],
                        "max_round": stats["hi"],
                        "rows": stats["n"],
                        "ts": time.time(),
                    }
                )
        m.files = kept
        m.version = version
        self._commit(table, m)
        return int(dropped_rows)

    # -- state MERGE ----------------------------------------------------------

    def merge_state(
        self,
        table: str,
        folded: DataFrame,
        merge_cols: dict[str, F.Column],
        touch_keys: DataFrame | None = None,
        touch_all: bool = False,
    ) -> None:
        """Copy-on-write MERGE: ``folded`` is one row per key (the ingest
        layer folds the update stream first) with whatever helper columns
        ``merge_cols`` references via ``u.<col>`` / ``e.<col>``.

        merge_cols maps every output column to an expression over the
        updates (alias ``u``) joined to existing rows (alias ``e``); an
        expression sees NULL ``e.*`` for a brand-new key, exactly as under
        a left join (physically the merge runs one FULL OUTER join so the
        fold and the bucket scan execute once — untouched rows in a dirty
        bucket carry over on the e-only side of the same join).  Rows
        where merge_cols['__drop__'] (optional) evaluates true are
        physically removed (app_box delete).  NULL-evaluating ``__drop__``
        expressions KEEP the row (the filter is
        ``~coalesce(present & drop, false)`` — null-safe, so e-only
        carry-overs and three-valued-logic NULLs are never swept); a
        caller that wants NULL to mean delete must coalesce its own
        expression.  Pinned by
        test_merge_drop_null_evaluates_to_keep.

        ``touch_keys`` (optional) is any DataFrame carrying the table's key
        columns for every updated key (duplicates fine — typically the
        UN-folded update stream).  When given, the touched-bucket set is
        collected from that cheap projection (column pruning strips the
        fold/UDF/join work) and the full fold chain runs exactly once,
        inside the write job — instead of being materialized into cache
        just to learn the bucket list.  One pass over the updates, not two.

        ``touch_all`` skips the touched-bucket discovery job entirely and
        treats every bucket as dirty.  The ingest layer sets it when its
        (already-collected) update count says the batch is dense enough
        that essentially every bucket collides anyway — the discovery job
        would cost a Spark job to learn "all of them".  Sparse updates (the
        100 TB steady state, thousands of buckets) keep the pruned path.
        """
        # metastate has its own driver-side commit path (merge_metastate);
        # its single-file layout is incompatible with hash-bucket touch sets
        assert table != "metastate", "use merge_metastate"
        keys = TABLE_KEYS[table]
        m = self._manifest(table)
        version = m.version + 1

        cached = touch_keys is None and not touch_all
        if touch_all:
            folded = folded.withColumn("__bucket", self._bucket_col(table))
            touched = list(range(self.n_buckets))
        else:
            if cached:
                folded = folded.withColumn("__bucket", self._bucket_col(table)).cache()
                key_src = folded
            else:
                folded = folded.withColumn("__bucket", self._bucket_col(table))
                key_src = touch_keys.withColumn("__bucket", self._bucket_col(table))
            touched = [
                r["__bucket"] for r in key_src.select("__bucket").distinct().collect()
            ]
        if not touched:
            if cached:
                folded.unpersist()
            return

        # existing rows from touched buckets only
        paths = [
            os.path.join(self.base_dir, table, m.buckets[str(b)])
            for b in touched
            if str(b) in m.buckets
        ]
        if paths:
            existing = self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(*paths)
        else:
            existing = self._empty(table)
        existing = existing.withColumn("__bucket", self._bucket_col(table))
        existing = existing.where(F.col("__bucket").isin(touched))

        # One FULL OUTER join replaces the old (u LEFT JOIN e) ∪ (e ANTI u)
        # pair: the fold subtree over the update stream and the
        # existing-bucket parquet scan each execute ONCE instead of twice,
        # sharing one key exchange (the anti-join used to re-run the whole
        # grouped fold just to produce its key list, and re-read every
        # touched bucket file).  A row is an update when its u side is
        # present, an untouched carry-over when only e is present; the
        # merge_cols expressions see exactly the nullability the old left
        # join gave them in both cases.
        u = folded.withColumn("__present", F.lit(True)).alias("u")
        e = existing.alias("e")
        cond = [F.col(f"u.{k}") == F.col(f"e.{k}") for k in keys]

        drop_expr = merge_cols.get("__drop__")
        upd_present = F.col("u.__present").isNotNull()
        out_cols = [
            F.when(upd_present, expr).otherwise(F.col(f"e.{name}")).alias(name)
            for name, expr in merge_cols.items()
            if name != "__drop__"
        ]
        new_data = u.join(e, cond, "full_outer")
        if drop_expr is not None:
            # drop only matched/update rows the caller marks (__drop__ is
            # an expression over u/e); carried-over e-only rows never drop
            new_data = new_data.where(
                ~F.coalesce(upd_present & drop_expr, F.lit(False))
            )
        new_data = new_data.select(
            *out_cols,
            F.coalesce(F.col("u.__bucket"), F.col("e.__bucket")).alias("__bucket"),
        )

        vdir = self._new_version_dir(table, version)
        new_data.write.mode("overwrite").partitionBy("__bucket").parquet(vdir)

        rel = os.path.relpath(vdir, os.path.join(self.base_dir, table))
        for b in touched:
            bucket_dir = os.path.join(vdir, f"__bucket={b}")
            if os.path.exists(bucket_dir):
                m.buckets[str(b)] = f"{rel}/__bucket={b}"
            else:
                # all rows in this bucket were deleted
                m.buckets.pop(str(b), None)
        m.version = version
        self._commit(table, m)
        if cached:
            folded.unpersist()

    # -- metastate convenience -------------------------------------------------

    def _read_metastate_dict(self) -> dict[str, str]:
        import glob

        import pyarrow.parquet as pq

        m = self._manifest("metastate")
        out: dict[str, str] = {}
        for rel in sorted(set(m.buckets.values())):
            p = os.path.join(self.base_dir, "metastate", rel)
            files = [p] if os.path.isfile(p) else sorted(
                glob.glob(os.path.join(p, "*.parquet"))
            )
            for f in files:
                t = pq.read_table(f, columns=["k", "v"])
                out.update(zip(t.column("k").to_pylist(), t.column("v").to_pylist()))
        return out

    def get_metastate(self, key: str) -> str | None:
        return self._read_metastate_dict().get(key)

    def merge_metastate(self, updates: dict[str, str]) -> None:
        """Driver-side commit for the bounded control table (≤6 keys,
        schema/metastate.go:4-11) — the moral equivalent of a transaction-log
        write.  Launching a Spark MERGE job for a 2-row upsert costs ~1 s of
        pure scheduling; a driver parquet write costs milliseconds and keeps
        the same manifest-swap atomicity."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        kv = self._read_metastate_dict()
        kv.update(updates)
        m = self._manifest("metastate")
        version = m.version + 1
        vdir = self._new_version_dir("metastate", version)
        out = os.path.join(vdir, "data.parquet")
        ks = sorted(kv)
        pq.write_table(
            pa.table({"k": ks, "v": [kv[k] for k in ks]}),
            out,
        )
        m.buckets = {
            "0": os.path.relpath(out, os.path.join(self.base_dir, "metastate"))
        }
        m.version = version
        m.save(self._manifest_path("metastate"))

    def set_metastate(self, key: str, value: str) -> None:
        self.merge_metastate({key: value})
