"""Streaming-ingest soak: sustained stream_ingest + JDBC mirror under a kill.

VERDICT r6 item 4: the unit chaos tests prove the exactly-once envelope on
4-block feeds, and SCALE.md §12 measures batch-size scaling of the bare
`add_blocks` harness; what neither measures is the REAL streaming entry
(`ChainDB.stream_ingest`, sparkroach/chain/ingest.py) with the JDBC mirror
attached, sustained over thousands of blocks, killed mid-run, and proven
row-for-row equal at the end.  This harness does exactly that:

  1. spins up a throwaway PostgreSQL (initdb/pg_ctl, statements via psql
     subprocesses — same transport the real-postgres test tier uses,
     tests/test_jdbc_postgres.py, because the container ships the server
     binaries but no client library);
  2. synthesizes a block feed — payment paysets, account deltas, and box
     create→delete cycles whose delete lands MANY micro-batches after the
     mirrored create (the r5-ADVICE mirror-divergence case);
  3. runs ``stream_ingest(stream, ckpt, mirror=...)`` over the feed in
     fixed micro-batches, KILLS the query mid-run (a hard ``q.stop()``
     while batches are in flight — checkpoint state arbitrary), restarts
     on the same checkpoint, and runs to completion;
  4. measures sustained blocks/s per phase and the restart-to-first-new-
     round recovery time, then asserts postgres equals the COW store
     row-for-row on every table (jsonb compared structurally).

Reference parity: the reference ingests one block per Receive() call
against CockroachDB (exporter.go:131-148) with the facts-ahead invariant
(cockroach.go:189-199); here the same invariant is cross-sink (store
ahead of mirror, never behind) and the soak proves it converges under a
mid-run kill at three-digit block counts, not a 4-block unit feed.

CLI::

    python -m sparkroach.soak --blocks 2048 --batch 64 --payset 10

prints one JSON object; the measured 2048-block numbers live in
SCALE.md §13.  Requires the postgres server binaries and a ``postgres``
user; exits with an explanatory error otherwise (probed, never faked).
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import subprocess
import tempfile
import time
from contextlib import contextmanager
from decimal import Decimal

GENESIS = b"\x5a" * 32
_PG_BINS = ("initdb", "pg_ctl", "psql", "createdb")


# ---------------------------------------------------------------------------
# ephemeral postgres + psql transport (the no-client-library mirror wiring)
# ---------------------------------------------------------------------------


def have_postgres() -> bool:
    if any(shutil.which(b) is None for b in _PG_BINS):
        return False
    try:
        subprocess.run(
            ["id", "postgres"], check=True, capture_output=True, cwd="/tmp"
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    return True


def _su(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        check=True,
        capture_output=True,
        text=True,
        cwd="/tmp",
    )


@contextmanager
def ephemeral_postgres():
    """initdb → pg_ctl start → createdb; yields {sock, db}; always stops."""
    base = tempfile.mkdtemp(prefix="sparkroach_soak_pg_")
    os.chmod(base, 0o777)
    shutil.chown(base, user="postgres")
    data = os.path.join(base, "data")
    _su(f"initdb -D {data} -A trust")
    _su(
        f"pg_ctl -D {data} -o '-k {base} -c listen_addresses=' "
        f"-l {base}/log -w start"
    )
    _su(f"createdb -h {base} sparkroach_soak")
    try:
        yield {"sock": base, "db": "sparkroach_soak"}
    finally:
        try:
            _su(f"pg_ctl -D {data} -w -m immediate stop")
        finally:
            shutil.rmtree(base, ignore_errors=True)


def psql(pg_info, sql: str, tuples: bool = False) -> str:
    # SQL travels on STDIN (-f -), not argv: soak-scale multi-row INSERTs
    # exceed Linux's 128 KiB per-argument limit (E2BIG) through -c
    args = [
        "psql", "-h", pg_info["sock"], "-U", "postgres", "-d", pg_info["db"],
        "-v", "ON_ERROR_STOP=1", "-X", "-q", "-f", "-",
    ] + (["-tA", "-F", "\t"] if tuples else [])
    out = subprocess.run(
        args, input=sql, check=True, capture_output=True, text=True,
        cwd="/tmp",
    )
    return out.stdout


def pg_query(pg_info, sql: str) -> list[list[str]]:
    raw = psql(pg_info, sql, tuples=True)
    return [line.split("\t") for line in raw.splitlines() if line]


def _lit(v) -> str:
    """One SQL literal (untyped strings coerce to jsonb/bytea as needed)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (bytes, bytearray)):
        return "'\\x" + bytes(v).hex() + "'::bytea"
    if isinstance(v, (int, Decimal)):
        return str(v)
    if isinstance(v, datetime.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    return "'" + str(v).replace("'", "''") + "'"


def pg_text(v) -> str:
    """Expected psql -tA rendering of a store value (non-jsonb columns)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    if isinstance(v, Decimal):
        return str(int(v))
    if isinstance(v, datetime.datetime):
        s = v.isoformat(sep=" ")
        if "." in s:
            # postgres trims ALL trailing zeros of fractional seconds
            # (.120000 renders as .12, .000000 as no fraction at all)
            s = s.rstrip("0").rstrip(".")
        return s
    return str(v)


def make_mirror(pg_info):
    """A JdbcMirror whose statement/bulk transports are psql subprocesses.

    The bulk mover declares staging columns from the TARGET table's DDL
    (jsonb/bytea merge without casts) and moves rows as one multi-row
    INSERT — the unit-scale stand-in for COPY FROM STDIN, identical to
    the real-postgres test tier's wiring."""
    from sparkroach.chain.schemas import TABLE_SCHEMAS
    from sparkroach.sinks import jdbc

    def bulk(table: str, df, mode: str) -> None:
        if mode == "overwrite":
            base = (
                table[: -len("_staging")]
                if table.endswith("_staging")
                else table
            )
            typed = (
                dict(col.split(" ", 1) for col in jdbc.column_ddl(base))
                if base in TABLE_SCHEMAS
                else {}
            )
            cols = []
            for f in df.schema.fields:
                pg_t = (
                    typed.get(f.name)
                    or jdbc._TYPE_MAP[f.dataType.simpleString()]
                )
                cols.append(f"{f.name} {pg_t}")
            psql(pg_info, f"DROP TABLE IF EXISTS {table}")
            psql(pg_info, f"CREATE TABLE {table} ({', '.join(cols)})")
        rows = df.collect()
        if not rows:
            return
        names = [f.name for f in df.schema.fields]
        for lo in range(0, len(rows), 500):  # bounded statement size
            values = ", ".join(
                "(" + ", ".join(_lit(r[c]) for c in names) + ")"
                for r in rows[lo : lo + 500]
            )
            psql(
                pg_info,
                f"INSERT INTO {table} ({', '.join(names)}) VALUES {values}",
            )

    return jdbc.JdbcMirror(
        "jdbc:postgresql:unused",
        execute=lambda sql: psql(pg_info, sql),
        bulk_write=bulk,
    )


# ---------------------------------------------------------------------------
# block feed
# ---------------------------------------------------------------------------

BOX_APP = 7
BOX_CREATE_EVERY = 16  # a box is created at rounds r ≡ 1 (mod 16) ...
BOX_DELETE_AFTER = 33  # ... and deleted 33 rounds (2+ micro-batches) later


def _box_key(name: bytes) -> bytes:
    return b"bx" + BOX_APP.to_bytes(8, "big") + name


def _make_block(r: int, n_txns: int) -> dict:
    payset = [
        {
            "txid": f"S{r}_{i}",
            "txn": {
                "type": "pay",
                "snd": bytes([i % 250 + 1]) * 32,
                "rcv": bytes([(i + 1) % 250 + 1]) * 32,
                "amt": Decimal(100 + (r + i) % 1000),
                "fee": 1000,
            },
            "sig": b"\x11" * 64,
        }
        for i in range(n_txns)
    ]
    kv_mods = []
    if r % BOX_CREATE_EVERY == 1:
        kv_mods.append(
            {"key": _box_key(f"b{r}".encode()), "value": f"v{r}".encode()}
        )
    born = r - BOX_DELETE_AFTER
    if born >= 0 and born % BOX_CREATE_EVERY == 1:
        kv_mods.append({"key": _box_key(f"b{born}".encode()), "value": None})
    return {
        "round": r,
        "timestamp": 1_700_000_000 + r,
        "genesis_id": "soak",
        "genesis_hash": GENESIS,
        "rewards_level": 0,
        "txn_counter": 100 + r,
        "fee_sink": b"\xfe" * 32,
        "rewards_pool": b"\xaa" * 32,
        "payset": payset if r > 0 else [],
        "delta": {
            "accts": [
                {
                    "addr": bytes([i % 250 + 1]) * 32,
                    "microalgos": Decimal(10**6 + r * 100 + i),
                }
                for i in range(min(n_txns, 8))
            ]
            if r > 0
            else [],
            "asset_resources": [],
            "app_resources": [],
            "kv_mods": kv_mods,
        },
    }


def write_feed(spark, feed_dir: str, n_blocks: int, batch: int, n_txns: int):
    """One json file per micro-batch of ``batch`` blocks (the stream reads
    with maxFilesPerTrigger=1, so the file IS the micro-batch)."""
    from sparkroach.chain.schemas import block_schema

    for lo in range(0, n_blocks, batch):
        blocks = [_make_block(r, n_txns) for r in range(lo, min(lo + batch, n_blocks))]
        (
            spark.createDataFrame(blocks, block_schema())
            .repartition(1)
            .write.mode("append")
            .format("json")
            .save(feed_dir)
        )


# ---------------------------------------------------------------------------
# the soak
# ---------------------------------------------------------------------------


def _run_stream(spark, db, mirror, feed: str, ckpt: str, kill_at_round=None):
    """One stream_ingest run over the feed.  With ``kill_at_round``, hard-
    stop the query the moment the store's next_round reaches it (batches
    in flight, checkpoint state arbitrary) and return; otherwise wait for
    availableNow completion.  Returns (wall_s, first_progress_s)."""
    from sparkroach.chain.schemas import block_schema

    stream = (
        spark.readStream.schema(block_schema())
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    start_round = db.next_round()
    t0 = time.time()
    q = db.stream_ingest(stream, ckpt, available_now=True, mirror=mirror)
    first_new = None
    try:
        while q.isActive:
            if first_new is None and db.next_round() > start_round:
                first_new = time.time() - t0
            if kill_at_round is not None and db.next_round() >= kill_at_round:
                q.stop()
                break
            time.sleep(0.05)
        q.awaitTermination(600)
        if q.exception() is not None:
            raise RuntimeError(f"stream failed: {q.exception()}")
    finally:
        if q.isActive:  # pragma: no cover - defensive
            q.stop()
    return round(time.time() - t0, 2), (
        round(first_new, 2) if first_new is not None else None
    )


def verify_mirror_equals_store(pg_info, db) -> dict:
    """Row-for-row store-vs-postgres equality on every table (the same
    comparison the real-postgres test tier pins, at soak scale)."""
    from sparkroach.chain.schemas import TABLE_KEYS, TABLE_SCHEMAS
    from sparkroach.sinks import jdbc

    out = {}
    for t in TABLE_SCHEMAS:
        names = [f.name for f in TABLE_SCHEMAS[t].fields]
        pk = ", ".join(TABLE_KEYS[t])
        got = pg_query(pg_info, f"SELECT {', '.join(names)} FROM {t} ORDER BY {pk}")
        # typed sort key: ints must sort numerically to match the pg
        # ORDER BY (str() would put round 10 before round 2); bytes→hex
        # preserves bytea byte order exactly
        want = sorted(
            db.store.read(t).collect(),
            key=lambda r: tuple(
                bytes(v).hex() if isinstance(v, (bytes, bytearray)) else v
                for v in (r[k] for k in TABLE_KEYS[t])
            ),
        )
        if len(got) != len(want):
            raise AssertionError(f"{t}: pg={len(got)} store={len(want)}")
        for g, w in zip(got, want):
            for i, name in enumerate(names):
                if (t, name) in jdbc._JSONB_COLS:
                    if json.loads(g[i]) != (
                        json.loads(w[name]) if w[name] is not None else None
                    ):
                        raise AssertionError(f"{t}.{name}: {g[i]!r} != {w[name]!r}")
                elif g[i] != pg_text(w[name]):
                    raise AssertionError(
                        f"{t}.{name}: pg={g[i]!r} store={w[name]!r}"
                    )
        out[t] = len(want)
    return out


def run_soak(
    spark,
    n_blocks: int = 2048,
    batch: int = 64,
    n_txns: int = 10,
    with_mirror: bool = True,
) -> dict:
    report: dict = {
        "n_blocks": n_blocks,
        "batch": batch,
        "payset_per_block": n_txns,
        "mirror": with_mirror,
    }
    base = tempfile.mkdtemp(prefix="sparkroach_soak_")
    try:
        if with_mirror:
            return _run_soak_in(spark, base, report, n_blocks, batch, n_txns)
        return _run_soak_bare(spark, base, report, n_blocks, batch, n_txns)
    finally:
        # the feed + COW store + checkpoint are the disk footprint —
        # reclaim them on failure too, not just on the success path
        shutil.rmtree(base, ignore_errors=True)


def _run_soak_bare(
    spark, base: str, report: dict, n_blocks: int, batch: int, n_txns: int
) -> dict:
    """The no-mirror control: the identical streaming run (same feed,
    same kill/restart protocol) with the store as the only sink —
    isolates the psql-transport cost from the engine's own streaming
    ceiling (SCALE.md §13)."""
    from sparkroach.chain.ingest import ChainDB

    feed = os.path.join(base, "feed")
    ckpt = os.path.join(base, "ckpt")
    t0 = time.time()
    write_feed(spark, feed, n_blocks, batch, n_txns)
    report["feed_write_wall_s"] = round(time.time() - t0, 2)
    db = ChainDB(spark, os.path.join(base, "chain"), n_buckets=8)
    db.load_genesis(
        [{"addr": b"\x01" * 32, "microalgos": 10**12}], genesis_hash=GENESIS
    )
    kill_at = n_blocks // 3
    wall_a, _ = _run_stream(
        spark, db, None, feed, ckpt, kill_at_round=kill_at
    )
    rounds_a = db.next_round()
    report["phase_a"] = {
        "wall_s": wall_a,
        "rounds_ingested": rounds_a,
        "blocks_per_s": round(rounds_a / wall_a, 2),
        "killed_at_round": kill_at,
    }
    t0 = time.time()
    wall_b, first_new = _run_stream(spark, db, None, feed, ckpt)
    rounds_b = db.next_round() - rounds_a
    report["phase_b"] = {
        "wall_s": wall_b,
        "recovery_to_first_new_round_s": first_new,
        "rounds_ingested": rounds_b,
        "blocks_per_s": round(rounds_b / wall_b, 2),
    }
    assert db.next_round() == n_blocks, (db.next_round(), n_blocks)
    report["table_rows"] = {
        t: db.store.read(t).count()
        for t in ("block_header", "txn", "txn_participation", "app_box")
    }
    return report


def _run_soak_in(
    spark, base: str, report: dict, n_blocks: int, batch: int, n_txns: int
) -> dict:
    from sparkroach.chain.ingest import ChainDB

    feed = os.path.join(base, "feed")
    ckpt = os.path.join(base, "ckpt")
    t0 = time.time()
    write_feed(spark, feed, n_blocks, batch, n_txns)
    report["feed_write_wall_s"] = round(time.time() - t0, 2)

    with ephemeral_postgres() as pg_info:
        mirror = make_mirror(pg_info)
        db = ChainDB(spark, os.path.join(base, "chain"), n_buckets=8)
        db.load_genesis(
            [{"addr": b"\x01" * 32, "microalgos": 10**12}],
            genesis_hash=GENESIS,
        )
        mirror.init_schema()

        # phase A: run until ~1/3 of the feed, then KILL mid-flight
        kill_at = n_blocks // 3
        wall_a, _ = _run_stream(
            spark, db, mirror, feed, ckpt, kill_at_round=kill_at
        )
        rounds_a = db.next_round()
        report["phase_a"] = {
            "wall_s": wall_a,
            "rounds_ingested": rounds_a,
            "blocks_per_s": round(rounds_a / wall_a, 2),
            "killed_at_round": kill_at,
        }
        # the kill may leave the mirror behind the store (never ahead)
        pg_max = int(
            pg_query(pg_info, "SELECT coalesce(max(round), -1) FROM block_header")[0][0]
        )
        assert pg_max <= rounds_a - 1, (pg_max, rounds_a)
        report["phase_a"]["mirror_rounds_behind_store"] = rounds_a - 1 - pg_max

        # phase B: restart on the same checkpoint, run to completion —
        # first_new_round_s is the recovery time (checkpoint replay +
        # redelivered-batch no-op + first fresh commit)
        t0 = time.time()
        wall_b, first_new = _run_stream(spark, db, mirror, feed, ckpt)
        rounds_b = db.next_round() - rounds_a
        report["phase_b"] = {
            "wall_s": wall_b,
            "recovery_to_first_new_round_s": first_new,
            "rounds_ingested": rounds_b,
            "blocks_per_s": round(rounds_b / wall_b, 2),
        }
        assert db.next_round() == n_blocks, (db.next_round(), n_blocks)

        # end state: every table row-for-row, box create→delete included
        t0 = time.time()
        counts = verify_mirror_equals_store(pg_info, db)
        report["verify_wall_s"] = round(time.time() - t0, 2)
        report["table_rows"] = counts
        # the box plane must show real churn: live boxes are exactly the
        # creates younger than BOX_DELETE_AFTER (plus none deleted twice)
        expected_live = len(
            [
                r
                for r in range(n_blocks)
                if r % BOX_CREATE_EVERY == 1 and r + BOX_DELETE_AFTER >= n_blocks
            ]
        )
        assert counts["app_box"] == expected_live, (
            counts["app_box"],
            expected_live,
        )
        report["boxes_created"] = len(
            [r for r in range(n_blocks) if r % BOX_CREATE_EVERY == 1]
        )
        report["boxes_live_at_end"] = expected_live
    return report


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--payset", type=int, default=10)
    ap.add_argument(
        "--no-mirror", action="store_true",
        help="no-mirror control run: same feed/kill/restart, store-only "
        "sink — isolates the psql transport cost from the engine ceiling",
    )
    args = ap.parse_args()

    if not args.no_mirror and not have_postgres():
        raise SystemExit(
            "postgres server binaries / postgres user unavailable — the "
            "soak needs the real database (probed, never faked)"
        )
    from sparkroach.session import get_spark

    spark = get_spark("sparkroach-soak")
    try:
        print(
            json.dumps(
                run_soak(
                    spark,
                    args.blocks,
                    args.batch,
                    args.payset,
                    with_mirror=not args.no_mirror,
                )
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
