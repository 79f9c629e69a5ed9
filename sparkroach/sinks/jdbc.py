"""CockroachDB/Postgres JDBC mirror sink.

The reference's native sink IS CockroachDB (pgx prepared statements +
COPY, writer.go / write_txn.go).  This module lets the Spark engine keep a
byte-compatible external mirror: the same nine-table DDL
(setup_cockroachdb.sql:7-122), the same upsert conflict clauses
(writer.go:39-114), and the same serialization-retry envelope
(SQLSTATE 40001, util.go:17-68) — driven from ``foreachBatch``.

Write path per micro-batch (replaces A4/A17's prepared-batch + COPY):
1. fact tables: ``df.write.jdbc`` append with ``reWriteBatchedInserts=true``
   (Spark's parallel JDBC writer is the COPY-pipeline replacement);
2. state tables: append the folded updates to a staging table, then execute
   one server-side ``INSERT ... SELECT ... ON CONFLICT`` statement per
   table (generated here, mirroring writer.go clause-for-clause), inside
   the retry wrapper.

No database is available in this environment, so everything that needs a
connection is dependency-injected and the statement/DDL generation + retry
logic are unit-tested standalone (the reference does the same for its retry
loop, util_test.go:16-37).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from sparkroach.chain.schemas import TABLE_KEYS, TABLE_SCHEMAS

# Spark type → CockroachDB column type (SURVEY §1.2 inverse map)
_TYPE_MAP = {
    "bigint": "bigint",
    "int": "integer",
    "smallint": "smallint",
    "decimal(20,0)": "numeric(20,0)",
    "binary": "bytea",
    "string": "text",
    "timestamp": "timestamp without time zone",
    "boolean": "boolean",
}

# string columns that are jsonb in the reference schema (sql:11,24-25,52,...)
_JSONB_COLS = {
    ("block_header", "header"),
    ("txn", "txn"),
    ("txn", "extra"),
    ("account", "account_data"),
    ("asset", "params"),
    ("app", "params"),
    ("account_app", "localstate"),
    ("metastate", "v"),
}

# secondary indexes (sql:15,30,40,68,81,100,114)
_INDEXES = [
    "CREATE INDEX IF NOT EXISTS block_header_time ON block_header (realtime)",
    "CREATE INDEX IF NOT EXISTS txn_by_tixid ON txn (txid)",
    "CREATE UNIQUE INDEX IF NOT EXISTS txn_participation_idx "
    "ON txn_participation (addr, round DESC, intra DESC)",
    "CREATE INDEX IF NOT EXISTS account_asset_by_addr_partial "
    "ON account_asset (addr) WHERE NOT deleted",
    "CREATE INDEX IF NOT EXISTS asset_by_creator_deleted "
    "ON asset (creator_addr, deleted)",
    "CREATE INDEX IF NOT EXISTS app_by_creator_deleted ON app (creator, deleted)",
    "CREATE INDEX IF NOT EXISTS account_app_by_addr_partial "
    "ON account_app (addr) WHERE NOT deleted",
]


def column_ddl(table: str) -> list[str]:
    cols = []
    for f in TABLE_SCHEMAS[table].fields:
        spark_t = f.dataType.simpleString()
        if (table, f.name) in _JSONB_COLS:
            pg_t = "jsonb"
        else:
            pg_t = _TYPE_MAP[spark_t]
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"{f.name} {pg_t}{null}")
    return cols


def create_table_sql(table: str) -> str:
    cols = column_ddl(table)
    pk = ", ".join(TABLE_KEYS[table])
    body = ",\n  ".join(cols + [f"PRIMARY KEY ({pk})"])
    return f"CREATE TABLE IF NOT EXISTS {table} (\n  {body}\n)"


def schema_ddl() -> list[str]:
    """Full idempotent DDL: nine tables + reference indexes (A21)."""
    return [create_table_sql(t) for t in TABLE_SCHEMAS] + list(_INDEXES)


# ---------------------------------------------------------------------------
# upsert statement generation (writer.go:39-114 clause-for-clause)
# ---------------------------------------------------------------------------

# per-table: (conflict cols, update-set columns on upsert)
_UPSERT_SET = {
    "account": ["microalgos", "rewardsbase", "rewards_total", "deleted",
                "keytype", "account_data", "closed_at"],
    "account_asset": ["amount", "frozen", "deleted", "closed_at"],
    "asset": ["creator_addr", "params", "deleted", "closed_at"],
    "app": ["creator", "params", "deleted", "closed_at"],
    "account_app": ["localstate", "deleted", "closed_at"],
    "app_box": ["value"],
    "metastate": ["v"],
}


def merge_from_staging_sql(table: str, staging: str | None = None) -> str:
    """One statement applying a folded micro-batch from a staging table.

    The folded updates already carry the resolved lineage columns (the
    engine's fold reproduces writer.go's per-statement ON CONFLICT
    semantics), so the mirror statement only needs: insert-or-update all
    non-created_at columns, preserving created_at on conflict — exactly the
    column lists of writer.go:39-114."""
    staging = staging or f"{table}_staging"
    cols = [f.name for f in TABLE_SCHEMAS[table].fields]
    keys = TABLE_KEYS[table]
    set_cols = _UPSERT_SET.get(table)
    if set_cols is None:  # facts: idempotent append
        return (
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"SELECT {', '.join(cols)} FROM {staging} "
            f"ON CONFLICT DO NOTHING"
        )
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in set_cols)
    # box staging rows carry an op flag; delete-marked rows are handled by
    # box_delete_sql and must NOT be re-inserted by the merge (found by the
    # real-database test: the golden-SQL unit tests never executed the
    # delete-then-merge pair against live state)
    where = " WHERE op IS DISTINCT FROM 'delete'" if table == "app_box" else ""
    return (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"SELECT {', '.join(cols)} FROM {staging}{where} "
        f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {sets}"
    )


def box_delete_sql(staging: str | None = None) -> str:
    """Physical box deletes (deleteAppBoxStmt writer.go:112-113), applied
    from the staging rows flagged as deletes."""
    staging = staging or "app_box_staging"
    return (
        f"DELETE FROM app_box WHERE (app, name) IN "
        f"(SELECT app, name FROM {staging} WHERE op = 'delete')"
    )


# ---------------------------------------------------------------------------
# serialization retry (util.go:17-68)
# ---------------------------------------------------------------------------

SERIALIZATION_FAILURE = "40001"


def is_serialization_failure(exc: BaseException) -> bool:
    """SQLSTATE 40001 detection across driver exception shapes
    (util.go:17-20 checks pgx's SerializationFailure code)."""
    code = getattr(exc, "sqlstate", None) or getattr(exc, "pgcode", None)
    if code == SERIALIZATION_FAILURE:
        return True
    return SERIALIZATION_FAILURE in str(exc)


def tx_with_retry(
    fn: Callable[[], None],
    max_attempts: int | None = None,
    delay_s: float = 0.0,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> int:
    """Run ``fn`` until it succeeds, retrying on serialization failures —
    unbounded by default like the reference (util.go:43-68).  Returns the
    number of attempts."""
    attempt = 0
    while True:
        attempt += 1
        try:
            fn()
            return attempt
        except BaseException as exc:  # noqa: BLE001 — classify then re-raise
            if not is_serialization_failure(exc):
                raise
            if max_attempts is not None and attempt >= max_attempts:
                raise
            if on_retry:
                on_retry(attempt, exc)
            if delay_s:
                time.sleep(delay_s)


# ---------------------------------------------------------------------------
# the mirror itself
# ---------------------------------------------------------------------------


class JdbcMirror:
    """foreachBatch hook keeping an external CockroachDB/Postgres mirror.

    ``execute`` is an injected ``Callable[[str], None]`` running one SQL
    statement on the target (psycopg/pg8000/JDBC — whatever the deployment
    has); Spark's own parallel JDBC writer moves the bulk rows.

    ``bulk_write`` optionally overrides the bulk row path: a
    ``Callable[[str, DataFrame, str], None]`` receiving (table, df, mode
    in {"append", "overwrite"}).  The default is Spark's parallel JDBC
    writer; deployments without a JDBC driver on the classpath (or tests
    against an ephemeral database reached over a unix socket, see
    tests/test_jdbc_postgres.py) inject their own mover — COPY FROM
    STDIN being the production-faithful choice, matching the reference's
    bulk path (write_txn.go:172-176).
    """

    def __init__(
        self,
        url: str,
        properties: dict[str, str] | None = None,
        execute: Callable[[str], None] | None = None,
        batchsize: int = 10_000,
        bulk_write: Callable[[str, DataFrame, str], None] | None = None,
    ) -> None:
        self.url = url
        self.properties = {
            "driver": "org.postgresql.Driver",
            "reWriteBatchedInserts": "true",
            "batchsize": str(batchsize),
            **(properties or {}),
        }
        self.execute = execute
        self.bulk_write = bulk_write

    def init_schema(self) -> None:
        assert self.execute is not None, "init_schema needs an execute callable"
        for stmt in schema_ddl():
            self.execute(stmt)

    def _move(self, table: str, df: DataFrame, mode: str) -> None:
        if self.bulk_write is not None:
            self.bulk_write(table, df, mode)
        else:
            df.write.mode(mode).jdbc(self.url, table, properties=self.properties)

    def append_facts(self, table: str, df: DataFrame) -> None:
        self._move(table, df, "append")

    def apply_state_batch(self, table: str, folded: DataFrame) -> None:
        """Stage the folded updates, then merge server-side with retry."""
        staging = f"{table}_staging"
        self._move(staging, folded, "overwrite")
        assert self.execute is not None

        def _merge() -> None:
            if table == "app_box":
                self.execute(box_delete_sql(staging))
            self.execute(merge_from_staging_sql(table, staging))

        tx_with_retry(_merge)
