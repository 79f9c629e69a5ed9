"""JDBC mirror unit tests: DDL generation against the reference schema,
upsert statement shape, and the serialization-retry loop with injected
40001 failures (the reference tests the same loop, util_test.go:16-37)."""

from __future__ import annotations

import pytest

from sparkroach.sinks import jdbc


def test_ddl_covers_all_nine_tables():
    ddl = jdbc.schema_ddl()
    creates = [s for s in ddl if s.startswith("CREATE TABLE")]
    assert len(creates) == 10  # 9 reference tables + metastate is one of them
    txn = jdbc.create_table_sql("txn")
    assert "round bigint NOT NULL" in txn
    assert "intra integer NOT NULL" in txn
    assert "typeenum smallint" in txn
    assert "txn jsonb" in txn
    assert "PRIMARY KEY (round, intra)" in txn
    aa = jdbc.create_table_sql("account_asset")
    assert "amount numeric(20,0)" in aa  # uint64-safe (sql:59)
    assert "addr bytea NOT NULL" in aa
    hdr = jdbc.create_table_sql("block_header")
    assert "realtime timestamp without time zone" in hdr


def test_ddl_includes_reference_indexes():
    ddl = "\n".join(jdbc.schema_ddl())
    assert "txn_by_tixid" in ddl
    assert "block_header_time" in ddl
    assert "WHERE NOT deleted" in ddl  # partial indexes (sql:68,114)
    assert "addr, round DESC, intra DESC" in ddl  # participation index (sql:40)


def test_merge_statement_shapes():
    acct = jdbc.merge_from_staging_sql("account")
    assert "ON CONFLICT (addr) DO UPDATE SET" in acct
    assert "created_at = EXCLUDED" not in acct  # created_at preserved
    assert "microalgos = EXCLUDED.microalgos" in acct
    fact = jdbc.merge_from_staging_sql("txn")
    assert fact.endswith("ON CONFLICT DO NOTHING")
    box = jdbc.box_delete_sql()
    assert "op = 'delete'" in box


class Boom(Exception):
    def __init__(self, sqlstate):
        super().__init__(f"boom {sqlstate}")
        self.sqlstate = sqlstate


def test_retry_on_serialization_failure():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise Boom("40001")

    assert jdbc.tx_with_retry(flaky) == 3


def test_no_retry_on_other_errors():
    with pytest.raises(Boom):
        jdbc.tx_with_retry(lambda: (_ for _ in ()).throw(Boom("23505")))


def test_retry_cap():
    def always():
        raise Boom("40001")

    with pytest.raises(Boom):
        jdbc.tx_with_retry(always, max_attempts=4)


def test_mirror_statement_plumbing():
    """apply_state_batch executes delete-then-merge for boxes via the
    injected execute callable (no DB needed)."""
    executed: list[str] = []

    class FakeDF:
        class write:  # noqa: N801 — duck-typing DataFrame.write chain
            @staticmethod
            def mode(_):
                class W:
                    @staticmethod
                    def jdbc(url, table, properties):
                        executed.append(f"WRITE {table}")

                return W

    m = jdbc.JdbcMirror("jdbc:postgresql://x/db", execute=executed.append)
    m.apply_state_batch("app_box", FakeDF())
    assert executed[0] == "WRITE app_box_staging"
    assert "DELETE FROM app_box" in executed[1]
    assert executed[2].startswith("INSERT INTO app_box")
