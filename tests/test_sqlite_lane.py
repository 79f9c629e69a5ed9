"""SQLite shard codec tests: value-exact roundtrip and the strict
clean-failure contract (parse or ValueError, never a stray
sqlite3/struct error)."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pytest

from sparkroach.functions.sqlite_shard import (
    _MAGIC,
    build_sqlite_shard,
    parse_sqlite_shard,
)

ROWS = [
    (1, "en", "web", "hello world", 11),
    (2, "de", "books", "käse & brötchen", 15),
    (3, "en", "web", "", 0),
]


def test_roundtrip_values_exact():
    blob = build_sqlite_shard(ROWS)
    assert blob[:16] == _MAGIC
    assert list(parse_sqlite_shard(blob)) == ROWS


def test_rows_come_back_in_doc_id_order():
    blob = build_sqlite_shard(reversed(ROWS))
    assert [r[0] for r in parse_sqlite_shard(blob)] == [1, 2, 3]


def test_bad_magic_raises_valueerror():
    with pytest.raises(ValueError, match="bad header"):
        list(parse_sqlite_shard(b"not a database" + b"\x00" * 200))


def test_short_blob_raises_valueerror():
    with pytest.raises(ValueError, match="bad header"):
        list(parse_sqlite_shard(_MAGIC[:8]))


def _raw_db(build_sql: str) -> bytes:
    fd, path = tempfile.mkstemp(suffix=".sqlite")
    os.close(fd)
    try:
        con = sqlite3.connect(path)
        con.executescript(build_sql)
        con.commit()
        con.close()
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def test_unexpected_table_raises_valueerror():
    blob = _raw_db("CREATE TABLE other (x INTEGER);")
    with pytest.raises(ValueError, match="expected exactly one table"):
        list(parse_sqlite_shard(blob))


def test_extra_table_raises_valueerror():
    blob = _raw_db(
        "CREATE TABLE docs (doc_id INTEGER, lang TEXT, source TEXT, "
        "text TEXT, n_chars INTEGER); CREATE TABLE sneaky (x INTEGER);"
    )
    with pytest.raises(ValueError, match="expected exactly one table"):
        list(parse_sqlite_shard(blob))


def test_column_drift_raises_valueerror():
    blob = _raw_db("CREATE TABLE docs (doc_id INTEGER, wrong TEXT);")
    with pytest.raises(ValueError, match="column shape drift"):
        list(parse_sqlite_shard(blob))


def test_truncated_file_raises_valueerror():
    """Valid magic, missing pages: the wrapped sqlite3 'disk image is
    malformed' must surface as ValueError (clean-failure contract)."""
    blob = build_sqlite_shard(ROWS)
    with pytest.raises(ValueError, match="corrupt"):
        list(parse_sqlite_shard(blob[:4096]))


def test_mangled_master_cell_raises_valueerror():
    """Flip the sqlite_master btree cell bytes (END of page 1 — the
    free space in the middle of the page is genuinely unused, and
    SQLite has no page checksums, so corruption must hit live cells
    to be detectable at all)."""
    blob = bytearray(build_sqlite_shard(ROWS))
    for i in range(4096 - 200, 4096):
        blob[i] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt"):
        list(parse_sqlite_shard(bytes(blob)))


# ---------------------------------------------------------------------------
# hypothesis roundtrips: arbitrary text through the parameterized inserts
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=80,
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            _text,
            _text,
            _text,
            st.integers(min_value=0, max_value=2**31),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    )
)
def test_hypothesis_roundtrip_arbitrary_text(rows):
    """Quotes, newlines, NULs(-free by SQLite), emoji, RTL — whatever
    hypothesis makes, the parameterized insert + strict parse must
    return it verbatim in doc_id order."""
    blob = build_sqlite_shard(rows)
    got = list(parse_sqlite_shard(blob))
    want = sorted(((a, b, c, d, e) for a, b, c, d, e in rows))
    assert got == want
