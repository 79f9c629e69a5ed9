"""SQLite shard codec for the documents lane (stdlib ``sqlite3``).

Unlike the from-scratch codecs (JPEG/AVI/MP4/WARC/PDF/Avro), the bytes
here are produced and parsed by the standard library's SQLite binding —
the format is a public, stable on-disk spec and a first-party parser
ships with every Python.  What this module adds is the LANE contract
the other shard codecs share:

- ``build_sqlite_shard`` is deterministic given its input order (one
  ``docs`` table, rows inserted in the order given);
- ``parse_sqlite_shard`` is STRICT: header magic, exactly the expected
  table, exactly the expected column shape — anything else raises
  ``ValueError`` (sqlite3's own exceptions are wrapped, so the
  clean-failure contract of the parser lanes holds: parse or
  ValueError, never a stray DatabaseError/KeyError);
- stdlib sqlite3 cannot operate on a memory buffer, so both directions
  spool through a private temporary file.  That is a real, bounded
  cost (one temp file per task at a time) stated here rather than
  hidden — the lane's gate documents it too.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile

_MAGIC = b"SQLite format 3\x00"

_COLUMNS = [
    ("doc_id", "INTEGER"),
    ("lang", "TEXT"),
    ("source", "TEXT"),
    ("text", "TEXT"),
    ("n_chars", "INTEGER"),
]


def build_sqlite_shard(rows) -> bytes:
    """Serialize ``(doc_id, lang, source, text, n_chars)`` tuples into a
    single-table SQLite database and return its bytes."""
    fd, path = tempfile.mkstemp(suffix=".sqlite")
    os.close(fd)
    try:
        con = sqlite3.connect(path)
        try:
            cols = ", ".join(f"{n} {t}" for n, t in _COLUMNS)
            con.execute(f"CREATE TABLE docs ({cols})")
            con.executemany(
                "INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
                ((int(a), str(b), str(c), str(d), int(e)) for a, b, c, d, e in rows),
            )
            con.commit()
        finally:
            con.close()
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def parse_sqlite_shard(blob: bytes):
    """Parse a SQLite shard back into ``(doc_id, lang, source, text,
    n_chars)`` tuples (doc_id order).  Strict: raises ``ValueError`` on
    a bad magic, unexpected tables, or a drifted column shape."""
    if len(blob) < 100 or blob[:16] != _MAGIC:
        raise ValueError(
            "sqlite shard: bad header (not a SQLite 3 database)"
        )
    fd, path = tempfile.mkstemp(suffix=".sqlite")
    try:
        os.write(fd, blob)
        os.close(fd)
        # fd is closed exactly once: mark it so the finally can't close a
        # RE-USED descriptor number (the OS may hand the same fd to a
        # pyarrow/worker background thread between here and the finally —
        # the except OSError below only masks EBADF, not that race).
        fd = -1
        try:
            con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        except sqlite3.Error as exc:
            raise ValueError(f"sqlite shard: cannot open: {exc}") from exc
        try:
            try:
                tables = [
                    r[0]
                    for r in con.execute(
                        "SELECT name FROM sqlite_master WHERE type='table' "
                        "ORDER BY name"
                    )
                ]
                if tables != ["docs"]:
                    raise ValueError(
                        f"sqlite shard: expected exactly one table 'docs', "
                        f"found {tables!r}"
                    )
                info = [
                    (r[1], r[2])
                    for r in con.execute("PRAGMA table_info(docs)")
                ]
                if info != _COLUMNS:
                    raise ValueError(
                        f"sqlite shard: column shape drift: {info!r} vs "
                        f"expected {_COLUMNS!r}"
                    )
                yield from con.execute(
                    "SELECT doc_id, lang, source, text, n_chars FROM docs "
                    "ORDER BY doc_id"
                )
            except sqlite3.Error as exc:  # corrupt pages, truncation, ...
                raise ValueError(f"sqlite shard: corrupt: {exc}") from exc
        finally:
            con.close()
    finally:
        if fd >= 0:  # only when os.write/os.close above raised
            try:
                os.close(fd)
            except OSError:
                pass
        os.unlink(path)
