"""WARC 1.0 codec (functions/warc.py) + binary-file sink
(sources/binfiles.py).

Record grammar pinned against hand-built ISO 28500 bytes; parser
strictness exercised on every malformation class; the sink's filename
validation, duplicate detection, and two-phase abort are proven on the
Spark tier."""

from __future__ import annotations

import gzip
import os

import pytest

from sparkroach.functions.warc import (
    build_warc_gz,
    doc_uri,
    parse_warc_gz,
    parse_warc_record,
    warc_record_bytes,
)

_ROWS = [
    (1, "src0", "en", "hello world"),
    (2, "src1", "fr", "bonjour le monde"),
    (42, "src7", "de", "a b c d e f g"),
]


def test_record_grammar_exact():
    rec = warc_record_bytes(7, "srcX", "en", "payload body")
    # version line, CRLF header block, blank line, payload, terminator
    assert rec.startswith(b"WARC/1.0\r\n")
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert b"WARC-Type: resource" in head
    assert b"Content-Length: 12" in head
    assert rest == b"payload body\r\n\r\n"
    parsed = parse_warc_record(rec)
    assert parsed["payload"] == b"payload body"
    assert parsed["WARC-Target-URI"] == doc_uri("srcX", "en", 7)


def test_handbuilt_record_parses():
    body = b"abc"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:0-0-0-0-0>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: https://x.example.org/en/9\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: 3\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    rec = parse_warc_record(raw)
    assert rec["payload"] == body
    assert rec["Content-Length"] == "3"


def test_roundtrip_members_and_determinism():
    blob = build_warc_gz(_ROWS)
    recs = parse_warc_gz(blob)
    assert [r["payload"].decode() for r in recs] == [t for *_, t in _ROWS]
    assert [r["WARC-Target-URI"] for r in recs] == [
        doc_uri(s, lg, i) for i, s, lg, _ in _ROWS
    ]
    assert build_warc_gz(_ROWS) == blob  # mtime=0 gzip members
    # utf-8 payloads: Content-Length counts OCTETS, not characters
    r2 = parse_warc_gz(build_warc_gz([(3, "s", "fr", "café")]))
    assert r2[0]["payload"].decode("utf-8") == "café"
    assert int(r2[0]["Content-Length"]) == 5


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b.replace(b"WARC/1.0", b"HTTP/1.1"), "version"),
        (lambda b: b.replace(b"Content-Length", b"X-Length"), "Content-Length"),
        (lambda b: b[:-4], "terminator"),
        (lambda b: b[: b.rindex(b"\r\n\r\n") - 3], "truncated payload"),
        # deleting the blank line glues the payload onto the last header:
        # the Content-Length value stops being a clean integer
        (lambda b: b.replace(b"\r\n\r\n", b"", 1), "malformed Content-Length"),
    ],
)
def test_parser_strictness(mutate, msg):
    rec = warc_record_bytes(1, "s", "en", "some payload text")
    with pytest.raises(ValueError, match=msg):
        parse_warc_record(mutate(rec))


def test_gzip_member_strictness():
    good = build_warc_gz(_ROWS)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_gz(good[: len(good) // 2])  # truncated member
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_gz(b"\x00\x01not gzip at all")
    # each member must hold exactly one record: two records in ONE member
    two = gzip.compress(
        warc_record_bytes(1, "s", "en", "a") + warc_record_bytes(2, "s", "en", "b"),
        mtime=0,
    )
    with pytest.raises(ValueError):
        parse_warc_gz(two)


# ---------------------------------------------------------------------------
# sparkroach_binfiles sink
# ---------------------------------------------------------------------------


def _bin_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("filename", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_binfiles_sink_roundtrip(spark, tmp_path):
    from sparkroach.sources.binfiles import register_binfiles_sink

    register_binfiles_sink(spark)
    path = str(tmp_path / "bins")
    rows = [(f"f{i:03d}.bin", bytes([i, 255 - i])) for i in range(10)]
    _bin_df(spark, rows).repartition(4).write.format(
        "sparkroach_binfiles"
    ).mode("append").save(path)
    assert sorted(os.listdir(path)) == [n for n, _ in rows]
    for name, payload in rows:
        with open(os.path.join(path, name), "rb") as f:
            assert f.read() == payload


def test_binfiles_rejects_traversal_and_schema(spark, tmp_path):
    from sparkroach.sources.binfiles import register_binfiles_sink

    register_binfiles_sink(spark)
    path = str(tmp_path / "bad")
    with pytest.raises(Exception, match="unsafe filename"):
        _bin_df(spark, [("../escape.bin", b"x")]).write.format(
            "sparkroach_binfiles"
        ).mode("append").save(path)
    if os.path.exists(path):  # abort ran: no visible or temp files remain
        assert os.listdir(path) == []
    with pytest.raises(Exception, match="expects exactly"):
        spark.range(3).write.format("sparkroach_binfiles").mode(
            "append"
        ).save(path)


def test_binfiles_duplicate_filenames_fail(spark, tmp_path):
    from sparkroach.sources.binfiles import register_binfiles_sink

    register_binfiles_sink(spark)
    path = str(tmp_path / "dup")
    rows = [("same.bin", b"a"), ("same.bin", b"b")]
    with pytest.raises(Exception, match="duplicate filename"):
        _bin_df(spark, rows).repartition(2).write.format(
            "sparkroach_binfiles"
        ).mode("append").save(path)
