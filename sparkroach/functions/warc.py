"""From-scratch WARC 1.0 writer + parser (ISO 28500 / Common Crawl layout).

WARC is *the* interchange format for web-scale text corpora: Common
Crawl publishes ~100 TB-class crawls as ``.warc.gz`` files where **each
record is its own gzip member** (concatenated members form one valid
gzip stream, but per-record members let a reader seek to any record
boundary without decompressing the prefix).  A training-data pipeline
that cannot ingest WARC cannot touch the largest public text source, so
this lane makes the format real the same way the JPEG/AVI/Avro lanes
did: implement the byte format from the public spec with stdlib only
(`gzip`/`zlib`), keep the Spark side a thin Arrow-batched byte mover,
and checksum the roundtrip against a pure-SQL oracle.

Record grammar implemented (ISO 28500 §4; the subset every tool emits):

    WARC/1.0<CRLF>
    <name>: <value><CRLF> ...          (header block)
    <CRLF>
    <Content-Length octets of payload>
    <CRLF><CRLF>                       (record terminator)

The parser is strict — bad version line, missing ``Content-Length``,
truncated payload, or a missing terminator raise ``ValueError`` (never
a silent partial record), and each gzip member must contain exactly one
record (the Common Crawl invariant that makes files splittable).

Scale layout: one ``.warc.gz`` file per task/partition, parsed
file-parallel via ``binaryFile`` + ``mapInPandas`` — the standard
Common-Crawl processing shape (a 100 TB crawl is ~70k independent
~1.2 GB files; per-file parallelism is the natural partitioning and
needs no shuffle until the post-parse aggregate).

Determinism: fixed ``WARC-Date``, md5-derived ``WARC-Record-ID`` and
``mtime=0`` gzip members make byte-identical corpora on every run —
the property the roundtrip gate's hash oracle relies on.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
# fixed capture date: synthetic corpus, deterministic bytes
WARC_DATE = "2026-01-01T00:00:00Z"


def doc_uri(source: str, lang: str, doc_id: int) -> str:
    """Deterministic synthetic target URI for a corpus document."""
    return f"https://{source}.example.org/{lang}/{doc_id}"


def warc_record_bytes(
    doc_id: int, source: str, lang: str, text: str
) -> bytes:
    """One WARC ``resource`` record for a corpus document."""
    payload = text.encode("utf-8")
    rid = hashlib.md5(f"sparkroach-warc-{doc_id}".encode()).hexdigest()
    rec_id = (
        f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-"
        f"{rid[16:20]}-{rid[20:32]}>"
    )
    headers = [
        ("WARC-Type", "resource"),
        ("WARC-Record-ID", rec_id),
        ("WARC-Date", WARC_DATE),
        ("WARC-Target-URI", doc_uri(source, lang, doc_id)),
        ("Content-Type", "text/plain"),
        ("Content-Length", str(len(payload))),
    ]
    out = bytearray(WARC_VERSION + _CRLF)
    for k, v in headers:
        out += f"{k}: {v}".encode("utf-8") + _CRLF
    out += _CRLF
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def build_warc_gz(rows) -> bytes:
    """``(doc_id, source, lang, text)`` rows → one ``.warc.gz`` blob,
    one gzip member per record (Common Crawl layout), mtime=0."""
    out = bytearray()
    for doc_id, source, lang, text in rows:
        rec = warc_record_bytes(int(doc_id), source, lang, text)
        out += gzip.compress(rec, compresslevel=6, mtime=0)
    return bytes(out)


def _split_members(data: bytes):
    """Yield the decompressed payload of each concatenated gzip member."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            payload = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"warc: bad gzip member at {pos}: {e}") from e
        if not d.eof:
            raise ValueError(f"warc: truncated gzip member at {pos}")
        yield payload
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: a zero-byte member cannot exist
            raise ValueError(f"warc: gzip member made no progress at {pos}")
        pos += consumed


def parse_warc_record(rec: bytes) -> dict:
    """Parse ONE record's bytes → ``{headers..., "payload": bytes}``."""
    head_end = rec.find(_CRLF + _CRLF)
    if head_end < 0:
        raise ValueError("warc: no header terminator")
    lines = rec[:head_end].split(_CRLF)
    if lines[0] != WARC_VERSION:
        raise ValueError(f"warc: bad version line {lines[0]!r}")
    headers = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"warc: malformed header line {line!r}")
        headers[k.strip().decode("utf-8")] = v.strip().decode("utf-8")
    if "Content-Length" not in headers:
        raise ValueError("warc: missing Content-Length")
    if not headers["Content-Length"].isdigit():
        raise ValueError(
            f"warc: malformed Content-Length {headers['Content-Length']!r}"
        )
    n = int(headers["Content-Length"])
    body_start = head_end + 4
    payload = rec[body_start : body_start + n]
    if len(payload) != n:
        raise ValueError(
            f"warc: truncated payload ({len(payload)} of {n} bytes)"
        )
    if rec[body_start + n : body_start + n + 4] != _CRLF + _CRLF:
        raise ValueError("warc: missing record terminator")
    if len(rec) != body_start + n + 4:
        # one record per gzip member (Common Crawl invariant) — trailing
        # bytes would otherwise be silently dropped
        raise ValueError(
            f"warc: {len(rec) - body_start - n - 4} trailing bytes after "
            "record terminator (exactly one record per member)"
        )
    headers["payload"] = payload
    return headers


def parse_warc_gz(data: bytes) -> list[dict]:
    """Parse one ``.warc.gz`` blob (member-per-record) → record dicts."""
    return [parse_warc_record(member) for member in _split_members(data)]
