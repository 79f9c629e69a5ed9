"""Mutation fuzz over every from-scratch byte-level parser.

Each codec documents a clean-failure contract ("malformed input raises
<codec>'s error, never a dirty IndexError/struct.error/hang").  The
per-codec strictness tests pin KNOWN malformation classes; this suite
pins the contract itself: seeded random byte flips, truncations, and
garbage injections over a valid payload must either parse successfully
(a flip can land in a don't-care byte or in pixel data) or raise one of
the codec's DECLARED exception types.  Anything else — IndexError,
KeyError, struct.error, UnicodeDecodeError, ZeroDivisionError,
RecursionError — is a parser bug this test exists to catch.

Payloads are kept tiny so the full matrix (7 codecs × ~120 mutants)
runs in seconds.
"""

from __future__ import annotations

import random

import pytest


def _mutants(valid: bytes, seed: int = 0, n: int = 40):
    """Deterministic mutation battery: byte flips, truncations, garbage
    splices, and length-preserving block swaps."""
    rng = random.Random(seed)
    out: list[bytes] = []
    L = len(valid)
    for _ in range(n):
        b = bytearray(valid)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(L)] ^= 1 << rng.randrange(8)
        out.append(bytes(b))
    for _ in range(n // 2):
        out.append(valid[: rng.randrange(L)])
    for _ in range(n // 2):
        cut = rng.randrange(L)
        out.append(
            valid[:cut]
            + bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 16)))
            + valid[cut:]
        )
    for _ in range(n // 4):
        i, j = sorted(rng.randrange(L) for _ in range(2))
        k = rng.randint(1, 24)
        b = bytearray(valid)
        b[i:i + k], b[j:j + k] = valid[j:j + k], valid[i:i + k]
        out.append(bytes(b))
    out.append(b"")
    out.append(bytes(rng.getrandbits(8) for _ in range(64)))
    return out


def _run_battery(parse, valid: bytes, allowed: tuple, label: str):
    # sanity: the unmutated payload must parse
    parse(valid)
    bad: list[str] = []
    for k, m in enumerate(_mutants(valid)):
        try:
            parse(m)
        except allowed:
            pass
        except Exception as exc:  # noqa: BLE001 — the point of the test
            bad.append(f"mutant {k}: {type(exc).__name__}: {exc}")
    assert not bad, f"{label}: dirty exceptions:\n" + "\n".join(bad[:10])


def test_fuzz_jpeg_decode():
    from sparkroach.functions.jpeg import decode_jpeg, encode_doc_jpeg

    _run_battery(
        decode_jpeg, encode_doc_jpeg(3), (ValueError,), "decode_jpeg"
    )


def test_fuzz_avi_parse():
    from sparkroach.functions.avi import encode_doc_mjpeg, parse_avi_mjpeg

    _run_battery(
        parse_avi_mjpeg, encode_doc_mjpeg(3), (ValueError,), "parse_avi"
    )


def test_fuzz_mp4_parse():
    from sparkroach.functions.mp4 import encode_mp4_video, parse_mp4

    valid = encode_mp4_video(
        [b"\x00" * 40, b"\x01" * 44], width=16, height=16, codec=b"jpeg"
    )
    _run_battery(parse_mp4, valid, (ValueError,), "parse_mp4")


def test_fuzz_warc_parse():
    from sparkroach.functions.warc import build_warc_gz, parse_warc_gz

    valid = build_warc_gz(
        [(1, "src0", "en", "hello world"), (2, "src1", "de", "zweite")]
    )
    _run_battery(parse_warc_gz, valid, (ValueError,), "parse_warc_gz")


def test_fuzz_tar_wds_parse():
    from sparkroach.functions.wds import build_tar_shard, parse_tar_shard

    valid = build_tar_shard(
        [(1, "en", "src0", "hello"), (2, "de", "src1", "world")]
    )
    _run_battery(parse_tar_shard, valid, (ValueError,), "parse_tar_shard")


def test_fuzz_pdf_parse():
    from sparkroach.functions.pdf import build_pdf, parse_pdf_text

    valid = build_pdf([(0, "alpha (x) beta"), (1, "gamma \\ delta")])
    _run_battery(parse_pdf_text, valid, (ValueError,), "parse_pdf_text")


def test_fuzz_avro_ocf_read():
    from sparkroach.sources.avro_ocf import read_ocf, spark_to_avro_schema

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from sparkroach.sources.avro_ocf import write_ocf

    schema = spark_to_avro_schema(
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("text", StringType(), True),
            ]
        ),
        name="fuzz",
    )
    valid = write_ocf(
        schema,
        [{"doc_id": 1, "text": "aa"}, {"doc_id": 2, "text": None}],
        codec="null",
    )

    def parse(b: bytes):
        return list(read_ocf(b))

    _run_battery(parse, valid, (ValueError,), "read_ocf")


def test_fuzz_sqlite_shard_parse():
    from sparkroach.functions.sqlite_shard import (
        build_sqlite_shard,
        parse_sqlite_shard,
    )

    valid = build_sqlite_shard(
        [(i, "en", "web", f"text {i}", 7) for i in range(20)]
    )
    _run_battery(
        lambda b: list(parse_sqlite_shard(b)),
        valid,
        (ValueError,),
        "parse_sqlite_shard",
    )


def test_fuzz_arrow_ipc_read():
    import pyarrow as pa

    from sparkroach.sources.arrow_ipc import read_ipc_bytes

    sink = pa.BufferOutputStream()
    batch = pa.record_batch(
        {
            "id": pa.array(range(50), type=pa.int64()),
            "txt": pa.array([f"row {i}" for i in range(50)]),
        }
    )
    w = pa.ipc.new_file(sink, batch.schema)
    w.write_batch(batch)
    w.close()
    valid = sink.getvalue().to_pybytes()
    _run_battery(read_ipc_bytes, valid, (ValueError,), "read_ipc_bytes")
