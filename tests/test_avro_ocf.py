"""From-scratch Avro OCF codec + DataSource (sources/avro_ocf.py).

Spec-exactness is pinned two ways: hand-built byte vectors from the
Avro 1.11 spec's own encoding examples, and hypothesis roundtrips over
the full supported type lattice.  The Spark tier proves the DataSource
surface (write → read equality, metadata schema inference, overwrite,
two-phase abort cleanup)."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkroach.sources.avro_ocf import (
    avro_to_spark_schema,
    read_ocf,
    read_ocf_header,
    spark_to_avro_schema,
    sync_marker,
    write_ocf,
)

_SJ = json.dumps(
    {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "emb", "type": {"type": "array", "items": "float"}},
            {"name": "flag", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
        ],
    }
)


def _mk(i: int) -> dict:
    return {
        "id": i,
        "txt": None if i % 3 == 0 else f"doc {i}",
        "emb": [0.5 * i, -1.25],
        "flag": i % 2 == 0,
        "raw": bytes([i % 256]),
    }


# ---------------------------------------------------------------------------
# spec byte vectors (Avro 1.11 "Binary Encoding" worked examples)
# ---------------------------------------------------------------------------


def test_zigzag_varint_spec_examples():
    # the spec's own int table: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f,
    # 64→80 01
    sj = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]}
    )
    for value, expect in [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
    ]:
        data = write_ocf(sj, [{"v": value}], codec="null")
        # block layout: ...sync | count=1, size=len(expect), body, sync
        body_start = data.rindex(expect + sync_marker(sj, "null"))
        assert data[body_start : body_start + len(expect)] == expect


def test_string_encoding_spec_example():
    # spec: "foo" → 06 66 6f 6f (length 3 zigzag-varint, then utf-8)
    sj = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "s", "type": "string"}]}
    )
    data = write_ocf(sj, [{"s": "foo"}], codec="null")
    assert b"\x06foo" in data


def test_array_block_encoding():
    # array [3, 27] of long → count 2 (04), 06, 36, terminator 00
    sj = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": {"type": "array", "items": "long"}}
            ],
        }
    )
    data = write_ocf(sj, [{"a": [3, 27]}], codec="null")
    assert b"\x04\x06\x36\x00" in data
    # and the size-prefixed negative-count form is ACCEPTED on read
    schema, recs = read_ocf(data)
    assert recs == [{"a": [3, 27]}]


def test_magic_and_metadata_layout():
    data = write_ocf(_SJ, [_mk(1)], codec="deflate")
    assert data[:4] == b"Obj\x01"
    schema, codec, sync, _ = read_ocf_header(data)
    assert codec == "deflate"
    assert sync == sync_marker(_SJ, "deflate")
    assert schema["fields"][0]["name"] == "id"


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["null", "deflate", "bzip2", "xz"])
def test_roundtrip_multiblock(codec):
    recs = [_mk(i) for i in range(-5, 2500)]
    data = write_ocf(_SJ, recs, codec=codec, block_records=700)
    schema, back = read_ocf(data)
    assert back == recs
    # 2505 records at 700/block = 4 blocks — count the sync markers
    sync = sync_marker(_SJ, codec)
    assert data.count(sync) >= 5  # header + 4 block trailers


def test_int64_edges_roundtrip():
    sj = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]}
    )
    vals = [0, -1, 1, (1 << 63) - 1, -(1 << 63)]
    _, back = read_ocf(write_ocf(sj, [{"v": v} for v in vals], codec="null"))
    assert [r["v"] for r in back] == vals
    with pytest.raises(ValueError, match="int64"):
        write_ocf(sj, [{"v": 1 << 63}], codec="null")


def test_deterministic_bytes():
    recs = [_mk(i) for i in range(100)]
    assert write_ocf(_SJ, recs, codec="deflate") == write_ocf(
        _SJ, recs, codec="deflate"
    )


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
            st.one_of(st.none(), st.text(max_size=20)),
            st.lists(
                st.floats(
                    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
                ),
                max_size=5,
            ),
            st.booleans(),
            st.binary(max_size=10),
        ),
        max_size=30,
    )
)
def test_roundtrip_property(rows):
    recs = [
        {"id": i, "txt": t, "emb": e, "flag": f, "raw": b}
        for i, t, e, f, b in rows
    ]
    for codec in ("null", "deflate"):
        _, back = read_ocf(write_ocf(_SJ, recs, codec=codec, block_records=7))
        assert back == recs


# ---------------------------------------------------------------------------
# strict failure modes
# ---------------------------------------------------------------------------


def test_read_failures():
    data = write_ocf(_SJ, [_mk(i) for i in range(10)], codec="null")
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"PAR1" + data[4:])
    # corrupt the trailing sync marker
    bad = data[:-1] + bytes([data[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bad)
    with pytest.raises(ValueError, match="truncated"):
        read_ocf(data[:-20])
    with pytest.raises(ValueError, match="codec"):
        write_ocf(_SJ, [], codec="snappy")


def test_unsupported_schema_rejected():
    sj = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}],
        }
    )
    with pytest.raises(ValueError, match="unsupported"):
        write_ocf(sj, [{"m": {}}], codec="null")


# ---------------------------------------------------------------------------
# Spark <-> Avro schema mapping
# ---------------------------------------------------------------------------


def test_schema_mapping_roundtrip():
    from pyspark.sql import types as T

    st_ = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("e", T.ArrayType(T.FloatType(), False), True),
            T.StructField("x", T.BinaryType(), False),
            T.StructField("f", T.BooleanType(), True),
        ]
    )
    back = avro_to_spark_schema(json.loads(spark_to_avro_schema(st_)))
    assert back == st_


def test_schema_mapping_rejects_unsupported():
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="unsupported"):
        spark_to_avro_schema(
            T.StructType([T.StructField("d", T.DateType(), True)])
        )
    with pytest.raises(ValueError, match="union"):
        avro_to_spark_schema(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "u", "type": ["int", "string"]}],
            }
        )


# ---------------------------------------------------------------------------
# the DataSource surface (Spark tier)
# ---------------------------------------------------------------------------


def test_datasource_roundtrip_and_inference(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkroach.sources.avro_ocf import register_avro_source

    register_avro_source(spark)
    df = (
        spark.range(200)
        .select(
            F.col("id"),
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.concat(F.lit("t"), F.col("id")))
            .alias("txt"),
            F.array(
                (F.col("id") * 0.5).cast("float"), F.lit(-1.25).cast("float")
            ).alias("emb"),
        )
        .repartition(4)
    )
    path = str(tmp_path / "avro_ds")
    df.write.format("sparkroach_avro").option("codec", "deflate").mode(
        "append"
    ).save(path)
    files = [n for n in os.listdir(path) if n.endswith(".avro")]
    assert len(files) == 4  # one file per task
    back = spark.read.format("sparkroach_avro").load(path)  # inferred schema
    assert back.schema["txt"].dataType.typeName() == "string"
    assert sorted(back.collect()) == sorted(df.collect())


def test_datasource_overwrite(spark, tmp_path):
    from sparkroach.sources.avro_ocf import register_avro_source

    register_avro_source(spark)
    path = str(tmp_path / "avro_ow")
    spark.range(10).write.format("sparkroach_avro").mode("append").save(path)
    spark.range(3).write.format("sparkroach_avro").mode("overwrite").save(path)
    assert spark.read.format("sparkroach_avro").load(path).count() == 3


def test_datasource_abort_leaves_no_visible_files(spark, tmp_path):
    """A failing write job must not leave half-committed .avro files —
    the two-phase tmp+rename protocol's whole point."""
    from pyspark.sql import functions as F

    from sparkroach.sources.avro_ocf import register_avro_source

    register_avro_source(spark)
    path = str(tmp_path / "avro_abort")
    bad = spark.range(10).select(
        F.when(F.col("id") == 7, F.raise_error("boom"))
        .otherwise(F.col("id"))
        .alias("id")
    )
    with pytest.raises(Exception, match="boom"):
        bad.write.format("sparkroach_avro").mode("append").save(path)
    visible = [
        n for n in os.listdir(path) if n.endswith(".avro")
    ] if os.path.exists(path) else []
    assert visible == []


# ---------------------------------------------------------------------------
# spec Schema Resolution (reader vs per-file writer schemas)
# ---------------------------------------------------------------------------


def test_resolve_field_rules():
    from pyspark.sql import types as T

    from sparkroach.sources.avro_ocf import resolve_field

    # missing + nullable → constant null
    g = resolve_field(None, T.StructField("x", T.LongType(), True))
    assert g({"y": 1}) is None
    # missing + non-nullable → loud
    with pytest.raises(ValueError, match="non-nullable"):
        resolve_field(None, T.StructField("x", T.LongType(), False))
    # exact match passes through
    g = resolve_field("long", T.StructField("x", T.LongType(), True))
    assert g({"x": 7}) == 7
    # promotions convert (and keep null as null)
    g = resolve_field("int", T.StructField("x", T.DoubleType(), True))
    assert g({"x": 3}) == 3.0 and isinstance(g({"x": 3}), float)
    g = resolve_field(["null", "long"], T.StructField("x", T.DoubleType(), True))
    assert g({"x": None}) is None
    # narrowing / unrelated types are loud, not silent
    with pytest.raises(ValueError, match="not a spec promotion"):
        resolve_field("double", T.StructField("x", T.LongType(), True))
    with pytest.raises(ValueError, match="not a spec promotion"):
        resolve_field("string", T.StructField("x", T.LongType(), True))


def test_mixed_generations_read_under_one_schema(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sparkroach.sources.avro_ocf import register_avro_source

    register_avro_source(spark)
    path = str(tmp_path / "evo")
    gen1 = spark.range(5).select(F.col("id"), F.lit("a").alias("tag"))
    gen2 = spark.range(5, 9).select(
        F.col("id"),
        F.lit("b").alias("tag"),
        (F.col("id") * 10).cast("int").alias("extra"),
    )
    gen1.write.format("sparkroach_avro").mode("append").save(path)
    gen2.write.format("sparkroach_avro").mode("append").save(path)
    reader = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("tag", T.StringType(), True),
            # gen1 lacks it (→ null); gen2 wrote int (→ promoted)
            T.StructField("extra", T.DoubleType(), True),
        ]
    )
    back = spark.read.format("sparkroach_avro").schema(reader).load(path)
    rows = {r.id: (r.tag, r.extra) for r in back.collect()}
    assert rows[0] == ("a", None) and rows[8] == ("b", 80.0)
    assert len(rows) == 9
    # a reader schema the files cannot satisfy fails loudly at read time
    bad = T.StructType([T.StructField("tag", T.LongType(), True)])
    with pytest.raises(Exception, match="not a spec promotion"):
        spark.read.format("sparkroach_avro").schema(bad).load(path).collect()
