"""Arrow IPC lane tests: value-exact roundtrip, the two-phase commit
protocol (abort leaves nothing), strict schema-drift failure, and the
bounded type mapping."""

from __future__ import annotations

import os

import pytest

from sparkroach.sources.arrow_ipc import (
    ArrowIpcDataSource,
    arrow_to_spark_schema,
    register_arrow_source,
)


def test_roundtrip_values_exact(spark, tmp_path):
    register_arrow_source(spark)
    df = spark.createDataFrame(
        [
            (1, "alpha", [1.5, -2.25], None),
            (2, None, [], 7),
            (3, "käse", None, 0),
        ],
        "id long, name string, vec array<float>, alt int",
    )
    path = str(tmp_path / "rt")
    df.write.format("sparkroach_arrow").mode("append").save(path)
    back = spark.read.format("sparkroach_arrow").load(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # only visible .arrow files on disk — no temporaries left behind
    names = os.listdir(path)
    assert names and all(
        n.endswith(".arrow") and not n.startswith(".") for n in names
    )


def test_zstd_compressed_roundtrip(spark, tmp_path):
    register_arrow_source(spark)
    df = spark.createDataFrame(
        [(i, "x" * 100) for i in range(500)], "id long, body string"
    )
    path = str(tmp_path / "z")
    (
        df.write.format("sparkroach_arrow")
        .option("compression", "zstd")
        .mode("append")
        .save(path)
    )
    back = spark.read.format("sparkroach_arrow").load(path)
    assert back.count() == 500
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(500))


def test_abort_unlinks_temporaries(tmp_path):
    """Protocol-level pin: a task that dies mid-write cleans up its OWN
    temporary before re-raising (abort() only unlinks tmps named in
    commit messages, and a dead task produced none — without the
    in-write cleanup, retried/speculated tasks would accumulate stale
    dot-files forever; r7 ADVICE), and commit() never exposes one."""
    import pyarrow as pa

    ds = ArrowIpcDataSource(options={"path": str(tmp_path / "ab")})
    writer = ds.writer(None, overwrite=False)
    batch = pa.record_batch({"id": pa.array([1, 2], type=pa.int64())})

    def failing_iter():
        yield batch
        raise RuntimeError("task died mid-partition")

    commit_msg = None
    with pytest.raises(RuntimeError):
        commit_msg = writer.write(failing_iter())
    # the failed write's exception path must have unlinked its temporary
    tmps = [
        f for f in os.listdir(tmp_path / "ab") if f.startswith(".")
    ]
    assert tmps == []
    # simulate the retried task succeeding, then commit: only ITS file
    # becomes visible; the stale temporary never does (readers list
    # non-dot names only)
    msg = writer.write(iter([batch]))
    writer.commit([msg, commit_msg])
    visible = [
        f for f in os.listdir(tmp_path / "ab") if not f.startswith(".")
    ]
    assert len(visible) == 1 and visible[0].endswith(".arrow")


def test_schema_drift_across_files_raises(spark, tmp_path):
    register_arrow_source(spark)
    path = str(tmp_path / "drift")
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.format(
        "sparkroach_arrow"
    ).mode("append").save(path)
    spark.createDataFrame([("x",)], "id string").coalesce(1).write.format(
        "sparkroach_arrow"
    ).mode("append").save(path)
    back = spark.read.format("sparkroach_arrow").load(path)
    with pytest.raises(Exception, match="schema drift|sparkroach_arrow"):
        back.collect()


def test_unsupported_arrow_type_raises():
    import pyarrow as pa

    with pytest.raises(ValueError, match="unsupported Arrow type"):
        arrow_to_spark_schema(
            pa.schema([pa.field("d", pa.decimal128(10, 2))])
        )


def test_overwrite_mode_rejected(spark, tmp_path):
    register_arrow_source(spark)
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception, match="overwrite"):
        df.write.format("sparkroach_arrow").mode("overwrite").save(
            str(tmp_path / "ow")
        )


# ---------------------------------------------------------------------------
# hypothesis roundtrip at the codec level (floats incl. NaN/inf, nulls)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.floats(width=32, allow_nan=False)),
            st.one_of(st.none(), st.text(max_size=40)),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_hypothesis_codec_roundtrip(rows):
    import pyarrow as pa

    from sparkroach.sources.arrow_ipc import read_ipc_bytes

    batch = pa.record_batch(
        {
            "id": pa.array([r[0] for r in rows], type=pa.int64()),
            "val": pa.array([r[1] for r in rows], type=pa.float32()),
            "txt": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    sink = pa.BufferOutputStream()
    w = pa.ipc.new_file(sink, batch.schema)
    w.write_batch(batch)
    w.close()
    got = read_ipc_bytes(sink.getvalue().to_pybytes())
    assert len(got) == 1 and got[0].equals(batch)
