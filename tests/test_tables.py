"""Loader contract tests (sparkroach/tables.py).

Round-2 post-mortem: the testdata generator changed events.ts from
TIMESTAMP(NANOS)-as-bigint to timestamp[us] (read by Spark as
TIMESTAMP_NTZ), and the NTZ-strict ``unix_micros`` in
events_user_sessions broke while every NTZ-tolerant query stayed green.
These tests pin the loader's normalization contract so any future
testdata dtype drift fails HERE, loudly, not in one arbitrary query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkroach.tables import TABLES, _normalize_events_ts, load

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_timestamp(spark, sf_dir):
    """events.ts must load as plain TIMESTAMP (not NTZ, not bigint) at every
    scale factor, through whichever path (layout cache or raw) load() takes."""
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # NTZ-strict expression must resolve — this is the exact call that broke.
    df.select(F.unix_micros("ts")).limit(1).collect()


def test_events_ts_raw_is_timestamp(spark):
    """The no-cache path must normalize too."""
    import os

    os.environ["SPARKROACH_LAYOUT_CACHE"] = "0"
    try:
        df = load(spark, SF_DIRS[0], "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        os.environ.pop("SPARKROACH_LAYOUT_CACHE", None)


def test_normalize_events_ts_from_ntz_preserves_values(spark):
    """Casting NTZ→TIMESTAMP under the forced-UTC session tz must not shift
    values: the naive-UTC wall-clock reading is identical on both sides."""
    ntz = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-03-01 12:34:56.789' AS ts, 1 AS event_id"
    )
    out = _normalize_events_ts(ntz)
    assert dict(out.dtypes)["ts"] == "timestamp"
    row = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("s")).first()
    assert row["s"] == "2024-03-01 12:34:56.789"


def test_normalize_events_ts_from_nanos_long(spark):
    """Legacy TIMESTAMP(NANOS)-as-bigint shape: ns truncates to us exactly
    like DuckDB's ns→us conversion."""
    ns = 1_709_296_496_789_123_456  # 2024-03-01T12:34:56.789123456Z
    df = spark.createDataFrame([(ns,)], "ts long")
    out = _normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.select(F.unix_micros("ts").alias("us")).first()["us"] == ns // 1000


@pytest.mark.parametrize("name", TABLES)
def test_all_tables_load(spark, name):
    """Every declared table loads with at least one column and one row at
    the smallest SF — a canary for generator schema drift on ANY table."""
    df = load(spark, SF_DIRS[0], name)
    assert df.columns
    assert df.limit(1).count() == 1
