"""Event-stream Structured Streaming tests: watermarked window rollup and
the applyInPandasWithState sessionizer."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from sparkroach.streaming import events as se


@pytest.fixture()
def feed(spark, tmp_path):
    """Write a small deterministic event feed as a streaming file source."""
    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2-hour gap
    for i in range(3):
        rows.append((i, t0 + timedelta(minutes=5 * i), 1, "click", 1.0, "{}"))
    for i in range(2):
        rows.append((10 + i, t0 + timedelta(hours=3, minutes=i), 1, "click", 1.0, "{}"))
    # user 2: one session
    rows.append((20, t0 + timedelta(minutes=1), 2, "purchase", 9.5, "{}"))
    src = str(tmp_path / "events_feed")
    spark.createDataFrame(rows, se.EVENT_SCHEMA).repartition(1).write.format(
        "json"
    ).save(src)
    return src


def test_windowed_rollup_with_watermark(spark, feed, tmp_path):
    stream = spark.readStream.schema(se.EVENT_SCHEMA).json(feed)
    out = se.windowed_rollup(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM rollup_test ORDER BY window_start, event_type"
    ).collect()
    assert [(r.window_start.hour, r.event_type, r.n) for r in rows] == [
        (10, "click", 3),
        (10, "purchase", 1),
        (13, "click", 2),
    ]
    assert rows[1].total_value == 9.5


def test_sessionize_stateful(spark, feed, tmp_path):
    stream = spark.readStream.schema(se.EVENT_SCHEMA).json(feed)
    out = se.sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM sessions_test ORDER BY user_id, session_start"
    ).collect()
    # the in-batch gap closes user 1's first session (3 events, 10:00-10:10);
    # the still-open sessions only emit on timeout, so exactly one closed row
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 3
    assert r.session_start.minute == 0 and r.session_end.minute == 10
