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
    # with ProcessingTimeTimeout registered, availableNow does NOT
    # terminate after the data batches — it keeps firing empty
    # state-cleanup batches until the 30-min timeouts could fire.  Poll
    # for the emitted row, then stop the query instead of leaking it.
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        if spark.sql("SELECT count(*) FROM sessions_test").collect()[0][0] >= 1:
            break
        _time.sleep(0.5)
    q.stop()
    rows = spark.sql(
        "SELECT * FROM sessions_test ORDER BY user_id, session_start"
    ).collect()
    # the in-batch gap closes user 1's first session (3 events, 10:00-10:10);
    # the still-open sessions only emit on timeout, so exactly one closed row
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 3
    assert r.session_start.minute == 0 and r.session_end.minute == 10


@pytest.mark.soak
def test_windowed_rollup_append_drops_late_events(spark, tmp_path):
    """Watermark semantics that complete-mode can't show: in append mode a
    window finalizes once the watermark passes its end, and events arriving
    later than the watermark are DROPPED — bounded state at 100 TB depends
    on exactly this.  Two single-file micro-batches (maxFilesPerTrigger=1):
    batch 0 advances the watermark past the first window; batch 1 delivers
    a late event into that window (must not count) and a fresh event into a
    still-open window (must not emit)."""
    import os
    import time
    from datetime import datetime

    src = str(tmp_path / "late_feed")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, se.EVENT_SCHEMA)
        tmp = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.format("json").save(tmp)
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        dest = os.path.join(src, name + ".json")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    t = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    base = time.time() - 1000
    sink = str(tmp_path / "late_sink")

    def run_once():
        stream = spark.readStream.schema(se.EVENT_SCHEMA).json(src)
        out = se.windowed_rollup(stream, window="1 hour", watermark="1 hour")
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ck_late"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: two clicks in [10:00, 11:00) + one at 13:05 → watermark
    # (1 hour) checkpoints at 12:05, past the first window's end
    write_file(
        "a",
        [
            (1, t(10, 5), 1, "click", 1.0, "{}"),
            (2, t(10, 10), 2, "click", 1.0, "{}"),
            (3, t(13, 5), 1, "click", 1.0, "{}"),
        ],
        base,
    )
    run_once()
    # run 2 (same checkpoint → watermark restored at 12:05): a LATE click
    # into the closed window + one into the still-open 13:00 window
    write_file(
        "b",
        [
            (4, t(10, 30), 1, "click", 1.0, "{}"),
            (5, t(13, 10), 2, "click", 1.0, "{}"),
        ],
        base + 100,
    )
    run_once()
    rows = spark.read.parquet(sink).collect()
    # exactly ONE finalized window: [10:00, 11:00) with n=2 — the late
    # event neither bumped the count nor re-emitted the window, and the
    # still-open 13:00 window produced nothing
    assert len(rows) == 1
    r = rows[0]
    assert (r.window_start.hour, r.event_type, r.n) == (10, "click", 2)


@pytest.mark.soak
def test_sessions_streamed_equals_batch_twin(spark):
    """The gate query drives the REAL writeStream path (parquet file
    source, maxFilesPerTrigger=1, availableNow, restart on the same
    checkpoint with the cut placed inside an open session) and must emit
    exactly the batch twin's sessions.  The oracle-gate sweep checks this
    against DuckDB too; this test pins Spark-vs-Spark equality with the
    applyInPandasWithState path actually executed."""
    from sparkroach.queries import QUERIES
    from tests.conftest import SF_SMALL

    streamed = QUERIES["events_sessions_streamed"].fn(spark, SF_SMALL)
    batch = QUERIES["events_user_sessions"].fn(spark, SF_SMALL)
    assert [tuple(r) for r in streamed.collect()] == [
        tuple(r) for r in batch.collect()
    ]


@pytest.mark.soak
def test_stream_stream_join_restart_cut_straddles_a_pair(spark):
    """events_join_streamed places its restart cut inside the WIDEST
    matched (signup, purchase) pair.  For the recovery claim to be
    non-vacuous, such a pair must exist with room for a cut (gap >= 2 us)
    — verify from the batch side, and verify the streamed result contains
    a pair straddling that cut (signup before, purchase at/after)."""
    from pyspark.sql import functions as F

    from sparkroach.queries import QUERIES
    from sparkroach.streaming.events import JOIN_WINDOW_HOURS
    from sparkroach.tables import load
    from tests.conftest import SF_SMALL

    ev = load(spark, SF_SMALL, "events")
    w_us = JOIN_WINDOW_HOURS * 3600 * 1_000_000
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.unix_micros("ts").alias("s_us")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_micros("ts").alias("p_us")
    )
    widest = (
        s.join(
            p,
            (F.col("su") == F.col("pu"))
            & (F.col("p_us") >= F.col("s_us"))
            & (F.col("p_us") <= F.col("s_us") + F.lit(w_us)),
        )
        .select((F.col("p_us") - F.col("s_us")).alias("gap"), "s_us", "p_us")
        .orderBy(F.col("gap").desc())
        .limit(1)
        .collect()
    )
    assert widest and widest[0].gap >= 2, "no matched pair with cut room"
    cut = widest[0].s_us + widest[0].gap // 2

    streamed = QUERIES["events_join_streamed"].fn(spark, SF_SMALL).collect()
    assert len(streamed) > 0
    straddling = [
        r
        for r in streamed
        if r.signup_ts.timestamp() * 1_000_000 < cut
        <= r.purchase_ts.timestamp() * 1_000_000
    ]
    assert straddling, "no emitted pair spans the restart cut"


def test_dedup_jitter_collapses_what_plain_dedup_cannot(spark):
    """The jittered redelivery's whole point: with the event-time column
    in the keys (the plain dropDuplicates contract that lets state
    evict), the drifted replay is a DIFFERENT key and survives; the
    within-watermark operator collapses it.  Pin both halves."""
    from pyspark.sql import functions as F

    from sparkroach.queries import QUERIES
    from sparkroach.streaming.events import REDELIVERY_JITTER_S
    from sparkroach.tables import load
    from tests.conftest import SF_SMALL

    ev = load(spark, SF_SMALL, "events")
    n = ev.count()
    # the within-watermark gate keeps exactly the first delivery
    out = QUERIES["events_dedup_jitter_streamed"].fn(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) == n
    originals = {
        (r["event_id"], r["ts"]) for r in ev.select("event_id", "ts").collect()
    }
    assert {(r["event_id"], r["ts"]) for r in rows} == originals
    # and the jittered copy really is a distinct (event_id, ts) key —
    # i.e. plain key-based dedup would have emitted 2n rows
    jit = {
        (r["event_id"], r["ts"])
        for r in ev.select(
            "event_id",
            F.timestamp_micros(
                F.unix_micros("ts") + REDELIVERY_JITTER_S * 1_000_000
            ).alias("ts"),
        ).collect()
    }
    assert not (jit & originals)


def test_update_mode_straddling_hour_is_nonvacuous(spark):
    """The update-mode gate's recovery claim rests on at least one
    (hour, type) group receiving rows in BOTH delivery halves — its
    final cumulative row then requires state recovered across the
    restart.  Verify such a group exists and its final count equals the
    full batch aggregate."""
    from pyspark.sql import functions as F

    from sparkroach.queries import QUERIES
    from sparkroach.tables import load
    from tests.conftest import SF_SMALL

    ev = load(spark, SF_SMALL, "events")
    # the gate's data-adaptive cut: second-earliest distinct event time
    # of the busiest (hour, type) group
    busiest = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("h"),
            F.col("event_type").alias("et"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("h"), F.col("et"))
        .limit(1)
    )
    in_grp = ev.join(
        F.broadcast(busiest),
        (F.date_trunc("hour", ev["ts"]) == F.col("h"))
        & (ev["event_type"] == F.col("et")),
    ).select(F.unix_micros("ts").alias("t_us"))
    t1 = in_grp.agg(F.min("t_us").alias("m")).collect()[0].m
    cut = (
        in_grp.where(F.col("t_us") > t1)
        .agg(F.min("t_us").alias("m"))
        .collect()[0]
        .m
    )
    halves = (
        ev.select(
            F.date_trunc("hour", "ts").alias("hour_bucket"),
            "event_type",
            (F.unix_micros("ts") < F.lit(cut)).alias("first_half"),
        )
        .groupBy("hour_bucket", "event_type")
        .agg(F.countDistinct("first_half").alias("sides"))
    )
    straddling = halves.where(F.col("sides") == 2).count()
    assert straddling > 0, "no (hour, type) group spans the restart cut"

    out = {
        (r["hour_bucket"], r["event_type"]): r["n"]
        for r in QUERIES["events_rollup_update_streamed"].fn(
            spark, SF_SMALL
        ).collect()
    }
    batch = {
        (r["hour_bucket"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_bucket"), "event_type"
        )
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert out == batch


def test_statestore_reader_exposes_open_sessions(spark, tmp_path):
    """Spark 4's `statestore` batch source reads a streaming checkpoint's
    state store directly — the ops/debugging face of stateful streaming.
    After a partial sessionizer run (no close signal), the store must
    hold EXACTLY the open sessions: one row per user, with
    (start_us, last_us, n_events) equal to the batch-computed last
    segment of each user's delivered events."""
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from sparkroach.tables import load

    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ev = load(spark, "/root/testdata/sf0.001", "events")
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        stage = str(tmp_path / "stage")
        ev.coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part), os.path.join(feed, "b0.parquet"))

        ck = str(tmp_path / "ck")
        q = (
            se.sessionize(
                spark.readStream.schema(se.EVENT_SCHEMA).parquet(feed),
                gap_seconds=1800,
                idle_timeout=False,
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

        state = (
            spark.read.format("statestore")
            .load(ck)
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("value.groupState.start_us").alias("start_us"),
                F.col("value.groupState.last_us").alias("last_us"),
                F.col("value.groupState.n_events").alias("n_events"),
            )
        )

        # batch truth: each user's OPEN session = last gap-delimited segment
        w = W.partitionBy("user_id").orderBy("t_us")
        seg = (
            ev.select("user_id", F.unix_micros("ts").alias("t_us"))
            .withColumn("pt", F.lag("t_us").over(w))
            .withColumn(
                "new_seg",
                (F.col("pt").isNull()
                 | (F.col("t_us") - F.col("pt") > 1_800_000_000)).cast("int"),
            )
            .withColumn(
                "seg_id",
                F.sum("new_seg").over(
                    w.rowsBetween(W.unboundedPreceding, 0)
                ),
            )
        )
        expected = (
            seg.groupBy("user_id", "seg_id")
            .agg(
                F.min("t_us").alias("start_us"),
                F.max("t_us").alias("last_us"),
                F.count("*").alias("n_events"),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("user_id").orderBy(F.col("seg_id").desc())
                ),
            )
            .where(F.col("rn") == 1)
            .select("user_id", "start_us", "last_us", "n_events")
        )
        got = sorted(map(tuple, state.collect()))
        want = sorted(map(tuple, expected.collect()))
        assert got == want and len(got) == ev.select("user_id").distinct().count()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_sessions_tws_streamed(spark):
    """transformWithStateInPandas sessionizer vs the batch twin — runs
    only where pyspark's TWS state-server protocol dependency
    (google.protobuf) exists; this container does not ship it."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs google.protobuf "
        "(pyspark StateMessage_pb2); not installed in this environment",
    )
    from sparkroach.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    got = se.events_sessions_tws_streamed(spark, sf).collect()
    want = QUERIES["events_user_sessions"].fn(spark, sf).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


@pytest.mark.soak
def test_sessions_streamed_under_rocksdb_state_store(spark):
    """The sessionizer gate (restart mid-session included) must produce
    identical results on the RocksDBStateStoreProvider — the state
    backend that holds at 100 TB, where the default in-memory/HDFS
    provider's per-executor heap becomes the ceiling.  Checkpoint
    recovery across the gate's restart exercises RocksDB snapshot
    restore, not just puts/gets."""
    from sparkroach.queries import QUERIES
    from tests.conftest import SF_SMALL

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        streamed = QUERIES["events_sessions_streamed"].fn(spark, SF_SMALL)
        batch = QUERIES["events_user_sessions"].fn(spark, SF_SMALL)
        assert [tuple(r) for r in streamed.collect()] == [
            tuple(r) for r in batch.collect()
        ]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_topk_streamed_equals_batch_rank_window(spark):
    """The custom top-k accumulator state (restart mid-stream, sentinel
    close) must emit exactly the batch rank window's top-3 per user —
    the order statistic survives checkpoint recovery."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkroach.queries import QUERIES
    from sparkroach.tables import load
    from tests.conftest import SF_SMALL

    streamed = sorted(
        tuple(r)
        for r in QUERIES["events_topk_per_user_streamed"]
        .fn(spark, SF_SMALL)
        .collect()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cents").desc(), F.col("event_id")
    )
    batch = sorted(
        tuple(r)
        for r in load(spark, SF_SMALL, "events")
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("user_id", "rank", F.col("cents").alias("value_cents"), "event_id")
        .collect()
    )
    assert streamed == batch and len(streamed) > 0
