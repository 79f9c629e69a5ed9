"""Event-stream operators (Structured Streaming).

The chain engine's streaming plane (chain.ingest) is strictly-ordered
foreachBatch MERGE; this module covers the other streaming shapes a
100 TB event pipeline needs:

- `windowed_rollup`: event-time tumbling windows with a watermark — late
  rows beyond the watermark are dropped by the engine, state is bounded;
- `sessionize`: a CUSTOM stateful operator via applyInPandasWithState —
  per-user session tracking with gap timeout, the pattern for any
  accumulate-and-emit operator Spark lacks natively (the batch twin is
  queries/analytics.events_user_sessions, so the semantics are
  oracle-checked there).

Both return running StreamingQuery handles writing to an in-memory sink
for tests; production swaps the sink for parquet/Kafka with the same plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sparkroach.queries.analytics import SESSIONS_ORACLE
from sparkroach.queries.registry import register
from sparkroach.tables import load

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts with bounded state.

    The watermark bounds the aggregation state: windows older than
    (max event time - watermark) finalize and evict.  At 100 TB of events
    this is the difference between O(open windows) and O(history) state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("w").end.alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame, gap_seconds: int = 1800, idle_timeout: bool = True
) -> DataFrame:
    """Custom stateful operator: per-user sessions with a gap timeout.

    State per user is three longs; a session closes (and emits one row)
    when a gap > gap_seconds appears inside a batch or the processing-time
    timeout fires with no new events.  This is the applyInPandasWithState
    template for any custom accumulate-and-emit operator.

    ``idle_timeout=False`` disables the processing-time timeout (sessions
    then only close via in-batch gaps).  Use it for availableNow runs
    whose feed carries an explicit close signal: with timeouts registered,
    an availableNow trigger does NOT terminate after the last file — it
    keeps firing empty "cleaning up state" batches until every pending
    processing-time timeout (up to gap_seconds of WALL CLOCK) has fired,
    which for a gate query means minutes of 0-row batches and a leaked
    running query if the caller stops waiting.

    The closure is self-contained (see functions/multimodal.py for why).
    """
    gap_us = gap_seconds * 1_000_000

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        def _emit(start_us: int, end_us: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "session_start": _dt.datetime.utcfromtimestamp(start_us / 1e6),
                "session_end": _dt.datetime.utcfromtimestamp(end_us / 1e6),
                "n_events": n,
            }

        closed: list[dict] = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append(_emit(s, last, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
            ts_list.sort()
            if not ts_list:
                yield pd.DataFrame(
                    [], columns=[f.name for f in SESSION_OUTPUT.fields]
                )
                return
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts_list[0], ts_list[0], 0
            for t_us in ts_list:
                if t_us - last > gap_us:
                    closed.append(_emit(start, last, n))
                    start, n = t_us, 0
                last = t_us if t_us > last else last
                n += 1
            state.update((start, last, n))
            if idle_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT.fields])

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


@register(
    "events_sessions_streamed",
    oracle=SESSIONS_ORACLE,
    survey_ref="§2C streaming state — the REAL writeStream path: file "
    "source → applyInPandasWithState → parquet sink, availableNow, 4 "
    "micro-batches with a query restart (state recovered from checkpoint) "
    "mid-stream; hash-matched against the batch twin's oracle",
    description="genuinely-streaming sessionization gate: events staged as "
    "time-ordered parquet micro-batch files (maxFilesPerTrigger=1), run to "
    "completion, MORE files staged, query restarted on the same checkpoint "
    "so open sessions span the restart; a far-future per-user sentinel in "
    "the final batch closes every open session so the emitted rows are "
    "exactly the oracle's session set",
)
def events_sessions_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the real Structured Streaming sessionizer end-to-end.

    Semantics contract (mirrors queries/analytics.events_user_sessions and
    its microsecond-exact SQL oracle): per-user sessions break on gaps
    > 1800 s.  The staged files partition events by disjoint increasing
    time ranges, so per-user event time is nondecreasing across
    micro-batches — the ordered-delivery assumption any production feed
    (Kafka per-key ordering) provides.  Parquet staging keeps microsecond
    timestamps exact (JSON's default format truncates to milliseconds,
    which could flip a gap comparison at the 1800.000 s boundary).

    The sentinel trick: one far-future event per user in the LAST
    micro-batch forces the in-batch gap path to close every still-open
    session; the sentinel's own session never emits (no later event, and
    idle_timeout=False means no processing-time timeout ever fires — which
    also lets the availableNow run terminate immediately after the last
    staged file instead of spinning state-cleanup batches).  Emitted rows
    are therefore exactly the real sessions.
    """
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql.window import Window

    # The state-store partition count is frozen from
    # spark.sql.shuffle.partitions at FIRST query start (and baked into the
    # checkpoint).  Under a vanilla driver session that default is 200 —
    # 200 state stores × one Python worker round each × 4 micro-batches of
    # tiny data (measured: 10× wall-clock on an idle 8-core local session).
    # Pin a small count for the ephemeral stream (fresh checkpoint per
    # invocation) and restore the caller's conf after.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    # place the restart cut INSIDE an open session, so the restart provably
    # recovers live state: find the first intra-session gap (≤ 1800 s) whose
    # left edge lies in the second half of the feed and cut at its midpoint
    half = lo + (hi - lo) // 2
    w = Window.partitionBy("user_id").orderBy("t_us")
    span = (
        ev.select("user_id", F.unix_micros("ts").alias("t_us"))
        .withColumn("pt", F.lag("t_us").over(w))
        .where(
            F.col("pt").isNotNull()
            & (F.col("t_us") - F.col("pt") <= 1_800_000_000)
            & (F.col("pt") >= F.lit(half))
        )
        .agg(F.min(F.struct("pt", "t_us")).alias("g"))
        .collect()[0][0]
    )
    cut2 = (
        (span.pt + span.t_us) // 2
        if span is not None
        else lo + 2 * (hi - lo) // 3
    )
    cut1 = lo + (cut2 - lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_sess_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            # idle_timeout=False: the sentinel batch closes open sessions,
            # so no processing-time timeouts are registered and the
            # availableNow run terminates right after the last staged file
            # (with timeouts it would spin "cleaning up state" empty
            # batches for up to 30 min of wall clock — see sessionize)
            sessionize(stream, gap_seconds=1800, idle_timeout=False)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut1)), base)
        stage("b1", ev.where((t_us >= F.lit(cut1)) & (t_us < F.lit(cut2))), base + 10)
        run_once()  # micro-batches 0,1 — then the query STOPS mid-stream

        stage("b2", ev.where(t_us >= F.lit(cut2)), base + 20)
        sentinel = ev.select("user_id").distinct().select(
            F.lit(-1).cast("long").alias("event_id"),
            F.timestamp_micros(
                F.lit(hi + 30 * 24 * 3600 * 1_000_000)
            ).alias("ts"),
            F.col("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        stage("b3", sentinel, base + 30)
        run_once()  # RESTART on the same checkpoint: state store recovered,
        # open sessions continue across the restart; micro-batches 2,3

        out = (
            spark.read.parquet(sink)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
            .where(F.col("user_id") < 25)
            .orderBy("user_id")
        )
        # localCheckpoint (eager, block-manager backed) so the temp sink can
        # be deleted before the caller collects — same pattern as
        # streaming/dedup.dedup_streaming_kept
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def sessionize_event_time(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Sessionizer variant closing sessions by EVENT-TIME TIMEOUT.

    Same per-user session semantics as `sessionize`, but a user's open
    session is closed by the WATERMARK passing (last event + gap) — the
    state-expiry machinery — rather than by that user's own next event
    or a per-user sentinel.  This is the production shape: a user who
    simply goes away still gets their final session emitted, driven by
    global stream progress, with state removed (bounded state without
    any cooperation from the key).

    Timeout is set to (last + gap) rounded UP to the next millisecond, so
    a follow-up event at exactly last + gap (which the batch oracle keeps
    IN the session, split is strictly `>`) can never race an
    already-fired timeout; and a group with data in a batch is never
    reported timed-out, so ordered feeds (per-key nondecreasing event
    time across micro-batches) make the two close paths agree exactly
    with the batch semantics.
    """
    gap_us = gap_seconds * 1_000_000

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        def _emit(start_us: int, end_us: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "session_start": _dt.datetime.utcfromtimestamp(start_us / 1e6),
                "session_end": _dt.datetime.utcfromtimestamp(end_us / 1e6),
                "n_events": n,
            }

        closed: list[dict] = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append(_emit(s, last, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
            ts_list.sort()
            if not ts_list:
                yield pd.DataFrame(
                    [], columns=[f.name for f in SESSION_OUTPUT.fields]
                )
                return
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts_list[0], ts_list[0], 0
            for t_us in ts_list:
                if t_us - last > gap_us:
                    closed.append(_emit(start, last, n))
                    start, n = t_us, 0
                last = t_us if t_us > last else last
                n += 1
            state.update((start, last, n))
            # fire strictly after last + gap (ceil to ms): the watermark
            # reaching exactly last + gap must NOT close the session
            state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT.fields])

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


@register(
    "events_sessions_timeout_streamed",
    oracle=SESSIONS_ORACLE,
    survey_ref="§2C streaming state — EventTimeTimeout expiry path of "
    "applyInPandasWithState: sessions close because the WATERMARK passes "
    "last-event + gap, not because the user's own next event (or a "
    "per-user sentinel) arrives — the state-machine branch "
    "events_sessions_streamed never takes for real sessions",
    description="same session semantics and oracle as "
    "events_sessions_streamed, closed by the opposite mechanism: every "
    "real session that isn't split by an in-batch gap is emitted from "
    "hasTimedOut state when the global watermark overtakes it, driven by "
    "two single-row far-future sentinel batches (advance, then the batch "
    "whose timeout sweep emits).  A restart sits mid-session, so the "
    "timeout that later fires is computed from RECOVERED state — lost "
    "state would lose the pre-restart half of the session.  The emitted "
    "rows must equal the batch sessionizer's microsecond-exact oracle",
    gated=False,  # r6 rotation candidate (window frozen this round)
)
def events_sessions_timeout_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the event-time-timeout sessionizer end-to-end.

    Staging mirrors events_sessions_streamed (time-ordered files, restart
    cut inside an open session), but the tail sessions close via the
    watermark: sentinel batch 1 (one row, user −1, hi + 30 d) advances
    the watermark; sentinel batch 2 (hi + 31 d) is the batch during whose
    processing every real user's timeout fires.  No per-user sentinels:
    state expiry does the closing, which is the point.
    """
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql.window import Window

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    half = lo + (hi - lo) // 2
    w = Window.partitionBy("user_id").orderBy("t_us")
    span = (
        ev.select("user_id", F.unix_micros("ts").alias("t_us"))
        .withColumn("pt", F.lag("t_us").over(w))
        .where(
            F.col("pt").isNotNull()
            & (F.col("t_us") - F.col("pt") <= 1_800_000_000)
            & (F.col("pt") >= F.lit(half))
        )
        .agg(F.min(F.struct("pt", "t_us")).alias("g"))
        .collect()[0][0]
    )
    cut2 = (
        (span.pt + span.t_us) // 2
        if span is not None
        else lo + 2 * (hi - lo) // 3
    )
    cut1 = lo + (cut2 - lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_sess_timeout_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def sentinel(n: int, t_us: int) -> DataFrame:
        return spark.range(1).select(
            F.lit(-n).cast("long").alias("event_id"),
            F.timestamp_micros(F.lit(t_us)).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            sessionize_event_time(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut1)), base)
        stage(
            "b1",
            ev.where((t_us >= F.lit(cut1)) & (t_us < F.lit(cut2))),
            base + 10,
        )
        run_once()  # micro-batches 0,1 — the query STOPS mid-session

        stage("b2", ev.where(t_us >= F.lit(cut2)), base + 20)
        stage("b3", sentinel(1, hi + 30 * 24 * 3600 * 1_000_000), base + 30)
        stage("b4", sentinel(2, hi + 31 * 24 * 3600 * 1_000_000), base + 40)
        run_once()  # RESTART: recovered state; b3 advances the watermark,
        # b4's timeout sweep emits every remaining real session
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
            .where(F.col("user_id") < 25)
            .orderBy("user_id")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def sessionize_tws(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessionizer on transformWithStateInPandas (Spark 4's arbitrary
    stateful API, the applyInPandasWithState successor).

    Same session semantics as `sessionize`/`sessionize_event_time`, but
    built from the new primitives: a typed ValueState for the open
    session and an EXPLICIT event-time timer per key (registerTimer /
    handleExpiredTimer) instead of the single implicit GroupState
    timeout.  Timers accumulate rather than replace, so each
    handleInputRows deletes the key's previous timer before registering
    the new (last + gap) one — the discipline the richer API demands.
    TTL, ListState/MapState, and multiple timers per key are available
    on the same handle; this operator deliberately uses the smallest
    subset that reproduces the oracle semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = gap_seconds * 1_000_000

    def _row(key: tuple, start_us: int, end_us: int, n: int) -> dict:
        import datetime as _dt

        return {
            "user_id": key[0],
            "session_start": _dt.datetime.utcfromtimestamp(start_us / 1e6),
            "session_end": _dt.datetime.utcfromtimestamp(end_us / 1e6),
            "n_events": n,
        }

    cols = [f.name for f in SESSION_OUTPUT.fields]

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "session", "start_us long, last_us long, n_events long"
            )

        def handleInputRows(
            self, key: tuple, rows, timerValues: TimerValues
        ):
            ts_list: list[int] = []
            for pdf in rows:
                ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
            ts_list.sort()
            if not ts_list:
                yield pd.DataFrame([], columns=cols)
                return
            if self._state.exists():
                start, last, n = self._state.get()
            else:
                start, last, n = ts_list[0], ts_list[0], 0
            closed: list[dict] = []
            for t_us in ts_list:
                if t_us - last > gap_us:
                    closed.append(_row(key, start, last, n))
                    start, n = t_us, 0
                last = t_us if t_us > last else last
                n += 1
            self._state.update((start, last, n))
            # timers ACCUMULATE in this API: drop the stale one first
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer((last + gap_us) // 1000 + 1)
            yield pd.DataFrame(closed, columns=cols)

        def handleExpiredTimer(
            self,
            key: tuple,
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ):
            if self._state.exists():
                start, last, n = self._state.get()
                self._state.clear()
                yield pd.DataFrame([_row(key, start, last, n)], columns=cols)
            else:
                yield pd.DataFrame([], columns=cols)

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(),
            outputStructType=SESSION_OUTPUT,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def events_sessions_tws_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the transformWithStateInPandas sessionizer end-to-end.

    NOT registered as a gate: transformWithStateInPandas needs the
    `google.protobuf` Python package for its state-server protocol
    (pyspark/sql/streaming/proto/StateMessage_pb2), which this
    environment does not provide and cannot install.  The operator and
    this driver are complete and oracle-equivalent by construction
    (same staging and SESSIONS_ORACLE semantics as
    events_sessions_timeout_streamed); the guarded test
    (tests/test_streaming_events.py::test_sessions_tws_streamed) runs
    them the moment protobuf is importable and is skipped — loudly —
    until then.
    """
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql.window import Window

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    half = lo + (hi - lo) // 2
    w = Window.partitionBy("user_id").orderBy("t_us")
    span = (
        ev.select("user_id", F.unix_micros("ts").alias("t_us"))
        .withColumn("pt", F.lag("t_us").over(w))
        .where(
            F.col("pt").isNotNull()
            & (F.col("t_us") - F.col("pt") <= 1_800_000_000)
            & (F.col("pt") >= F.lit(half))
        )
        .agg(F.min(F.struct("pt", "t_us")).alias("g"))
        .collect()[0][0]
    )
    cut2 = (
        (span.pt + span.t_us) // 2
        if span is not None
        else lo + 2 * (hi - lo) // 3
    )
    cut1 = lo + (cut2 - lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_sess_tws_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def sentinel(n: int, t_us: int) -> DataFrame:
        return spark.range(1).select(
            F.lit(-n).cast("long").alias("event_id"),
            F.timestamp_micros(F.lit(t_us)).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            sessionize_tws(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut1)), base)
        stage(
            "b1",
            ev.where((t_us >= F.lit(cut1)) & (t_us < F.lit(cut2))),
            base + 10,
        )
        run_once()  # micro-batches 0,1 — the query STOPS mid-session

        stage("b2", ev.where(t_us >= F.lit(cut2)), base + 20)
        stage("b3", sentinel(1, hi + 30 * 24 * 3600 * 1_000_000), base + 30)
        stage("b4", sentinel(2, hi + 31 * 24 * 3600 * 1_000_000), base + 40)
        run_once()  # RESTART: recovered ValueState + timers; b3 advances
        # the watermark, b4's timer sweep emits every remaining session
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
            .where(F.col("user_id") < 25)
            .orderBy("user_id")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "events_rollup_streamed",
    # r4 end-of-round: rotated IN for a first driver recording this round
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_bucket,
               event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour_bucket, event_type
    """,
    survey_ref="§2C streaming windowed agg — the REAL writeStream path for "
    "the BUILT-IN watermarked aggregation (windowed_rollup): file source → "
    "watermark + tumbling window → parquet sink in append mode, with a "
    "query restart (agg state recovered from checkpoint) mid-stream",
    description="genuinely-streaming rollup gate: events staged as "
    "time-ordered parquet micro-batch files, run availableNow, restarted "
    "on the same checkpoint so in-flight windows span the restart; two "
    "far-future sentinel batches advance the watermark past every real "
    "window so append mode finalizes them all exactly once, then the "
    "sentinel windows are filtered out — the sink must equal the batch "
    "twin events_minute_rollup's oracle bit-for-bit",
)
def events_rollup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the real watermarked window aggregation end-to-end.

    Semantics contract (mirrors queries/analytics.events_minute_rollup):
    1-hour tumbling event-time windows, decimal-exact value sums.  Append
    mode emits each window EXACTLY ONCE, when the watermark (max event
    time seen in the PREVIOUS micro-batch minus 2 h) passes the window
    end.  The staged files partition events into disjoint increasing time
    ranges, so the watermark only moves forward.

    The sentinel trick, adapted for the built-in operator: a first
    far-future batch (hi + 30 d) advances the watermark past every real
    window, and a second one (hi + 31 d) provides the batch DURING which
    that advanced watermark evicts + emits them (eviction in batch N uses
    the watermark derived from batch N−1).  The sentinels' own windows
    stay open in state forever and are filtered by window_start ≤ hi.

    The restart cut sits between the two real batches, so windows
    straddling the cut prove the aggregation state (partial counts +
    decimal sums) is recovered from the checkpoint, not recomputed.
    """
    import os
    import shutil
    import tempfile
    import time

    # see events_sessions_streamed: pin a small state-store partition count
    # for the ephemeral stream, restore the caller's conf in finally
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    cut = lo + (hi - lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_rollup_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            windowed_rollup(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    def sentinel(n: int, t_us: int) -> DataFrame:
        return spark.range(1).select(
            F.lit(-n).cast("long").alias("event_id"),
            F.timestamp_micros(F.lit(t_us)).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut)), base)
        run_once()  # micro-batch 0 — the query STOPS with open windows

        stage("b1", ev.where(t_us >= F.lit(cut)), base + 10)
        stage("b2", sentinel(1, hi + 30 * 24 * 3600 * 1_000_000), base + 20)
        stage("b3", sentinel(2, hi + 31 * 24 * 3600 * 1_000_000), base + 30)
        run_once()  # RESTART on the same checkpoint: window state recovered;
        # b2 advances the watermark, b3 is the batch whose commit emits
        # every real window

        out = (
            spark.read.parquet(sink)
            .where(F.unix_micros("window_start") <= F.lit(hi))
            .select(
                F.col("window_start").alias("hour_bucket"),
                "event_type",
                "n",
                "total_value",
            )
            .orderBy("hour_bucket", "event_type")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


JOIN_WINDOW_HOURS = 2


@register(
    "events_join_streamed",
    oracle=f"""
        SELECT s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM events s JOIN events p
          ON s.user_id = p.user_id
         AND s.event_type = 'signup' AND p.event_type = 'purchase'
         AND p.ts >= s.ts
         AND p.ts <= s.ts + INTERVAL {JOIN_WINDOW_HOURS} HOUR
        ORDER BY s.user_id, signup_ts, purchase_ts
    """,
    survey_ref="§2C streaming — STREAM-STREAM interval join through the "
    "real writeStream path: two watermarked file sources, inner join on "
    "key + event-time range, append sink, restart mid-stream with the "
    "buffered join state recovered from the checkpoint",
    description=f"signup and purchase streams joined on user within a "
    f"{JOIN_WINDOW_HOURS}-hour event-time window — Spark buffers each "
    "side's rows in watermark-bounded state and emits matches exactly "
    "once.  The restart cut is placed INSIDE the widest matched pair "
    "(found from the data), so the signup is buffered before the restart "
    "and its purchase arrives after: the emitted pair proves join state "
    "recovery, not recomputation.  Sink must equal the batch interval "
    "join bit-for-bit",
)
def events_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive a real stream-stream inner interval join end-to-end.

    Both sides read the same staged parquet feed (each readStream source
    tracks its own file progress); watermarks bound the join state on
    both sides.  Eviction safety of the straddling pair is by
    construction: the pair spans the cut with |p.ts − s.ts| ≤ the join
    window, and b0's max event time is < cut, so the signup's state
    cannot be evicted before the restart (watermark = max_seen − delay ≤
    cut − delay < s.ts + window).
    """
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    w_us = JOIN_WINDOW_HOURS * 3600 * 1_000_000
    # find the widest matched pair to place the restart cut inside it
    s_side = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.unix_micros("ts").alias("s_us")
    )
    p_side = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_micros("ts").alias("p_us")
    )
    widest = (
        s_side.join(
            p_side,
            (F.col("su") == F.col("pu"))
            & (F.col("p_us") >= F.col("s_us"))
            & (F.col("p_us") <= F.col("s_us") + F.lit(w_us)),
        )
        .select((F.col("p_us") - F.col("s_us")).alias("gap"), "s_us", "p_us")
        .orderBy(F.col("gap").desc())
        .limit(1)
        .collect()
    )
    if widest and widest[0].gap >= 2:
        cut = widest[0].s_us + widest[0].gap // 2
    else:  # no matched pair with room — fall back to the global midpoint
        b = ev.agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
        ).collect()[0]
        cut = b.lo + (b.hi - b.lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_join_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        def source() -> DataFrame:
            return (
                spark.readStream.schema(EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )

        signups = (
            source()
            .where(F.col("event_type") == "signup")
            .select(
                F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts")
            )
            .withWatermark("signup_ts", f"{JOIN_WINDOW_HOURS} hours")
        )
        purchases = (
            source()
            .where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("value").alias("purchase_value"),
            )
            .withWatermark("purchase_ts", f"{JOIN_WINDOW_HOURS} hours")
        )
        joined = signups.join(
            purchases,
            F.expr(
                f"""s_user = p_user
                AND purchase_ts >= signup_ts
                AND purchase_ts <= signup_ts + INTERVAL {JOIN_WINDOW_HOURS} HOURS"""
            ),
        ).select(
            F.col("s_user").alias("user_id"),
            "signup_ts",
            "purchase_ts",
            "purchase_value",
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut)), base)
        run_once()  # signups before the cut are now buffered join state
        stage("b1", ev.where(t_us >= F.lit(cut)), base + 10)
        run_once()  # RESTART on the same checkpoint: the straddling pair
        # can only be emitted from RECOVERED state
        out = spark.read.parquet(sink).orderBy(
            "user_id", "signup_ts", "purchase_ts"
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "events_left_join_streamed",
    oracle=f"""
        SELECT s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON s.user_id = p.user_id
         AND p.ts >= s.ts
         AND p.ts <= s.ts + INTERVAL {JOIN_WINDOW_HOURS} HOUR
        ORDER BY s.user_id, signup_ts, purchase_ts
    """,
    survey_ref="§2C streaming — stream-stream LEFT OUTER interval join "
    "through the real writeStream path: matched pairs emit on arrival, "
    "null-extended rows emit ONLY when the watermark proves no match can "
    "still arrive (the state-expiry emission path the inner join never "
    "exercises)",
    description="the left-outer complement to events_join_streamed: "
    "signups with no purchase in the window must surface as null-extended "
    "rows, which Spark emits from EXPIRING state — so the gate proves the "
    "watermark-eviction emission path, not just match buffering.  "
    "Far-future sentinel batches advance the watermark past every real "
    "signup's window (emission happens in the batch AFTER the advance), "
    "a restart sits mid-stream inside the widest matched pair, and the "
    "sink must equal the batch LEFT JOIN bit-for-bit",
)
def events_left_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive a real stream-stream left-outer interval join end-to-end.

    Timing contract: null-extended rows for a signup at S are emitted
    once the watermark passes S + window (+ delay) — during the batch
    AFTER the watermark-advancing one (eviction in batch N uses the
    watermark derived from batch N−1), hence TWO sentinel batches, the
    same two-step as events_rollup_streamed.  The sentinel signup's own
    state never expires (no later batch) and is filtered by user_id >= 0
    regardless.  Premature eviction of real signups is impossible: all
    real files precede the sentinels in mtime order, so while real rows
    flow the watermark is bounded by real event times minus the delay.
    """
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    w_us = JOIN_WINDOW_HOURS * 3600 * 1_000_000
    # restart cut inside the widest matched pair (see events_join_streamed)
    s_side = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.unix_micros("ts").alias("s_us")
    )
    p_side = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_micros("ts").alias("p_us")
    )
    widest = (
        s_side.join(
            p_side,
            (F.col("su") == F.col("pu"))
            & (F.col("p_us") >= F.col("s_us"))
            & (F.col("p_us") <= F.col("s_us") + F.lit(w_us)),
        )
        .select((F.col("p_us") - F.col("s_us")).alias("gap"), "s_us", "p_us")
        .orderBy(F.col("gap").desc())
        .limit(1)
        .collect()
    )
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    if widest and widest[0].gap >= 2:
        cut = widest[0].s_us + widest[0].gap // 2
    else:
        cut = b.lo + (b.hi - b.lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_ljoin_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def sentinel(n: int, t_us: int) -> DataFrame:
        # one row of EACH type so both branches' watermarks advance
        # (the query watermark is the min across inputs)
        return spark.createDataFrame(
            [
                (-(2 * n), None, -1, "signup", 0.0, "{}"),
                (-(2 * n + 1), None, -1, "purchase", 0.0, "{}"),
            ],
            EVENT_SCHEMA,
        ).withColumn("ts", F.timestamp_micros(F.lit(t_us)))

    def run_once() -> None:
        def source() -> DataFrame:
            return (
                spark.readStream.schema(EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )

        signups = (
            source()
            .where(F.col("event_type") == "signup")
            .select(
                F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts")
            )
            .withWatermark("signup_ts", f"{JOIN_WINDOW_HOURS} hours")
        )
        purchases = (
            source()
            .where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("value").alias("purchase_value"),
            )
            .withWatermark("purchase_ts", f"{JOIN_WINDOW_HOURS} hours")
        )
        joined = signups.join(
            purchases,
            F.expr(
                f"""s_user = p_user
                AND purchase_ts >= signup_ts
                AND purchase_ts <= signup_ts + INTERVAL {JOIN_WINDOW_HOURS} HOURS"""
            ),
            "leftOuter",
        ).select(
            F.col("s_user").alias("user_id"),
            "signup_ts",
            "purchase_ts",
            "purchase_value",
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut)), base)
        run_once()  # pre-cut signups are now buffered join state
        stage("b1", ev.where(t_us >= F.lit(cut)), base + 10)
        stage("b2", sentinel(1, b.hi + 30 * 24 * 3600 * 1_000_000), base + 20)
        stage("b3", sentinel(2, b.hi + 31 * 24 * 3600 * 1_000_000), base + 30)
        run_once()  # RESTART: straddling pair from recovered state; b2
        # advances the watermark past every real signup's window, b3 is
        # the batch whose processing evicts + emits the null-extended rows
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .orderBy("user_id", "signup_ts", "purchase_ts")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "events_full_join_streamed",
    oracle=f"""
        SELECT COALESCE(s.user_id, p.user_id) AS user_id,
               s.ts AS signup_ts, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON s.user_id = p.user_id
         AND p.ts >= s.ts
         AND p.ts <= s.ts + INTERVAL {JOIN_WINDOW_HOURS} HOUR
        ORDER BY user_id, signup_ts, purchase_ts
    """,
    survey_ref="§2C streaming — stream-stream FULL OUTER interval join "
    "through the real writeStream path: null-extended rows emit from "
    "expiring state on BOTH sides, completing the inner/left/full join-"
    "mode matrix",
    description="the full-outer complement to events_join_streamed and "
    "events_left_join_streamed: unmatched signups AND unmatched "
    "purchases must both surface as null-extended rows, each emitted "
    "when the watermark proves its window can no longer match — so the "
    "gate exercises state expiry on the right side, which the left-outer "
    "gate never touches.  Two-step sentinel advance, restart mid-stream "
    "inside the widest matched pair, sink must equal the batch FULL "
    "JOIN bit-for-bit",
    gated=False,  # r6 rotation candidate (window frozen this round)
)
def events_full_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive a real stream-stream full-outer interval join end-to-end.

    Same eviction-timing contract as events_left_join_streamed (emission
    in the batch after the watermark-advancing one; sentinels carry one
    row per input so the min-across-inputs watermark advances), but with
    BOTH sides' unmatched state producing output on expiry.
    """
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    w_us = JOIN_WINDOW_HOURS * 3600 * 1_000_000
    s_side = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.unix_micros("ts").alias("s_us")
    )
    p_side = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_micros("ts").alias("p_us")
    )
    widest = (
        s_side.join(
            p_side,
            (F.col("su") == F.col("pu"))
            & (F.col("p_us") >= F.col("s_us"))
            & (F.col("p_us") <= F.col("s_us") + F.lit(w_us)),
        )
        .select((F.col("p_us") - F.col("s_us")).alias("gap"), "s_us", "p_us")
        .orderBy(F.col("gap").desc())
        .limit(1)
        .collect()
    )
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    if widest and widest[0].gap >= 2:
        cut = widest[0].s_us + widest[0].gap // 2
    else:
        cut = b.lo + (b.hi - b.lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_fjoin_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def sentinel(n: int, t_us: int) -> DataFrame:
        # one row of EACH type so both branches' watermarks advance
        return spark.createDataFrame(
            [
                (-(2 * n), None, -1, "signup", 0.0, "{}"),
                (-(2 * n + 1), None, -1, "purchase", 0.0, "{}"),
            ],
            EVENT_SCHEMA,
        ).withColumn("ts", F.timestamp_micros(F.lit(t_us)))

    def run_once() -> None:
        def source() -> DataFrame:
            return (
                spark.readStream.schema(EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )

        signups = (
            source()
            .where(F.col("event_type") == "signup")
            .select(
                F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts")
            )
            .withWatermark("signup_ts", f"{JOIN_WINDOW_HOURS} hours")
        )
        purchases = (
            source()
            .where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("value").alias("purchase_value"),
            )
            .withWatermark("purchase_ts", f"{JOIN_WINDOW_HOURS} hours")
        )
        joined = signups.join(
            purchases,
            F.expr(
                f"""s_user = p_user
                AND purchase_ts >= signup_ts
                AND purchase_ts <= signup_ts + INTERVAL {JOIN_WINDOW_HOURS} HOURS"""
            ),
            "fullOuter",
        ).select(
            F.coalesce(F.col("s_user"), F.col("p_user")).alias("user_id"),
            "signup_ts",
            "purchase_ts",
            "purchase_value",
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut)), base)
        run_once()  # pre-cut rows buffered on both sides
        stage("b1", ev.where(t_us >= F.lit(cut)), base + 10)
        stage("b2", sentinel(1, b.hi + 30 * 24 * 3600 * 1_000_000), base + 20)
        stage("b3", sentinel(2, b.hi + 31 * 24 * 3600 * 1_000_000), base + 30)
        run_once()  # RESTART: matched straddler from recovered state, then
        # expiry emission of unmatched state on BOTH sides
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .orderBy("user_id", "signup_ts", "purchase_ts")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "events_dedup_streamed",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        ORDER BY event_id
    """,
    survey_ref="§2C streaming — BUILT-IN streaming deduplication "
    "(dropDuplicates + watermark) through the real writeStream path: "
    "at-least-once upstream delivery collapsed to exactly-once output",
    description="the events feed is staged with every row DELIVERED "
    "TWICE in different micro-batches (the at-least-once redelivery "
    "every real broker exhibits), run through "
    "dropDuplicates(event_id, ts) — the event-time column is in the "
    "keys, which is what lets the watermark actually EVICT dedup state "
    "— with a query restart "
    "between the two deliveries — the redelivered rows can only be "
    "suppressed by dedup state recovered from the checkpoint.  Sink "
    "must equal the original events exactly",
)
def events_dedup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive built-in streaming dedup end-to-end under redelivery.

    Watermark note: dropDuplicates state is keyed by event_id and
    evicted once the watermark passes the row's event time by the delay.
    The duplicate delivery is staged with the SAME time range as the
    original (b1 replays b0), and the watermark delay spans the whole
    feed's time range, so no dedup state is evicted before the replay
    arrives — suppression is guaranteed by construction, and the restart
    between delivery and replay proves the state store survives."""
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    # watermark delay > full feed span ⇒ no state evicted mid-run
    delay_s = (b.hi - b.lo) // 1_000_000 + 3600

    root = tempfile.mkdtemp(prefix="sparkroach_dedup_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        # the event-time column MUST be part of the dedup keys: with a
        # key subset that excludes it, Spark cannot associate state rows
        # with event time and never evicts them (unbounded state — the
        # documented dropDuplicates+watermark contract).  Redelivered
        # rows carry identical (event_id, ts), so suppression is
        # unchanged; state is genuinely watermark-bounded.
        deduped = stream.withWatermark("ts", f"{delay_s} seconds").dropDuplicates(
            ["event_id", "ts"]
        )
        q = (
            deduped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        stage("b0", ev, base)  # first delivery: every event once
        run_once()  # dedup state now holds every event_id
        stage("b1", ev, base + 10)  # REDELIVERY: the whole feed again
        run_once()  # RESTART on the same checkpoint — the replayed rows
        # are suppressed only if the state store was recovered
        out = spark.read.parquet(sink).orderBy("event_id")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


REDELIVERY_JITTER_S = 30


@register(
    "events_dedup_jitter_streamed",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        ORDER BY event_id
    """,
    survey_ref="§2C streaming — dropDuplicatesWithinWatermark through the "
    "real writeStream path: redelivery with DRIFTED event timestamps "
    "(the case plain dropDuplicates cannot collapse, because the drifted "
    "ts makes the redelivered row a different key)",
    description="every event is delivered twice, and the second delivery "
    f"carries ts shifted by +{REDELIVERY_JITTER_S}s — the re-stamped "
    "redelivery real brokers produce on producer retry.  "
    "dropDuplicatesWithinWatermark(event_id) keeps the FIRST arrival and "
    "suppresses any same-key row whose event time lands within the "
    "watermark delay of it, so the jittered replays collapse; with the "
    "event-time column excluded from the keys, plain dropDuplicates "
    "would emit all of them (or never evict state).  A query restart "
    "sits between the deliveries, so suppression proves the "
    "within-watermark state store was recovered from the checkpoint.  "
    "Sink must equal the ORIGINAL feed exactly — first-arrival "
    "timestamps, one row per event",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_dedup_jitter_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive dropDuplicatesWithinWatermark end-to-end under re-stamped
    redelivery with a mid-run restart.

    State note: within-watermark dedup state for a key is evicted once
    the watermark passes (first-seen event time + delay); the delay here
    spans the whole feed's time range plus the jitter, so no state is
    evicted before the replay arrives — suppression is guaranteed by
    construction and the output equals the first delivery bit-for-bit.
    """
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    # delay > feed span + jitter ⇒ no state evicted mid-run
    delay_s = (b.hi - b.lo) // 1_000_000 + REDELIVERY_JITTER_S + 3600

    root = tempfile.mkdtemp(prefix="sparkroach_dedup_jitter_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        deduped = stream.withWatermark(
            "ts", f"{delay_s} seconds"
        ).dropDuplicatesWithinWatermark(["event_id"])
        q = (
            deduped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    jittered = ev.withColumn(
        "ts",
        F.timestamp_micros(
            F.unix_micros("ts") + REDELIVERY_JITTER_S * 1_000_000
        ),
    )
    try:
        stage("b0", ev, base)  # first delivery: original timestamps
        run_once()  # within-watermark state now holds every event_id
        stage("b1", jittered, base + 10)  # REDELIVERY, ts drifted +30s
        run_once()  # RESTART on the same checkpoint: the drifted rows
        # can only be suppressed by state recovered from the checkpoint
        out = spark.read.parquet(sink).orderBy("event_id")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "hll_streaming_merge",
    # oracle shared verbatim with the batch sketch: the streamed,
    # redelivered, restarted pipeline must land on the IDENTICAL sketch
    oracle=None,  # bound below after sketches imports cleanly
    survey_ref="§2C streaming — STREAMING sketch maintenance: per-micro-"
    "batch HyperLogLog partials appended to a durable sketch log through "
    "foreachBatch, compacted by register-wise max; at-least-once "
    "redelivery and a mid-stream restart leave the result bit-identical "
    "to the batch sketch (merge idempotence IS the dedup)",
    description="the streaming face of mergeability: each micro-batch "
    "computes its own 256-register partial (one grouped max over the "
    "batch) and APPENDS it to a parquet sketch log — no read-modify-"
    "write, no coordination.  The whole feed's first half is REDELIVERED "
    "after a query restart: because register-wise max is idempotent and "
    "commutative, the replayed partial is absorbed with no dedup state "
    "at all — the algebra does what events_dedup_streamed needs a state "
    "store for.  Final compaction reads only the tiny partial log.  "
    "Sink must equal hll_distinct_sketch's oracle bit-for-bit",
)
def hll_streaming_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a HyperLogLog over an event stream, exactly as a 100 TB
    deployment would: partial sketches per micro-batch, durable append
    log, max-merge compaction at read time.  The gate's delivery plan —
    half the feed, restart, the other half PLUS a full replay of the
    first half — proves the at-least-once safety claim by construction
    rather than asserting it."""
    import os
    import shutil
    import tempfile
    import time

    from sparkroach.queries.sketches import _hashed, _rho_col, _summary_cols

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    cut = b.lo + (b.hi - b.lo) // 2

    root = tempfile.mkdtemp(prefix="sparkroach_hll_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    store = os.path.join(root, "sketch_log")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            regs = (
                _hashed(batch_df.select("event_id"), "event_id")
                .select("bucket", _rho_col().alias("rho"))
                .groupBy("bucket")
                .agg(F.max("rho").alias("m_j"))
            )
            # append-only: a crash between this write and the checkpoint
            # commit re-runs the batch and re-appends — max-merge absorbs
            # the duplicate partial, so the log needs no transactionality
            regs.coalesce(1).write.mode("append").parquet(store)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        first = ev.where(t_us < F.lit(cut))
        stage("b0", first, base)
        run_once()  # partial sketch of the first half is in the log
        stage("b1", ev.where(t_us >= F.lit(cut)), base + 10)
        stage("b2", first, base + 20)  # AT-LEAST-ONCE: full redelivery
        run_once()  # RESTART on the same checkpoint; the replayed half's
        # partial lands in the log and max-merge absorbs it
        merged = (
            spark.read.parquet(store)
            .groupBy("bucket")
            .agg(F.max("m_j").alias("m_j"))
        )
        summary = merged.agg(*_summary_cols())
        exact = ev.agg(
            F.countDistinct("event_id").cast("long").alias("exact_distinct")
        )
        return summary.crossJoin(F.broadcast(exact)).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _bind_hll_streaming_oracle() -> None:
    """Attach the shared batch-sketch oracle after import (sketches.py and
    this module are registry siblings; importing it at module top would
    be fine today but this keeps the dependency one-directional and the
    shared-verbatim contract explicit)."""
    from dataclasses import replace

    from sparkroach.queries.registry import QUERIES
    from sparkroach.queries.sketches import HLL_GLOBAL_ORACLE

    q = QUERIES["hll_streaming_merge"]
    if q.oracle is None:
        QUERIES["hll_streaming_merge"] = replace(q, oracle=HLL_GLOBAL_ORACLE)


_bind_hll_streaming_oracle()


@register(
    "events_rollup_update_streamed",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_bucket,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour_bucket, event_type
    """,
    survey_ref="§2C streaming — UPDATE output mode through the real "
    "writeStream path (foreachBatch last-write-wins store): completes "
    "the output-mode matrix (append = events_rollup_streamed, "
    "update = here, complete subsumed by update's final state)",
    description="the same hourly rollup as events_rollup_streamed, but "
    "in UPDATE mode: every micro-batch emits the windows it changed "
    "with their CUMULATIVE aggregate values, and a foreachBatch sink "
    "appends them to an epoch-stamped log compacted by last-epoch-wins "
    "per (window, type) at read time — the keyed-MERGE pattern every "
    "streaming warehouse sink implements.  Unlike append mode, update "
    "emits windows that are still open, so the final state equals the "
    "FULL batch aggregate (no watermark finalization gap).  The feed "
    "is delivered in two time-ordered halves with a query RESTART "
    "between them: the cut-straddling hour's final row is correct only "
    "if the agg state recovered from the checkpoint (its second "
    "emission must include the first half's rows).  Log appends under "
    "replay are absorbed by last-epoch-wins, mirroring the HLL log's "
    "merge-idempotence story",
    gated=False,  # r5 rotation candidate (driver window frozen this round)
)
def events_rollup_update_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive UPDATE-mode windowed aggregation end-to-end with a mid-run
    restart and a last-write-wins keyed store."""
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    # data-adaptive cut: a blind midpoint can miss every (hour, type)
    # aggregation group at small SFs (~1 event/hour/type), leaving no
    # group with rows in BOTH halves — and then the restart recovers
    # nothing and the gate's recovery claim is vacuous.  Instead: find
    # the busiest (hour, type) GROUP (the aggregation's own grain) and
    # cut at its second-earliest distinct event time, so that group
    # provably has rows strictly before AND at/after the cut.
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
    assert cut is not None, "busiest group has a single distinct event time"
    # delay > feed span ⇒ no window state evicted mid-run: every window
    # keeps accepting updates, so the final state is the full aggregate
    delay_s = (b.hi - b.lo) // 1_000_000 + 3600

    root = tempfile.mkdtemp(prefix="sparkroach_update_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    store = os.path.join(root, "rollup_log")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        agg = (
            stream.withWatermark("ts", f"{delay_s} seconds")
            .groupBy(
                F.window("ts", "1 hour").alias("w"),
                F.col("event_type"),
            )
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)")).alias("tv"),
            )
            .select(
                F.col("w.start").alias("hour_bucket"),
                "event_type",
                "n",
                "tv",
            )
        )

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            # epoch-stamped append; compaction is last-epoch-wins per key
            batch_df.withColumn("epoch", F.lit(epoch_id)).coalesce(
                1
            ).write.mode("append").parquet(store)

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut)), base)
        run_once()  # open windows' partials are in the log + state store
        stage("b1", ev.where(t_us >= F.lit(cut)), base + 10)
        run_once()  # RESTART: the straddling hour's second emission is
        # cumulative only if the agg state recovered from the checkpoint
        from pyspark.sql import Window as W

        log = spark.read.parquet(store)
        lw = W.partitionBy("hour_bucket", "event_type").orderBy(
            F.col("epoch").desc()
        )
        out = (
            log.withColumn("rn", F.row_number().over(lw))
            .where(F.col("rn") == 1)
            .select(
                "hour_bucket",
                "event_type",
                "n",
                F.col("tv").cast("double").alias("total_value"),
            )
            .orderBy("hour_bucket", "event_type")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "events_dedup_then_rollup_streamed",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_bucket,
               event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour_bucket, event_type
    """,
    survey_ref="§2C streaming — CHAINED STATEFUL OPERATORS in one "
    "streaming query (dropDuplicates state feeding windowed-aggregation "
    "state, the multi-stateful pipeline Spark supports since 3.5): "
    "at-least-once redelivery collapses in the FIRST state store so the "
    "SECOND one aggregates each event exactly once",
    description="the full feed is delivered twice (producer redelivery) "
    "with a query restart between the deliveries; one streaming query "
    "runs dropDuplicates(event_id, ts) THEN the 1-hour tumbling "
    "decimal-exact rollup, so both state stores must be recovered from "
    "the checkpoint: lost dedup state would double every count, lost agg "
    "state would drop the first delivery.  The watermark delay spans the "
    "feed (dedup state must survive the replay), so window finalization "
    "is driven by two far-future sentinel batches after the replay "
    "(advance, then emit-on-next-batch).  Sink must equal the batch "
    "hourly rollup of the ORIGINAL feed bit-for-bit",
    gated=False,  # r6 rotation candidate (window frozen this round)
)
def events_dedup_then_rollup_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive two chained state stores in ONE streaming query end-to-end.

    State-size note for 100 TB: the dedup store here is deliberately
    feed-spanning (the redelivery arrives with identical event times, so
    eviction before the replay would break suppression); a production
    pipeline bounds it by the broker's real redelivery horizon — the
    watermark delay IS that horizon, and the window state downstream
    stays O(open windows) regardless.
    """
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    delay_s = (hi - lo) // 1_000_000 + 3600  # dedup state outlives the replay
    s1 = hi + (delay_s + 2 * 3600) * 1_000_000  # watermark → past every window
    s2 = s1 + 24 * 3600 * 1_000_000  # the batch DURING which eviction emits

    root = tempfile.mkdtemp(prefix="sparkroach_chain_state_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def sentinel(n: int, t_us: int) -> DataFrame:
        return spark.range(1).select(
            F.lit(-n).cast("long").alias("event_id"),
            F.timestamp_micros(F.lit(t_us)).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        deduped = stream.withWatermark(
            "ts", f"{delay_s} seconds"
        ).dropDuplicates(["event_id", "ts"])
        agg = (
            deduped.groupBy(
                F.window("ts", "1 hour").alias("w"), F.col("event_type")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(
                F.col("w.start").alias("hour_bucket"),
                "event_type",
                "n",
                "total_value",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        stage("b0", ev, base)  # first delivery: both states populated
        run_once()
        stage("b1", ev, base + 10)  # REDELIVERY of the whole feed
        stage("b2", sentinel(1, s1), base + 20)
        stage("b3", sentinel(2, s2), base + 30)
        run_once()  # RESTART: replay suppressed by RECOVERED dedup state,
        # then the sentinels finalize every real window from RECOVERED
        # agg state
        out = (
            spark.read.parquet(sink)
            .where(F.unix_micros("hour_bucket") <= F.lit(hi))
            .orderBy("hour_bucket", "event_type")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@register(
    "events_stream_static_join",
    oracle="""
        WITH dim AS (
            SELECT user_id,
                   COUNT(*) AS n_purchases,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                       AS purchase_cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        )
        SELECT e.user_id,
               COUNT(*) AS n_events,
               d.n_purchases,
               d.purchase_cents
        FROM events e JOIN dim d ON e.user_id = d.user_id
        GROUP BY e.user_id, d.n_purchases, d.purchase_cents
        ORDER BY e.user_id
    """,
    survey_ref="§2C streaming — STREAM-STATIC join through the real "
    "writeStream path: each micro-batch broadcast-joins a stored static "
    "dimension (the enrichment shape every event pipeline runs; stateless "
    "on the stream side, so the restart proves the file-source progress "
    "checkpoint, not an operator state store)",
    description="a per-user purchase profile (n_purchases, integer-cents "
    "total) is precomputed and STORED as a static parquet dimension; the "
    "full event feed then streams through three time-ordered micro-batch "
    "files and inner-joins the dimension per batch (small static side → "
    "broadcast hash join inside every micro-batch — no shuffle of the "
    "stream).  A query restart sits after the first file: because the "
    "join is stateless, duplicate-free output across the restart is "
    "evidence the SOURCE checkpoint (processed-files log) recovered — "
    "one redelivered file would double n_events and break the hash.  "
    "Gate output re-aggregates the enriched sink per user and must equal "
    "the batch join+group",
    gated=False,  # r6 rotation candidate (window frozen this round)
)
def events_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive a real stream-static dimension-enrichment join end-to-end.

    At 100 TB the static side is the broadcast dimension (bounded by the
    user universe, not the event volume); the stream side never shuffles
    for the join, so per-batch cost is a map-side hash probe — the same
    plan Catalyst picks here (the dimension is far under the broadcast
    threshold, and stream-static broadcast requires no watermark at all).
    """
    import os
    import shutil
    import tempfile
    import time

    from sparkroach.queries.analytics import cents, dsum

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    cut1 = b.lo + (b.hi - b.lo) // 3
    cut2 = b.lo + 2 * (b.hi - b.lo) // 3

    root = tempfile.mkdtemp(prefix="sparkroach_static_join_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    dim_path = os.path.join(root, "dim")
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    # the STORED static dimension: per-user purchase profile
    (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            dsum(cents("value")).cast("double").alias("purchase_cents"),
        )
        .write.parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path)

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        enriched = stream.join(F.broadcast(dim), "user_id").select(
            "event_id", "user_id", "n_purchases", "purchase_cents"
        )
        q = (
            enriched.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut1)), base)
        run_once()  # first file processed and committed to the source log
        stage("b1", ev.where((t_us >= F.lit(cut1)) & (t_us < F.lit(cut2))),
              base + 10)
        stage("b2", ev.where(t_us >= F.lit(cut2)), base + 20)
        run_once()  # RESTART: b0 must NOT be redelivered (source log), and
        # b1/b2 arrive as separate micro-batches, each probing the dim
        out = (
            spark.read.parquet(sink)
            .groupBy("user_id", "n_purchases", "purchase_cents")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", "n_events", "n_purchases", "purchase_cents")
            .orderBy("user_id")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


# ---------------------------------------------------------------------------
# events_topk_per_user_streamed — custom top-k accumulator state (r8)
# ---------------------------------------------------------------------------

TOPK_PER_USER = 3

TOPK_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("rank", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)

# state: the current top-3 as parallel (cents, event_id) slots; -1 = empty
TOPK_STATE = T.StructType(
    [
        T.StructField("c1", T.LongType()),
        T.StructField("i1", T.LongType()),
        T.StructField("c2", T.LongType()),
        T.StructField("i2", T.LongType()),
        T.StructField("c3", T.LongType()),
        T.StructField("i3", T.LongType()),
    ]
)


def topk_per_user(events: DataFrame, k: int = TOPK_PER_USER) -> DataFrame:
    """Custom stateful operator: a per-user running top-k (by value,
    event_id tiebreak) maintained incrementally across micro-batches —
    the bounded-state streaming analog of a rank window.  State is 2k
    longs per user regardless of stream length; rows emit ONCE, when the
    user's 'sentinel' close signal arrives (append mode).  The
    accumulate-and-emit shape complements the sessionizer: sessions
    aggregate INTERVALS, this maintains an ORDER STATISTIC."""

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        top: list[tuple[int, int]] = []
        if state.exists:
            s = state.get
            for c, i in ((s[0], s[1]), (s[2], s[3]), (s[4], s[5])):
                if i >= 0:
                    top.append((c, i))
        close = False
        for pdf in pdfs:
            for ts_val, et, val, eid in zip(
                pdf["ts"], pdf["event_type"], pdf["value"], pdf["event_id"]
            ):
                if et == "sentinel":
                    close = True
                    continue
                cents = int(round(float(val) * 100))
                top.append((cents, int(eid)))
        # keep the k best by (cents desc, event_id asc) — exact ints
        top.sort(key=lambda t: (-t[0], t[1]))
        top = top[:k]
        if close:
            out = [
                {
                    "user_id": key[0],
                    "rank": r + 1,
                    "value_cents": c,
                    "event_id": i,
                }
                for r, (c, i) in enumerate(top)
            ]
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                out, columns=[f.name for f in TOPK_OUTPUT.fields]
            )
        else:
            flat = [v for c, i in top for v in (c, i)]
            flat += [-1] * (2 * k - len(flat))
            state.update(tuple(flat))
            yield pd.DataFrame(
                [], columns=[f.name for f in TOPK_OUTPUT.fields]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=TOPK_OUTPUT,
        stateStructType=TOPK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "events_topk_per_user_streamed",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_sessions_streamed (the identical applyInPandasWithState
    # lane: staged micro-batch files, mid-stream restart on the same
    # checkpoint, sentinel-closed final emission); the increment — a
    # bounded order-statistic accumulator instead of interval state —
    # is pinned by the oracle's exact rank window.
    gated=False,
    oracle=f"""
        WITH c AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        r AS (
            SELECT user_id, event_id, cents,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY cents DESC, event_id
                   ) AS BIGINT) AS rank
            FROM c
        )
        SELECT user_id, rank, cents AS value_cents, event_id
        FROM r WHERE rank <= {TOPK_PER_USER}
        ORDER BY user_id, rank
    """,
    survey_ref="§2C streaming state — custom ORDER-STATISTIC state: a "
    "per-user running top-k maintained incrementally via "
    "applyInPandasWithState (bounded 2k-long state per key regardless "
    "of stream length), surviving a mid-stream query restart; the "
    "streaming analog of a rank window, next to the sessionizer's "
    "interval state",
    description=f"per-user top-{TOPK_PER_USER} event values (exact "
    "integer cents, event_id tiebreak) accumulated across 4 staged "
    "micro-batches with a query RESTART on the same checkpoint between "
    "batches 2 and 3 — the recovered state must carry the partial "
    "top-k across the restart or final ranks are wrong.  A per-user "
    "sentinel in the last batch closes each key, emitting its final "
    "ranking exactly once (append mode); the oracle is the batch rank "
    "window over the same events",
)
def events_topk_per_user_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3

    root = tempfile.mkdtemp(prefix="sparkroach_topk_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f
            for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            topk_per_user(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut1)), base)
        stage(
            "b1",
            ev.where((t_us >= F.lit(cut1)) & (t_us < F.lit(cut2))),
            base + 10,
        )
        run_once()  # micro-batches 0,1 — the query STOPS mid-stream

        stage("b2", ev.where(t_us >= F.lit(cut2)), base + 20)
        sentinel = ev.select("user_id").distinct().select(
            F.lit(-1).cast("long").alias("event_id"),
            F.timestamp_micros(
                F.lit(hi + 30 * 24 * 3600 * 1_000_000)
            ).alias("ts"),
            F.col("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        stage("b3", sentinel, base + 30)
        run_once()  # RESTART on the same checkpoint: partial top-k state
        # recovered; batches 2,3 finish and the sentinel emits

        out = (
            spark.read.parquet(sink)
            .select("user_id", "rank", "value_cents", "event_id")
            .orderBy("user_id", "rank")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

# ---------------------------------------------------------------------------
# events_ewma_state_streamed — recursive numeric state (integer EWMA)
# ---------------------------------------------------------------------------

EWMA_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_cents", T.LongType()),
    ]
)

# state: (events folded so far, current integer EWMA) — two longs per
# key regardless of stream length
EWMA_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("e", T.LongType()),
    ]
)


def ewma_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator: the per-user integer-EWMA recurrence
    e_n = (x_n + e_{n-1}) DIV 2 folded incrementally across
    micro-batches in (ts, event_id) order — RECURSIVE numeric state,
    the third state algebra in the matrix next to the sessionizer's
    intervals and the top-k accumulator's order statistic.  Exact
    integer arithmetic (non-negative cents, so floor == truncation on
    both engines); rows emit once, at the per-user sentinel."""

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, e = (state.get if state.exists else (0, 0))
        close = False
        rows = []
        for pdf in pdfs:
            for ts_val, et, val, eid in zip(
                pdf["ts"], pdf["event_type"], pdf["value"], pdf["event_id"]
            ):
                if et == "sentinel":
                    close = True
                    continue
                rows.append(
                    (ts_val.value, int(eid), int(round(float(val) * 100)))
                )
        # batches arrive time-split; within the batch restore the exact
        # (ts, event_id) total order the recurrence is defined over
        rows.sort()
        for _t, _eid, cents in rows:
            e = cents if n == 0 else (cents + e) // 2
            n += 1
        if close:
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "ewma_cents": e}],
                columns=[f.name for f in EWMA_OUTPUT.fields],
            )
        else:
            state.update((n, e))
            yield pd.DataFrame(
                [], columns=[f.name for f in EWMA_OUTPUT.fields]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "events_ewma_state_streamed",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_sessions_streamed (the identical applyInPandasWithState
    # lane: staged micro-batch files, mid-stream restart on the same
    # checkpoint, sentinel-closed final emission — r2-recorded,
    # re-recorded r5); the increment — RECURSIVE integer state whose
    # value depends on the full event order, replayed by the oracle as
    # a per-user recursive CTE — is what the hash checks.
    gated=False,
    oracle="""
        WITH RECURSIVE c AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts::TIMESTAMP), event_id
                   ) AS BIGINT) AS seq
            FROM events
        ),
        nn AS (
            SELECT user_id, CAST(MAX(seq) AS BIGINT) AS n
            FROM c GROUP BY user_id
        ),
        r AS (
            SELECT user_id, seq, cents AS e FROM c WHERE seq = 1
            UNION ALL
            SELECT c.user_id, c.seq, (c.cents + r.e) // 2 AS e
            FROM r JOIN c ON c.user_id = r.user_id AND c.seq = r.seq + 1
        )
        SELECT r.user_id, nn.n AS n_events, r.e AS ewma_cents
        FROM r JOIN nn ON nn.user_id = r.user_id AND r.seq = nn.n
        ORDER BY r.user_id
    """,
    survey_ref="§2C streaming state — RECURSIVE numeric state: a "
    "per-user integer-EWMA recurrence e_n = (x_n + e_{n-1}) DIV 2 "
    "folded incrementally via applyInPandasWithState (two longs per "
    "key), surviving a mid-stream restart; the third state algebra "
    "next to interval (sessions), set (dedup) and order-statistic "
    "(top-k) state, with the oracle replaying the recurrence as a "
    "recursive CTE",
    description="integer EWMA over exact non-negative cents in strict "
    "(ts, event_id) order across 4 staged micro-batches with a query "
    "RESTART on the same checkpoint between batches 2 and 3 — the "
    "recurrence is ORDER-DEFINED, so dropped or reordered state after "
    "the restart changes the final value and breaks the hash.  A "
    "per-user sentinel closes each key, emitting (n, ewma) exactly "
    "once; the oracle recursion depth is the per-user event count "
    "(time-bounded per user, never corpus-scale)",
)
def events_ewma_state_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = b.lo, b.hi
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3

    root = tempfile.mkdtemp(prefix="sparkroach_ewma_stream_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base = time.time() - 3600
    cols = [f.name for f in EVENT_SCHEMA.fields]

    def stage(name: str, df: DataFrame, mtime: float) -> None:
        tmp = os.path.join(root, "stage_" + name)
        df.select(*cols).coalesce(1).write.format("parquet").save(tmp)
        part = next(
            f
            for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(feed, name + ".parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (mtime, mtime))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            ewma_per_user(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()  # guard: never leak a running query into the session

    try:
        t_us = F.unix_micros("ts")
        stage("b0", ev.where(t_us < F.lit(cut1)), base)
        stage(
            "b1",
            ev.where((t_us >= F.lit(cut1)) & (t_us < F.lit(cut2))),
            base + 10,
        )
        run_once()  # micro-batches 0,1 — the query STOPS mid-stream

        stage("b2", ev.where(t_us >= F.lit(cut2)), base + 20)
        sentinel = ev.select("user_id").distinct().select(
            F.lit(-1).cast("long").alias("event_id"),
            F.timestamp_micros(
                F.lit(hi + 30 * 24 * 3600 * 1_000_000)
            ).alias("ts"),
            F.col("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        stage("b3", sentinel, base + 30)
        run_once()  # RESTART on the same checkpoint: recovered (n, e)
        # must continue the recurrence exactly where it stopped

        out = (
            spark.read.parquet(sink)
            .select("user_id", "n_events", "ewma_cents")
            .orderBy("user_id")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
