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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user sessions with a gap timeout.

    State per user is three longs; a session closes (and emits one row)
    when a gap > gap_seconds appears inside a batch or the processing-time
    timeout fires with no new events.  This is the applyInPandasWithState
    template for any custom accumulate-and-emit operator.

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
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT.fields])

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
