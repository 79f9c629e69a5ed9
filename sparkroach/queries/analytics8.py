"""Relational breadth set 8 (round 4, second half): range join.

The brief's custom-operator list names three join shapes Spark lacks as
primitives: as-of join (analytics2.events_asof_last_purchase), range
join (HERE), and hypertable rollup (analytics.events_minute_rollup is
the tumbling-window form).  A point-in-interval range join has NO
equality key, so a naive formulation plans as BroadcastNestedLoopJoin /
CartesianProduct — quadratic and a guaranteed 100 TB killer.  The
scalable composition is TIME-BUCKETING: explode each interval into the
coarse buckets it covers, tag each point with its own bucket, equi-join
on the bucket, then re-check the exact range predicate.  Each (point,
interval) pair meets EXACTLY once — in the point's own bucket — so no
dedup pass is needed; the join is a plain hash shuffle whose key
cardinality scales with time, never with rows.  (This is the same plan
Databricks' range-join "bin" hint generates; here it is composed from
public DataFrame ops.)

Tie discipline: both engines order the sessionization windows by
(t_us, event_id) — including the running SUM — because a min/max per
session is tie-sensitive where a distinct-count (the events_user_sessions
twin) is not.

Registered gated=True in the end-of-round rotation window? No — the
window is full with this round's 18 rotated-in operators; this is an r5
rotation candidate, locally oracle-swept like every gated=False entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

_BUCKET_US = 3_600_000_000  # 1-hour range-join buckets
_OWNERS = 10  # interval side: sessions of the 10 lowest user ids


@register(
    "events_session_range_join",
    gated=False,  # r5 rotation candidate (driver window full)
    oracle=f"""
        WITH us AS (
            SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS t_us
            FROM events
        ),
        gaps AS (
            SELECT user_id, event_id, t_us,
                   CASE WHEN t_us - lag(t_us) OVER (
                                PARTITION BY user_id ORDER BY t_us, event_id)
                             > 1800000000
                        OR lag(t_us) OVER (
                                PARTITION BY user_id ORDER BY t_us, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM us WHERE user_id < {_OWNERS}
        ),
        sess_id AS (
            SELECT user_id, t_us,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY t_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM gaps
        ),
        sess AS (
            SELECT user_id, session_id,
                   MIN(t_us) AS session_start_us,
                   MAX(t_us) AS session_end_us
            FROM sess_id GROUP BY user_id, session_id
        )
        SELECT s.user_id, s.session_start_us, s.session_end_us,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM sess s
        JOIN us e ON e.t_us BETWEEN s.session_start_us AND s.session_end_us
        GROUP BY s.user_id, s.session_start_us, s.session_end_us
        ORDER BY s.user_id, s.session_start_us
    """,
    survey_ref="custom operator: range join (point-in-interval, no "
    "equality key) — composed as bucket-explode + equi-join + exact "
    "refine; the oracle verifies with DuckDB's native BETWEEN theta-join",
    description="for each session interval of the 10 lowest users, how "
    "many events (and distinct users) across the WHOLE corpus fall inside "
    "it. The Spark plan explodes each interval into its covered 1-hour "
    "buckets and equi-joins on the point's bucket — a hash join keyed by "
    "time, never a BroadcastNestedLoopJoin; each (point, interval) pair "
    "meets exactly once (in the point's own bucket) so no dedup stage. "
    "At 100 TB the bucket key also partition-prunes if events are "
    "time-partitioned on disk",
)
def events_session_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    own = ev.where(F.col("user_id") < _OWNERS)
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gap = F.col("t_us") - F.lag("t_us").over(w)
    new_session = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        own.select(
            "user_id",
            "t_us",
            "event_id",
            new_session.alias("new_session"),
        )
        .select(
            "user_id",
            "t_us",
            F.sum("new_session").over(wsum).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("t_us").alias("session_start_us"),
            F.max("t_us").alias("session_end_us"),
        )
    )
    ints = sess.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        F.explode(
            F.sequence(
                # integer DIV, not double division: a double quotient can
                # round up across a bucket boundary for large micros
                F.expr(f"session_start_us DIV {_BUCKET_US}"),
                F.expr(f"session_end_us DIV {_BUCKET_US}"),
            )
        ).alias("bucket"),
    )
    pts = ev.select(
        F.col("user_id").alias("e_user"),
        F.col("t_us").alias("e_t_us"),
        F.expr(f"t_us DIV {_BUCKET_US}").alias("bucket"),
    )
    return (
        ints.join(pts, "bucket")
        .where(
            F.col("e_t_us").between(
                F.col("session_start_us"), F.col("session_end_us")
            )
        )
        .groupBy("user_id", "session_start_us", "session_end_us")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("e_user").alias("n_users"),
        )
        .orderBy("user_id", "session_start_us")
    )
