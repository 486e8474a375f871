"""Streaming↔batch equivalence as an oracle-checked registered query.

The reference handles late/updated data in batch (re-snapshot + W1 dedup,
SURVEY §2.10); the streaming module is its Structured Streaming analog.
This query EXECUTES the streaming plan (readStream → watermark → tumbling
window aggregate → memory sink, ``trigger(availableNow=True)``) and returns
the sink contents as a batch DataFrame, so the driver's DuckDB oracle
hash-compares a real streaming run against plain batch SQL — the strongest
form of the streaming↔batch equivalence the pytest suite asserts locally.

Determinism notes (why this can be hash-exact):
- session timezone is pinned UTC and windows are epoch-aligned, so
  window bounds are pure integer arithmetic on epoch seconds;
- total_value uses the decimal-exact sum idiom — micro-batch accumulation
  order cannot perturb the float result;
- the watermark is set far wider than the data's time span, so no input
  row can be dropped as late regardless of how availableNow splits the
  input into micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.plans.registry import query
from nhl_data_pipeline_spark.streaming import events_stream as es


@query(
    "streaming_sessionize",
    covers="§2.10-streaming,§2.10-streaming-stateful,A1,W7",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                              IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER (
                                 PARTITION BY user_id ORDER BY ts)) > 3600
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        g AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered
        ),
        sess AS (
            SELECT user_id, sid, min(ts) AS session_start,
                   max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM g GROUP BY 1, 2
        )
        SELECT 'session' AS op, user_id, session_start AS start_ts,
               session_end AS end_ts, CAST(NULL AS VARCHAR) AS event_type,
               n_events AS n, CAST(NULL AS DOUBLE) AS total_value
        FROM sess
        WHERE sid < (SELECT max(sid) FROM sess s2
                     WHERE s2.user_id = sess.user_id)
        UNION ALL
        SELECT 'tumbling', CAST(NULL AS BIGINT), window_start, window_end,
               event_type,
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        FROM (
            SELECT TIMESTAMP '1970-01-01 00:00:00'
                     + CAST(floor(epoch(ts) / 3600) AS BIGINT)
                       * INTERVAL '1 hour' AS window_start,
                   TIMESTAMP '1970-01-01 00:00:00'
                     + (CAST(floor(epoch(ts) / 3600) AS BIGINT) + 1)
                       * INTERVAL '1 hour' AS window_end,
                   event_type, value
            FROM events
        )
        GROUP BY window_start, window_end, event_type
    """,
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two REAL streaming runs, union-tagged (merged
    `streaming_tumbling_counts`, round-5 registry rotation), hash-checked
    against batch SQL.

    'session' branch: inactivity-gap sessionization EXECUTED BY THE
    STREAMING ENGINE (applyInPandasWithState, per-user state across
    micro-batches, ``availableNow``) vs the batch gap-sessionization SQL
    (lag → gap flag → cumulative-sum session ids) — the one operator
    family with nontrivial custom state logic, driver-checked since r4.
    The stream emits CLOSED sessions only (a user's final session stays in
    state when the input is exhausted), so the oracle excludes each user's
    last session. Determinism: the whole events file arrives in one
    micro-batch under availableNow (single parquet file), so per-user
    event order inside the state function is total; on a real unbounded
    stream, per-key ordered replay (or event-time sessionization with a
    watermark) is required — see streaming/sessionize.py for the
    ProcessingTimeTimeout state-eviction variant (wall-clock-dependent by
    nature, pytest-verified instead).

    'tumbling' branch: tumbling 1-hour per-type counts through the
    stateful streaming aggregation — the streaming twin of the
    reference's scheduled batch re-aggregation (SURVEY §2.10, Airflow
    cron); `availableNow` is exactly the scheduled-micro-batch execution
    mode. At scale it shuffles on (window, event_type) with partial
    aggregation per micro-batch; state size is bounded by the watermark
    horizon.
    """
    from nhl_data_pipeline_spark.streaming import sessionize as sz

    stream = es.read_events_stream(spark, sf_dir)
    sessions = es.run_available_now(
        spark, sz.sessionize(stream.select("user_id", "ts"), gap_seconds=3600)
    ).select(
        F.lit("session").alias("op"),
        "user_id",
        F.col("session_start").alias("start_ts"),
        F.col("session_end").alias("end_ts"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("n_events").alias("n"),
        F.lit(None).cast("double").alias("total_value"),
    )
    agg = es.tumbling_counts(
        es.read_events_stream(spark, sf_dir), window="1 hour", watermark="3650 days"
    )
    tumbling = es.run_available_now_complete(spark, agg).select(
        F.lit("tumbling").alias("op"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.col("window_start").alias("start_ts"),
        F.col("window_end").alias("end_ts"),
        "event_type",
        "n",
        "total_value",
    )
    return sessions.unionByName(tumbling)
