"""Structured Streaming over the events table.

The reference handles late/updated data in batch (re-snapshot + W1 dedup,
SURVEY §2.10); this module is the streaming analog it road-maps ("live
games"): readStream → watermark → windowed aggregates / dedup → sink.
`trigger(availableNow=True)` turns any of these into an incremental batch
job — the same code path a scheduled micro-batch (Airflow cron in the
reference) would run.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.functions.scalars import dec


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (schema pinned from the batch
    reader; ts normalized ns→µs exactly like catalog.load_table)."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # TimestampType (not NTZ): event-time watermarks require TIMESTAMP.
    # Session timezone is pinned UTC, so wall-clock values match the batch
    # reader's timestamp_ntz. Same dtype dispatch as catalog.load_table:
    # nanosAsLong parquet surfaces ts as a raw ns bigint, micro-precision
    # parquet as a timestamp already.
    from pyspark.sql.types import LongType

    if isinstance(batch.schema["ts"].dataType, LongType):
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts = F.col("ts").cast("timestamp")
    return stream.withColumn("ts", ts)


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-type event counts in tumbling windows with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        # decimal-exact sum: micro-batch accumulation order must not change
        # the float result (registry parity rule)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal -> VARCHAR -> DOUBLE: past 2^53 the direct cast can
            # round an ulp differently per engine (sqlgen.dsum_expr rule)
            F.sum(dec("value")).cast("string").cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_user_activity(events: DataFrame, window: str = "2 hours",
                          slide: str = "1 hour", watermark: str = "4 hours") -> DataFrame:
    """Sliding-window per-user activity (the rolling-average streaming twin
    of team_shot_metrics' batch ROWS frames). The average is the
    decimal-exact SUM/COUNT idiom (registry parity rule): micro-batch
    accumulation order cannot perturb the result, so the output is
    hash-comparable to batch SQL."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(dec("value")).cast("string").cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("user_id"),
            "n_events",
            "avg_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-once dedup on event_id within the watermark horizon —
    the streaming analog of the latest-snapshot batch dedup (W1)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_with_customer_dim(
    spark: SparkSession, events: DataFrame, sf_dir: str
) -> DataFrame:
    """Stream-static broadcast join: each micro-batch joins against the
    (re-read-per-batch) customer dim — the streaming twin of the J1 fact
    denormalization. The dim side is broadcast, so the stream never
    shuffles; at scale this is the only join shape that keeps a hot stream
    partition-local."""
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("user_name"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    return events.join(dim, "user_id", "left").select(
        "event_id", "ts", "user_id", "user_name", "mktsegment", "event_type", "value"
    )


def view_to_purchase_funnel(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM inner join: attribute each purchase to the same
    user's views in the preceding hour.

    The conversion-funnel shape (and the last missing streaming join
    class beside the stream-static dim join): both sides are unbounded,
    so Spark buffers each side in state and the time-range condition plus
    both watermarks bound how much — view state can be evicted once it is
    older than watermark + attribution window. Inner join with a closed
    event-time band is exactly the form Structured Streaming supports
    without an unbounded-state error.

    Returns (user_id, view_id, purchase_id, view_ts, purchase_ts) —
    deterministic, so availableNow output is hash-comparable to the same
    join run in batch (tests/test_streaming_and_sources.py).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")
            ),
            "inner",
        )
        .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
    )


def upsert_stream(
    spark: SparkSession,
    streaming_df: DataFrame,
    path: str,
    key: str,
    order_cols: tuple[str, ...],
) -> None:
    """foreachBatch latest-wins merge sink: each micro-batch upserts into a
    parquet table keyed by `key`, newest row per key winning by
    `order_cols`. This is the full streaming analog of the reference's
    re-snapshot + W1 dedup loop (SURVEY §2.10) — late or re-delivered
    snapshots land in a later micro-batch and overwrite via the same
    latest-wins rule the batch dedup uses. With Delta/Iceberg the body
    becomes MERGE INTO; the semantics stay fixed by sources.lake's
    upsert_latest."""
    from nhl_data_pipeline_spark.sources.lake import upsert_latest

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_latest(spark, path, batch_df, key, order_cols)

    q = (
        streaming_df.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{path}__ckpt")
        .start()
    )
    q.awaitTermination()


def run_available_now(spark: SparkSession, streaming_df: DataFrame) -> DataFrame:
    """Execute a streaming plan over all currently-available input and
    return the result as a batch DataFrame (memory sink)."""
    name = f"snk_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_available_now_complete(spark: SparkSession, streaming_df: DataFrame) -> DataFrame:
    """Same as run_available_now but for aggregated plans (complete mode)."""
    name = f"snk_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
