"""Stateful sessionization operator vs a batch-computed oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.streaming import events_stream as es
from nhl_data_pipeline_spark.streaming.sessionize import sessionize
from tests.conftest import TEST_SF_DIR

GAP_S = 600


def _batch_sessions(spark):
    """lag/cumsum batch equivalent: all sessions, flagging each user's last."""
    e = load_table(spark, TEST_SF_DIR, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ can't cast straight to BIGINT in Spark 4; hop via ltz
    # (session TZ is UTC so epoch seconds are unambiguous).
    sec = lambda c: F.col(c).cast("timestamp_ltz").cast("long")  # noqa: E731
    marked = e.withColumn(
        "new_sess",
        (sec("ts") - F.lag(sec("ts")).over(w) > GAP_S).cast("int"),
    ).withColumn("sess_id", F.sum(F.coalesce("new_sess", F.lit(0))).over(w))
    sess = marked.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    last = sess.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    return sess.join(last, "user_id").withColumn(
        "is_open", F.col("sess_id") == F.col("last_id")
    )


def test_sessionize_idle_timeout_closes_open_sessions(spark, tmp_path):
    """With a ProcessingTimeTimeout, dormant keys are force-closed: after
    the input drains and the timeout elapses, EVERY session (including
    each user's final open one) has been emitted, and state is evicted."""
    import time

    import pyspark.sql.functions as F2

    src = str(tmp_path / "src")
    ev = load_table(spark, TEST_SF_DIR, "events").select("user_id", "ts")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    sess = sessionize(
        stream.withColumn("ts", F2.col("ts").cast("timestamp")),
        GAP_S,
        idle_timeout_ms=1500,
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_timeout_snk")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        want = _batch_sessions(spark).count()  # closed + open per user
        deadline = time.time() + 60
        got = -1
        while time.time() < deadline:
            got = spark.table("sess_timeout_snk").count()
            if got >= want:
                break
            time.sleep(1.0)
        assert got == want, (got, want)
    finally:
        q.stop()


def test_sessionize_matches_batch_closed_sessions(spark):
    stream = es.read_events_stream(spark, TEST_SF_DIR)
    got = es.run_available_now(spark, sessionize(stream, GAP_S))
    batch = _batch_sessions(spark)
    closed = batch.filter(~F.col("is_open"))
    got_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got.collect()
    }
    want_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert got_set == want_set
    assert len(got_set) > 0
