"""Interval (range) joins: points matched into [start, end) windows.

Spark has no native range-join strategy — a raw ``ts >= start AND ts < end``
predicate plans as BroadcastNestedLoopJoin (fine when one side broadcasts,
O(P×I) when neither does). The scale form here is the standard *bin join*:
explode each interval into the fixed-width time buckets it overlaps, bucket
each point once, hash-equi-join on the bucket, then apply the exact range
predicate as a residual filter. Cost becomes O(P + I·span/bucket + matches)
with an ordinary shuffled hash/sort-merge join — no nested loop at any size.

The reference's closest construct is the point-in-time guard
``rp.game_date <= pl.game_date`` inside the v2 props fuzzy join
(`dbt_nhl/models/silver/fact_player_sog_props_v2.sql:115-128`, covered by
asof_prev_order); a true interval join is the general form of that pattern
(SURVEY §2.4 "not present: range/as-of/interval joins").

Bucket-width choice at scale: fan-out per interval is ceil(span/bucket), so
pick the bucket near the median interval span — one bucket row per short
interval, bounded fan-out for long ones. Hot buckets (many overlapping
intervals) are ordinary join skew: salt the bucket key or let AQE skew-join
split them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET_UNITS = ("minute", "hour", "day", "week")


def interval_join_naive(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Reference form: the raw range-predicate theta join.

    Plans as BroadcastNestedLoopJoin — correct and fast while the interval
    side fits in a broadcast (calendars, maintenance windows, campaign
    tables); the bucketed form below is the drop-in once it doesn't.
    """
    right = F.broadcast(intervals) if broadcast_intervals else intervals
    cond = (points[ts_col] >= right[start_col]) & (points[ts_col] < right[end_col])
    return points.join(right, cond)


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "hour",
) -> DataFrame:
    """Bin-join form: same rows as :func:`interval_join_naive` (pinned by
    tests), planned as a hash-equi-join on the bucket key.

    Each point lands in exactly one bucket and each (interval, bucket) pair
    is unique, so the equi-join introduces no duplicate matches — the
    residual range filter only removes same-bucket near-misses. Degenerate
    intervals (start >= end) match nothing under [start, end) semantics and
    are pre-filtered before the explode so ``sequence`` never sees a
    negative span.
    """
    if bucket not in _BUCKET_UNITS:
        raise ValueError(f"bucket must be one of {_BUCKET_UNITS}")
    pb = points.withColumn("_bucket", F.date_trunc(bucket, F.col(ts_col)))
    ib = intervals.filter(F.col(start_col) < F.col(end_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_col)),
                F.date_trunc(
                    bucket, F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr(f"INTERVAL 1 {bucket.upper()}"),
            )
        ),
    )
    return (
        pb.join(ib, "_bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )
