"""Bucketed tables: co-located fact⋈fact joins without an exchange.

At 100 TB the dominant shuffle is the fact-fact join (orders⋈lineitem,
props⋈actuals). Writing both sides bucketed by the join key lets every
subsequent join/aggregation on that key run with NO Exchange — the sort
-merge join reads co-located buckets directly. This is the write-time twin
of repartition(): pay the shuffle once at ingest, never again.

Uses the session catalog (saveAsTable) — bucketing metadata lives in the
catalog, not the parquet files, which is why plain .parquet() paths can't
do this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize df as a bucketed (and optionally sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan — the
    metric bucketing drives to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines() if "Exchange hashpartitioning" in line
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)
