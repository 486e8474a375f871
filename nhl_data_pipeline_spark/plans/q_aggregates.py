"""Aggregation operator coverage (SURVEY §2.5, §2.7, §2.8).

Each query re-expresses one aggregation pattern the reference implements in
Snowflake SQL (cited per query) as declarative DataFrame ops: hash aggregates
with automatic partial (map-side) aggregation, no UDAFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.functions.scalars import dec
from nhl_data_pipeline_spark.plans.registry import query
from nhl_data_pipeline_spark.plans.sqlgen import bcount, dsum, dsum_expr


@query(
    "pricing_summary",
    covers="A1,A2,P3,P5",
    bench=True,
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum('l_quantity', 'sum_qty')},
               {dsum('l_extendedprice', 'sum_base_price')},
               {dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
               {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 8)},
               {dsum_expr('l_quantity')} / COUNT(*) AS avg_qty,
               {dsum_expr('l_extendedprice')} / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
               {bcount('count_order')}
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure scan-filter-aggregate (TPC-H Q1 shape).

    Reference analog: the season aggregate `player_shot_metrics.sql:114-170`
    (one GROUP BY, a dozen SUM/AVG measures with guarded division). Filter is
    pushed to the parquet scan; aggregation is a two-phase hash aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(dec(charge, 8)).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount", 6)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )
