"""Table catalog over the driver-provided parquet test lake.

The synthetic lake (``/root/testdata/sf*/``) is a TPC-H-ish star schema plus
an ``events`` stream table and ``documents`` / ``embeddings`` tables for the
training-data operators. Readers go through :func:`load_table` so every query
in the engine shares one access path — which is also where, at production
scale, bucketing / partition filters / table-format (Delta/Iceberg) options
would be injected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins (≤ a few MB even
# at sf100; the reference's dim_player/dim_team are the same shape).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table. Column pruning + predicate pushdown reach the
    parquet scan automatically because callers keep the plan declarative."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize events.ts to timestamp_ntz regardless of how the lake
        # stored it: TIMESTAMP(NANOS) parquet surfaces as a raw nanosecond
        # bigint under nanosAsLong (truncate — not round — to micros, the
        # same ns→us semantics DuckDB applies), while micro-precision
        # parquet arrives as a timestamp already.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            ts = F.timestamp_micros(F.expr("ts div 1000"))
        else:
            ts = F.col("ts")
        df = df.withColumn("ts", ts.cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every lake table as a temp view so ``spark.sql`` corpora
    (the analyst-SQL entry point, SURVEY §3.2) can run unchanged."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
