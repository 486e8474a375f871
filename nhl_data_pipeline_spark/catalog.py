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


def shuffle_width_for(
    spark: SparkSession,
    sf_dir: str,
    tables: str | tuple[str, ...],
    bytes_per_partition: int,
) -> int:
    """Shuffle width derived from SOURCE size, not session config (r9,
    VERDICT r8 ask #2 — generalizing the recipe proven on the jaccard
    self-join in plans/q_text.py).

    Why: a fixed ``spark.sql.shuffle.partitions`` makes PER-TASK hash/sort
    state (SHJ build side, partial-agg maps, sort runs) grow linearly with
    the lake — zero spill at sf3 became ~15 GB of spill per run at sf10
    for the jaccard plan, and join_chain_revenue read a raw sf3→sf10
    exponent of 1.25 for exactly this reason. Deriving the width from the
    input bytes pins per-task working set constant as data grows, which is
    the property that survives a 100× scale-up.

    Mechanics: driver-side ``os.path.getsize`` on the lake parquet — no
    Spark job, no cache side effects (the lm.py gate lesson). On a real
    cluster this number comes from catalog size stats / file listing;
    non-local paths fall back to the session parallelism so the plan stays
    valid (AQE still coalesces). ``bytes_per_partition`` is the measured
    no-spill budget of COMPRESSED input per task and is workload-specific:
    512 KiB for shingle-exploding text plans (~30× in-memory expansion),
    8 MiB for plain row joins/aggs (~4× expansion). Never below the
    session parallelism: small lakes keep every core busy and the plan
    shape at test SFs is unchanged.
    """
    if isinstance(tables, str):
        tables = (tables,)
    par = spark.sparkContext.defaultParallelism
    total = 0
    for t in tables:
        try:
            total += os.path.getsize(os.path.join(sf_dir, f"{t}.parquet"))
        except OSError:  # non-local path (cluster): parallelism fallback
            return par
    return max(par, total // bytes_per_partition + 1)


# Measured no-spill budgets of compressed input bytes per shuffle task
# (see shuffle_width_for): text plans explode ~30× into shingle rows,
# plain row-wise joins expand ~4× decompressed.
TEXT_BYTES_PER_PARTITION = 512 << 10
ROW_BYTES_PER_PARTITION = 8 << 20


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
