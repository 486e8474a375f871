"""Hive-partitioned JSON lake: writer, reader, idempotent re-runs.

Reference operators S4-S6: the `date=/hour=/game_id=` S3 layout
(src/nhl_pipeline/utils/paths.py:36-117), per-file HEAD-based idempotency
(s3_utils.py:28-59), and the COPY INTO METADATA$FILENAME regex extraction
(dags/nhl_daily_ingestion_dag.py:133-190).

Spark-first replacements:
- writer: df.write.partitionBy("date", "hour") — layout for free;
- idempotency: dynamic partition overwrite replaces day partitions
  atomically (no per-file existence checks);
- filename metadata: partition columns come back free on read; for
  non-partition metadata, regexp_extract(input_file_name()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_json(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("date", "hour")
) -> None:
    """S4: partitioned JSON sink. Dynamic partition overwrite = re-running a
    day replaces exactly that day's partitions (S5 idempotency without HEAD
    checks or _SUCCESS markers)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .json(path)
    )


def read_lake_json(spark: SparkSession, path: str) -> DataFrame:
    """S6: read the lake back; Hive partition columns (date=, hour=) are
    discovered automatically, and the source file path is attached for
    lineage — the METADATA$FILENAME equivalent."""
    return spark.read.json(path).withColumn("s3_key", F.input_file_name())


def extract_key_metadata(df: DataFrame, key_col: str = "s3_key") -> DataFrame:
    """The COPY INTO regex extraction (nhl_daily_ingestion_dag.py:161-162):
    pull date/game_id out of the file path even when not Hive-partitioned."""
    return df.withColumns(
        {
            "key_date": F.to_date(
                F.regexp_extract(F.col(key_col), r"date=(\d{4}-\d{2}-\d{2})", 1)
            ),
            "key_game_id": F.regexp_extract(
                F.col(key_col), r"game_id=(\d+)", 1
            ).cast("long"),
        }
    )


def append_new_only(
    incoming: DataFrame, existing: DataFrame, key: str
) -> DataFrame:
    """The Iceberg incremental-append pattern
    (iceberg/bronze_odds_player_props.py:274-346): anti-join incoming rows
    against already-loaded ids; only the delta is appended."""
    return incoming.join(existing.select(key).distinct(), key, "left_anti")


def upsert_latest(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Latest-wins upsert into a parquet table (merge analog without Delta).

    The batch twin of the streaming upsert sink the reference's re-snapshot
    + W1 dedup pattern implies (SURVEY §2.10): union existing rows with
    updates, keep the newest row per key by order_cols, rewrite. With a
    table format this becomes MERGE INTO; the dedup semantics are identical
    to nhl.staging.latest_snapshot.
    """
    import os

    from pyspark.sql.window import Window

    if os.path.isdir(path):
        current = spark.read.parquet(path)
        merged = current.unionByName(updates)
    else:
        merged = updates
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Rewrite through a staging dir: the plan reads `path`, so writing onto
    # it in place would truncate inputs mid-read.
    tmp = f"{path}__staged"
    latest.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(tmp)
    return spark.read.parquet(path)
