"""Training-shard sink: deterministic shard assignment + in-file order.

The output stage of a training-data pipeline (no reference analog — the
reference exports to Sheets/CSV): the curated corpus lands as N shard
files whose ASSIGNMENT and ROW ORDER are pure functions of the data, so a
re-run — on any cluster size, any partitioning — produces byte-identical
shard membership. Trainers can then map shard → data-parallel rank without
a manifest.

Scale posture (100 TB):
- shard = pmod(xxhash64(key), n_shards): stateless, no shuffle to decide;
- one repartition ON THE SHARD ID (the only shuffle) co-locates each
  shard, sortWithinPartitions orders rows inside it without a global sort;
- `partitionBy("shard")` gives shard directories readable independently —
  a trainer rank opens only its own;
- bound file sizes with spark.sql.files.maxRecordsPerFile when a shard
  outgrows one file; in-file order is preserved per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(key, n_shards: int):
    """Deterministic shard for a key column: pmod(xxhash64(key), n)."""
    return F.pmod(F.xxhash64(key), F.lit(n_shards))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    order_cols: list[str],
) -> None:
    """Write df as n_shards Hive-layout shard directories (shard=K/...),
    each shard's rows sorted by order_cols within its file(s)."""
    out = df.withColumn("shard", shard_id(F.col(key_col), n_shards))
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", *order_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def epoch_order(key, seed: int):
    """Seeded deterministic shuffle order: xxhash64(seed, key). Trainers
    get a different-but-reproducible global permutation per epoch by
    bumping ``seed`` — no Math.random, so a re-run of epoch k reproduces
    epoch k's order byte-for-byte on any cluster size. Ties are impossible
    modulo 64-bit hash collisions; pair with the key itself as a final
    tiebreak when keys may collide."""
    return F.xxhash64(F.lit(seed), key)


def write_epoch_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    seed: int,
) -> None:
    """Training shards whose in-shard row order is the epoch-``seed``
    permutation: shard membership stays FIXED across epochs (ranks keep
    their data locality / cache), only the within-shard order changes —
    the standard data-parallel shuffle discipline, as one sort key. The
    order column is dropped after the sort (a narrow projection keeps
    intra-partition order), so shard files carry only the data columns."""
    out = df.withColumns(
        {
            "shard": shard_id(F.col(key_col), n_shards),
            "_ord": epoch_order(F.col(key_col), seed),
        }
    )
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord", key_col)
        .drop("_ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
