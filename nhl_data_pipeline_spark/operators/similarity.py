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


def cosine_topk_numpy(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vectorized brute-force cosine top-k via Arrow-batched mapInPandas.

    The throughput path for large k×corpus products: the (small) query set
    is collected once and closed over as a normalized numpy matrix; each
    candidate Arrow batch does one float64 matmul against it and emits its
    local per-query top-k; a final window rank reduces locals to the global
    top-k. Same contract as cosine_topk; float64 matmul accumulates in a
    different order than the sequential JVM sum, so cosines can differ in
    the last ulp — rankings agree except on exact ties.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec).collect()
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ q_mat.T  # (batch, n_queries)
            top = min(k, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # per query
            rows = {
                "query_id": np.repeat(q_ids, top),
                "neighbor_id": c_ids[idx].T.ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    local = candidates.select(id_col, vec).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
