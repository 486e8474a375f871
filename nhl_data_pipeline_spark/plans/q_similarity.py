"""Similarity-search queries over the embeddings table (array<float>).

Brute-force cosine top-k (exact baseline), IVF-probed ANN (the scale path),
and above-threshold near-dup pairs. Dot products are float64 left-to-right
sums — verified bit-identical between Spark higher-order functions and the
DuckDB list functions used by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators.similarity import (
    cosine_allpairs_numpy,
    cosine_topk,
    dot,
    dot_sql,
    hyperplane_band_buckets,
    hyperplane_band_buckets_sql,
    norm_sql,
    with_norm,
)
from nhl_data_pipeline_spark.plans.registry import query

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOPK = 5
_N_CENTROIDS = 8  # vec_id 10..17 double as IVF centroids
_NPROBE = 2
_COS = f"{dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"


@query(
    "embedding_knn_bruteforce",
    covers="LLM-ann-bruteforce,O2,W2",
    bench=True,
    oracle=f"""
        WITH normed AS (
            SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
        ),
        q AS (SELECT * FROM normed WHERE vec_id < {_N_QUERIES}),
        c AS (SELECT * FROM normed WHERE vec_id >= {_N_QUERIES}),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS} AS cosine
            FROM q JOIN c ON TRUE
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        WHERE rank <= {_TOPK}
    """,
)
def embedding_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: the ANN correctness baseline.

    Queries broadcast; candidates stream once; per-query top-k via window
    rank with id tiebreak. At 100 TB swap the inner loop for a numpy-matmul
    Pandas UDF and pre-normalize the corpus — the plan shape is unchanged.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        e.filter(F.col("vec_id") < _N_QUERIES),
        e.filter(F.col("vec_id") >= _N_QUERIES),
        _TOPK,
    )


@query(
    "embedding_ann_ivf",
    covers="LLM-ann-ivf",
    oracle=f"""
        WITH normed AS (
            SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
        ),
        cent AS (
            SELECT vec_id AS centroid_id, embedding, nrm FROM normed
            WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _N_CENTROIDS}
        ),
        cand AS (SELECT * FROM normed WHERE vec_id >= {_N_QUERIES}),
        assign AS (
            SELECT vec_id, centroid_id FROM (
                SELECT c.vec_id, q.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY {dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC,
                                    q.centroid_id ASC
                       ) AS rn
                FROM cand c JOIN cent q ON TRUE
            ) WHERE rn = 1
        ),
        qv AS (SELECT * FROM normed WHERE vec_id < {_N_QUERIES}),
        probes AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.vec_id AS query_id, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {dot_sql('c.embedding', 'q.embedding')} / (c.nrm * q.nrm) DESC,
                                    c.centroid_id ASC
                       ) AS rn
                FROM qv q JOIN cent c ON TRUE
            ) WHERE rn <= {_NPROBE}
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS} AS cosine
            FROM qv q
            JOIN probes p ON p.query_id = q.vec_id
            JOIN assign a ON a.centroid_id = p.centroid_id
            JOIN normed c ON c.vec_id = a.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        WHERE rank <= {_TOPK}
    """,
)
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate nearest neighbors.

    Corpus is partitioned by nearest centroid (the inverted file); each
    query scores only its nprobe nearest centroid buckets. At 100 TB the
    assignment is a write-time bucketing/partition column, so the probe is
    partition pruning — this query IS the read-side plan. Centroids here
    are fixed ids (deterministic stand-in for a k-means fit).
    """
    e = load_table(spark, sf_dir, "embeddings")
    normed = with_norm(e)
    cent = (
        normed.filter(
            (F.col("vec_id") >= _N_QUERIES)
            & (F.col("vec_id") < _N_QUERIES + _N_CENTROIDS)
        )
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cent_vec"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    cand = normed.filter(F.col("vec_id") >= _N_QUERIES)
    qv = normed.filter(F.col("vec_id") < _N_QUERIES)

    cos_cc = dot(F.col("cent_vec"), F.col("embedding")) / (
        F.col("cent_nrm") * F.col("nrm")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.asc("centroid_id")
    )
    assign = (
        cand.join(F.broadcast(cent))
        .withColumn("sim", cos_cc)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
    probes = (
        qv.join(F.broadcast(cent))
        .withColumn("sim", cos_cc)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= _NPROBE)
        .select(F.col("vec_id").alias("query_id"), "centroid_id")
    )
    q_side = qv.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        probes.join(assign, "centroid_id")
        .join(normed.select("vec_id", "embedding", "nrm"), "vec_id")
        .join(F.broadcast(q_side), "query_id")
        .withColumn(
            "cosine",
            dot(F.col("q_vec"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


@query(
    "embedding_cosine_neardup",
    covers="LLM-dedup-embedding",
    oracle=f"""
        WITH normed AS (
            SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
        )
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, {_COS} AS cosine
        FROM normed q JOIN normed c ON q.vec_id < c.vec_id
        WHERE {_COS} >= 0.4
    """,
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    Exact all-pairs form (the verify stage), executed by the vectorized
    bit-exact scorer (operators.similarity.cosine_allpairs_numpy): an
    Arrow-batched per-DIMENSION accumulation loop reproduces the JVM/DuckDB
    left-to-right float64 fold bit-for-bit while scoring batch×n pairs at C
    speed — ~15× over the BNLJ + interpreted-HOF form it replaced, same
    oracle. Still O(n²) by design; at scale, gate with the banded
    hyperplane LSH below or the IVF buckets above so only same-bucket
    pairs are scored — same output contract.
    """
    return cosine_allpairs_numpy(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


_DIM, _LSH_BANDS, _LSH_ROWS = 64, 8, 3
_BBKT_SQL = hyperplane_band_buckets_sql("embedding", _DIM, _LSH_BANDS, _LSH_ROWS)


@query(
    "embedding_neardup_lsh",
    covers="LLM-dedup-embedding,LLM-dedup-simhash",
    oracle=f"""
        WITH normed AS (
            SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm,
                   {_BBKT_SQL} AS bkts
            FROM embeddings
        ),
        banded AS (
            SELECT vec_id, unnest(generate_series(1, {_LSH_BANDS})) AS band_idx,
                   unnest(bkts) AS bucket
            FROM normed
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
        )
        SELECT p.vec_a, p.vec_b, {_COS} AS cosine
        FROM cand p
        JOIN normed q ON q.vec_id = p.vec_a
        JOIN normed c ON c.vec_id = p.vec_b
        WHERE {_COS} >= 0.4
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH-gated embedding near-dup pairs — the scale path whose
    output the exact all-pairs `embedding_cosine_neardup` bounds.

    8 bands x 3 deterministic +/-1 hyperplanes: a pair is a candidate if all
    3 signs agree in ANY band (recall ~= 1-(1-p^3)^8 ~= 0.9 at cosine 0.4;
    a single 24-plane AND-bucket would have recall p^24 ~= 0 — banding is
    what makes sign-LSH usable). Candidates then get the exact cosine
    verify at the same threshold, so precision is 1. Cost tracks band
    bucket occupancy, not n^2; at 100 TB raise rows-per-band to keep
    buckets small and make band_idx+bucket the shuffle key. Same banding
    construction as dedup_minhash_lsh; bucket ids are bit-stable across
    engines because dots sum left-to-right in float64.
    """
    e = with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "bkts", hyperplane_band_buckets("embedding", _DIM, _LSH_BANDS, _LSH_ROWS)
    ).persist()
    banded = e.select(
        "vec_id", F.posexplode("bkts").alias("band_idx", "bucket")
    )
    a = banded.select(
        F.col("vec_id").alias("vec_a"), "band_idx", "bucket"
    )
    b = banded.select(
        F.col("vec_id").alias("vec_b"), "band_idx", "bucket"
    )
    cand = (
        a.join(b, ["band_idx", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    q = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    c = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(q, "vec_a")
        .join(c, "vec_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.4)
        .select("vec_a", "vec_b", "cosine")
    )
