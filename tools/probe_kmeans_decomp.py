"""Decompose the benched kmeans×LSH form and A/B a vectorized band stage.

The r12 session-3 baseline on this container put kmeans_semantic_dedup at
4.27 s — the largest bench entry (21% of the total). The plan-level work
is settled (one fused Arrow assignment+bucketize stage, density-linear
candidates, Arrow scoring), so the remaining suspects are INSIDE the
Python batch function (guide §4.2: hand whole batches to vectorized
native code — the current band loop builds 32 pandas frames + one concat
per batch, and the distance fold runs k*dim Python-level numpy calls):

  arm A (current): operators.kmeans.semantic_neardup_pairs_lsh_blocked
  arm B (vector):  same plan, batch fn vectorized —
                   - ONE output frame per batch (np.tile/repeat + the
                     band-major bucket.T.ravel() reproduces arm A's row
                     order exactly),
                   - distance accumulation vectorized across centroids
                     but still SEQUENTIAL per dimension (acc += t*t in
                     dim order) so assignment stays bit-identical,
                   - bucket bits via one reshape+shift-sum (exact int64).

Stages timed per arm (noop sink, fresh alternating builds, one session):
  band  — the mapInPandas band table alone
  full  — the whole query

Row-set equality of the band tables is asserted once up front (exceptAll
both ways), so the A/B cannot drift semantically.

Usage: python tools/probe_kmeans_decomp.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import sys
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.session import get_spark
    from nhl_data_pipeline_spark.catalog import load_table
    from nhl_data_pipeline_spark.operators import kmeans as KM
    from nhl_data_pipeline_spark.operators.similarity import hyperplanes
    from nhl_data_pipeline_spark.plans.q_similarity import (
        _KM_K,
        _KM_SCALE_THRESHOLD,
        _DIM,
    )

    spark = get_spark("probe_kmeans_decomp")
    e = load_table(spark, sf_dir, "embeddings")
    n_total = e.select("vec_id").count()

    k, dim, bands = _KM_K, _DIM, 32
    import math

    rows = max(16, math.ceil(math.log2(max(n_total / k, 2))) + 4)
    cents = np.array(
        KM.init_centroids(e, k, vec="embedding", id_col="vec_id"),
        dtype=np.float64,
    )
    planes = np.array(hyperplanes(dim, bands * rows), dtype=np.float64)
    band_schema = "vec_id long, band_idx int, bucket long, cluster_id int"

    def assign_bucketize_current(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = np.zeros((v.shape[0], k))
            for c in range(k):
                acc = np.zeros(v.shape[0])
                for dd in range(dim):
                    t = v[:, dd] - cents[c, dd]
                    acc += t * t
                d2[:, c] = acc
            cluster = d2.argmin(axis=1).astype(np.int32)
            bits = ((v @ planes.T) > 0.0).astype(np.int64)
            frames = []
            for b in range(bands):
                bucket = sum(bits[:, b * rows + r] << r for r in range(rows))
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "band_idx": np.full(ids.shape, b, dtype=np.int32),
                            "bucket": bucket,
                            "cluster_id": cluster,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    weights = (np.int64(1) << np.arange(rows, dtype=np.int64))

    def assign_bucketize_vector(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            n = v.shape[0]
            acc = np.zeros((n, k))
            for dd in range(dim):
                t = v[:, dd, None] - cents[None, :, dd]
                acc += t * t
            cluster = acc.argmin(axis=1).astype(np.int32)
            bits = ((v @ planes.T) > 0.0).astype(np.int64)
            bucket = (bits.reshape(n, bands, rows) * weights).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": np.tile(ids, bands),
                    "band_idx": np.repeat(
                        np.arange(bands, dtype=np.int32), n
                    ),
                    "bucket": bucket.T.ravel(),
                    "cluster_id": np.tile(cluster, bands),
                }
            )

    par = spark.sparkContext.defaultParallelism
    src = e.repartition(par, F.col("vec_id")).select("vec_id", "embedding")

    def band_df(fn):
        return src.mapInPandas(fn, band_schema)

    # --- semantic equality gate (once) ---
    a = band_df(assign_bucketize_current)
    b = band_df(assign_bucketize_vector)
    d1 = a.exceptAll(b).count()
    d2_ = b.exceptAll(a).count()
    assert d1 == 0 and d2_ == 0, f"band tables differ: {d1}/{d2_}"
    print(f"band tables identical (rows={a.count()})", flush=True)

    def full_query(fn):
        banded = band_df(fn).persist()
        aa = banded.select(
            "cluster_id", "band_idx", "bucket", F.col("vec_id").alias("id_a")
        )
        bb = banded.select(
            "cluster_id", "band_idx", "bucket", F.col("vec_id").alias("id_b")
        )
        cand = (
            aa.join(bb, ["cluster_id", "band_idx", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        va = src.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        vb = src.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        thr = float(_KM_SCALE_THRESHOLD)

        def score_pairs(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.array(list(pdf["va"]), dtype=np.float64)
                y = np.array(list(pdf["vb"]), dtype=np.float64)
                dot_ = np.zeros(len(pdf))
                nx = np.zeros(len(pdf))
                ny = np.zeros(len(pdf))
                for dd in range(dim):
                    dot_ += x[:, dd] * y[:, dd]
                    nx += x[:, dd] * x[:, dd]
                    ny += y[:, dd] * y[:, dd]
                cos = dot_ / (np.sqrt(nx) * np.sqrt(ny))
                keep = cos >= thr
                yield pd.DataFrame(
                    {
                        "id_a": pdf["id_a"].to_numpy(dtype=np.int64)[keep],
                        "id_b": pdf["id_b"].to_numpy(dtype=np.int64)[keep],
                        "cosine": cos[keep],
                    }
                )

        out = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .select("id_a", "id_b", "va", "vb")
            .mapInPandas(score_pairs, "id_a long, id_b long, cosine double")
        )
        return out, banded

    def t_noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    res: dict[str, dict[str, list[float]]] = {
        "band": {"current": [], "vector": []},
        "full": {"current": [], "vector": []},
    }
    arms = [("current", assign_bucketize_current), ("vector", assign_bucketize_vector)]
    # warmup both arms once
    for _, fn in arms:
        t_noop(band_df(fn))
    for _ in range(reps):
        for name, fn in arms:
            spark.sparkContext.setJobDescription(f"kmeans band [{name}]")
            res["band"][name].append(t_noop(band_df(fn)))
            spark.sparkContext.setJobDescription(f"kmeans full [{name}]")
            out, banded = full_query(fn)
            res["full"][name].append(t_noop(out))
            banded.unpersist()
            spark.sparkContext.setJobDescription(None)
    import statistics

    summary = {
        stage: {
            arm: {"median": statistics.median(v), "reps": v}
            for arm, v in arms_.items()
        }
        for stage, arms_ in res.items()
    }
    print(json.dumps({"probe": "kmeans_decomp", "sf_dir": sf_dir,
                      "n_total": n_total, "rows": rows, **summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
