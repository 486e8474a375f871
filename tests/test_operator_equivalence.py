"""Equivalence of each operator's fast path vs its reference form.

The dedup/similarity operators ship multiple implementations (interpreted
HOF array form, Arrow-batched pandas form, codegen exploded form) that must
be EXACTLY interchangeable — same sets, same float bits — because one
oracle serves them all. These tests pin that on adversarial inputs the
synthetic lake doesn't contain: docs below the shingle width, repeated
shingles, unicode tokens, empty-ish vectors.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.operators import dedup as D
from nhl_data_pipeline_spark.operators import similarity as S

WORDS = ["a", "b", "c", "aa", "bb", "naïve", "Łódź", "x1", "—", "z"]


@pytest.fixture(scope="module")
def token_docs(spark):
    rng = random.Random(7)
    rows = []
    for i in range(60):
        n = rng.choice([0, 1, 2, 3, 4, 10, 25])
        toks = [rng.choice(WORDS) for _ in range(n)]
        if i % 5 == 0 and n >= 6:
            toks = toks[:3] * (n // 3)  # force repeated shingles
        rows.append((i, toks))
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_exploded_shingles_equal_array_form(spark, token_docs):
    fast = D.exploded_distinct_shingles(token_docs, F.col("toks"), 3)
    ref = token_docs.select(
        "doc_id", F.explode(D.shingles(F.col("toks"), 3)).alias("s")
    )
    ref_n = ref.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ref_full = ref.join(ref_n, "doc_id").select("doc_id", "s", "n")
    assert fast.exceptAll(ref_full).count() == 0
    assert ref_full.exceptAll(fast).count() == 0
    # docs below the shingle width vanish in BOTH forms
    assert fast.filter(F.col("doc_id").isin(
        [r["doc_id"] for r in token_docs.filter(F.size("toks") < 3).collect()]
    )).count() == 0


def test_simhash_exploded_equals_array_fold(spark, token_docs):
    fast = {
        (r["doc_id"], r["simhash16"])
        for r in D.simhash_exploded(token_docs, F.col("toks"), 16).collect()
    }
    ref = {
        (r["doc_id"], r["simhash16"])
        for r in token_docs.select(
            "doc_id", D.simhash("toks", 16).alias("simhash16")
        ).collect()
    }
    assert fast == ref  # includes empty-token docs (bits all zero)


def test_cosine_allpairs_numpy_bit_equals_jvm_fold(spark):
    rng = random.Random(11)
    dim = 16
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)
    ]
    # near-duplicate cluster so pairs cross the threshold
    base = rows[0][1]
    for i in range(1, 6):
        rows[i] = (i, [v + rng.uniform(-0.01, 0.01) for v in base])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    fast = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in S.cosine_allpairs_numpy(df, threshold=0.4).collect()
    }
    e = S.with_norm(df)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
                 F.col("nrm").alias("nb"))
    cos = S.dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    ref = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.4)
        .select("vec_a", "vec_b", "cosine")
        .collect()
    }
    assert set(fast) == set(ref)
    for k in ref:  # float BITS, not approx — one oracle serves both forms
        assert fast[k] == ref[k], (k, fast[k].hex(), ref[k].hex())


def test_hyperplane_banded_numpy_equals_array_form(spark):
    rng = random.Random(13)
    dim = 16
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    fast = {
        (r["vec_id"], r["band_idx"], r["bucket"])
        for r in S.hyperplane_banded_numpy(df, dim, 4, 3).collect()
    }
    ref = {
        (r["vec_id"], r["band_idx"], r["bucket"])
        for r in df.withColumn(
            "bkts", S.hyperplane_band_buckets("embedding", dim, 4, 3)
        )
        .select("vec_id", F.posexplode("bkts").alias("band_idx", "bucket"))
        .collect()
    }
    assert fast == ref
