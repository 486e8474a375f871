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


def test_cosine_allpairs_numpy_empty_input(spark):
    """Zero-row input must yield an empty frame, not an IndexError from
    2-D-indexing a (0,)-shaped collected matrix."""
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = S.cosine_allpairs_numpy(df, threshold=0.4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_a", "vec_b", "cosine"]


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


def test_hyperplane_banded_numpy_blas_and_passthrough(spark):
    """The bit_exact=False BLAS branch and the passthrough columns (r9,
    ADVICE r8: previously untested surface). Vectors are INTEGER-valued
    and the planes are exactly ±1, so every plane dot is exact integer
    arithmetic in float64 — summation ORDER cannot change a single bit,
    and the BLAS matmul must reproduce the sequential fold's buckets
    exactly. Passthrough columns must be replicated onto each of the
    row's `bands` output rows without a join."""
    rng = random.Random(29)
    dim = 16
    df = spark.createDataFrame(
        [
            (i, [float(rng.randint(-9, 9)) for _ in range(dim)], i % 3)
            for i in range(40)
        ],
        "vec_id long, embedding array<float>, cluster_id int",
    )
    seq = {
        (r["vec_id"], r["band_idx"], r["bucket"], r["cluster_id"])
        for r in S.hyperplane_banded_numpy(
            df, dim, 4, 3, passthrough=("cluster_id",)
        ).collect()
    }
    blas = {
        (r["vec_id"], r["band_idx"], r["bucket"], r["cluster_id"])
        for r in S.hyperplane_banded_numpy(
            df, dim, 4, 3, passthrough=("cluster_id",), bit_exact=False
        ).collect()
    }
    assert seq == blas
    assert len(seq) == 40 * 4  # every row fanned out to `bands` rows
    assert {(v % 3) == c for v, _, _, c in seq} == {True}  # passthrough


# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style) vs a Python brute force, and PII redaction
# vs the literal-same-regex DuckDB oracle fragment.

PII_TEXTS = [
    "contact me at jane.doe+spam@example.co.uk today",
    "server at 192.168.001.1 and 10.0.0.255 rebooted",
    "ssn 123-45-6789 leaked; call +1 (555) 123-4567 or 555-123-4567",
    "no pii here, just 12345 and v1.2 release notes",
    "mixed: a@b.io then 1.2.3.4 then 987-65-4321 done",
    "",
    "unicode naïve test — a@ü.com stays (non-ascii host not matched)",
]


def _brute_bigram_stats(text: str) -> tuple[int, int, int]:
    import re
    from collections import Counter

    toks = re.split(r"\s+", text)
    bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    cnt = Counter(bgs)
    top = max(cnt.values(), default=0)
    dup = sum(c for c in cnt.values() if c > 1)
    return len(bgs), top, dup


def test_repetition_stats_match_bruteforce(spark):
    from nhl_data_pipeline_spark.operators import text as X

    texts = [
        "a b a b c a b",
        "x",
        "",
        "a a a a a a",
        "q w e r t y",
        "a b a b a b a b",
        "one two one two three one two",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: (r["n"], r["top"], r["dup"], r["tf"], r["df"])
        for r in df.select(
            "i",
            X.repetition_stats("text").alias("s"),
            X.top_bigram_frac("text").alias("tf"),
            X.dup_bigram_frac("text").alias("df"),
        )
        .select("i", "s.n_bigrams", "s.top_bigram_n", "s.dup_bigram_mass", "tf", "df")
        .toDF("i", "n", "top", "dup", "tf", "df")
        .collect()
    }
    for i, t in enumerate(texts):
        n, top, dup = _brute_bigram_stats(t)
        exp_tf = top / n if n else 0.0
        exp_df = dup / n if n else 0.0
        assert got[i] == (n, top, dup, exp_tf, exp_df), (i, t, got[i])


def test_redact_pii_matches_duckdb_oracle(spark, duck):
    from nhl_data_pipeline_spark.operators import text as X

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "i long, text string"
    )
    got = {
        r["i"]: r["red"]
        for r in df.select("i", X.redact_pii("text").alias("red")).collect()
    }
    for i, t in enumerate(PII_TEXTS):
        lit = "'" + t.replace("'", "''") + "'"
        (oracle,) = duck.execute("SELECT " + X.redact_pii_sql(lit)).fetchone()
        assert got[i] == oracle, (t, got[i], oracle)
    # spot-check the semantics, not just cross-engine agreement
    assert "[EMAIL]" in got[0] and "@" not in got[0]
    assert got[1].count("[IP]") == 2
    assert "[SSN]" in got[2] and "[PHONE]" in got[2]
    assert got[3] == PII_TEXTS[3]  # no false positives on versions/ids


def test_pii_hits_counts(spark):
    from nhl_data_pipeline_spark.operators import text as X

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "i long, text string"
    )
    got = {
        r["i"]: r["n"] for r in df.select("i", X.pii_hits("text").alias("n")).collect()
    }
    assert got[0] == 1 and got[1] == 2 and got[2] == 3
    assert got[3] == 0 and got[4] == 3 and got[5] == 0


def test_repetition_exploded_equals_fold(spark):
    import random as _r

    from nhl_data_pipeline_spark.operators import text as X

    rng = _r.Random(11)
    words = ["alpha", "beta", "gamma", "x", "y"]
    texts = ["a b a b c a b", "x", "", "a a a a a a"]
    for _ in range(40):
        n = rng.choice([0, 1, 2, 5, 30, 120])
        texts.append(" ".join(rng.choice(words) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fold = df.select(
        "doc_id", X.repetition_stats("text").alias("s")
    ).select("doc_id", "s.n_bigrams", "s.top_bigram_n", "s.dup_bigram_mass")
    exploded = X.repetition_stats_exploded(df)
    a = {tuple(r) for r in fold.collect()}
    b = {tuple(r) for r in exploded.collect()}
    assert a == b
