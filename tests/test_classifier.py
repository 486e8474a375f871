"""Linear quality-classifier inference: DuckDB twin parity (exact logits)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators.classifier import (
    classifier_score,
    classifier_score_sql,
    demo_weights,
    hashed_token_features,
)
from tests.conftest import TEST_SF_DIR


def test_matches_duckdb_twin(spark, duck):
    docs = load_table(spark, TEST_SF_DIR, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["logit"], r["keep"], r["prob"])
        for r in classifier_score(docs, demo_weights(spark), bias="0.25").collect()
    }
    want = {
        r[0]: (Decimal(str(r[1])), r[3], r[2])
        for r in duck.sql(classifier_score_sql(bias="0.25")).fetchall()
    }
    assert set(got) == set(want) and len(got) > 0
    for k, (logit, keep, prob) in got.items():
        wl, wk, wp = want[k]
        assert logit == wl, (k, logit, wl)  # exact decimal, bit-for-bit
        assert keep == wk
        assert abs(prob - wp) < 1e-12  # sigmoid is the one double step


def test_bias_shifts_logits_exactly(spark):
    docs = (
        load_table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    w = demo_weights(spark)
    z0 = {r["doc_id"]: r["logit"] for r in classifier_score(docs, w).collect()}
    z1 = {
        r["doc_id"]: r["logit"]
        for r in classifier_score(docs, w, bias="10").collect()
    }
    assert all(z1[k] - z0[k] == Decimal(10) for k in z0)


def test_hashed_features_partition_token_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "  x  "), (3, "")],
        "doc_id: bigint, text: string",
    )
    rows = hashed_token_features(docs).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        assert len(r["bucket"]) == 3
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["tf"]
    assert per_doc == {1: 4, 2: 1}  # tf sums to token count; empty doc absent


def test_sparse_weights_default_zero(spark):
    """Buckets missing from the weight table contribute 0 (left join)."""
    docs = spark.createDataFrame([(1, "hello world")], "doc_id: bigint, text: string")
    empty_w = spark.createDataFrame(
        [], "bucket: string, weight: decimal(12,6)"
    )
    rows = classifier_score(docs, empty_w, bias="0.5").collect()
    assert len(rows) == 1 and rows[0]["logit"] == Decimal("0.5")


def test_logit_matches_python_reference(spark):
    """Independent-reference parity: per-doc logit equals the plain-Python
    sum of md5-bucket weights over tokens (same stand-in weight
    derivation), computed entirely outside Spark."""
    import hashlib
    from decimal import Decimal

    docs_rows = [
        (1, "the quick brown fox"),
        (2, "the the the"),
        (3, "lorem ipsum dolor sit amet"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id: bigint, text: string")

    def bucket(tok: str) -> str:
        return hashlib.md5(tok.encode()).hexdigest()[:3]

    def weight(b: str) -> Decimal:
        h = int(hashlib.md5(f"w|{b}".encode()).hexdigest()[:6], 16)
        return (Decimal(h - 8388608) / 1000000).quantize(Decimal("0.000001"))

    got = {
        r["doc_id"]: r["logit"]
        for r in classifier_score(docs, demo_weights(spark)).collect()
    }
    for doc_id, text in docs_rows:
        want = sum((weight(bucket(t)) for t in text.split()), Decimal(0))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
