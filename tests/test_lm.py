"""N-gram LM quality scoring vs its DuckDB twin + ranking semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators import lm
from tests.conftest import TEST_SF_DIR


def test_lm_score_matches_duckdb_twin(spark, duck):
    got = {
        r["doc_id"]: (r["n_trigrams"], r["mean_tri_prob"])
        for r in lm.ngram_lm_score(
            load_table(spark, TEST_SF_DIR, "documents")
        ).collect()
    }
    want = {r[0]: (r[1], r[2]) for r in duck.sql(lm.ngram_lm_score_sql()).fetchall()}
    assert got == want  # bit-exact, incl. the decimal-exact mean
    assert len(got) > 400


def test_lm_score_ranks_out_of_distribution_text_lower(spark):
    """An alien doc (vocabulary the corpus never uses, every token
    distinct so self-training can't reward repetition) must score below
    every in-corpus document; identical docs score identically."""
    d = load_table(spark, TEST_SF_DIR, "documents").select("doc_id", "text")
    alien = spark.createDataFrame(
        [(900001, " ".join(f"zq{i}xv" for i in range(60)))],
        "doc_id long, text string",
    )
    clone_src = d.filter(F.col("doc_id") == 7).select(
        F.lit(900002).alias("doc_id"), "text"
    )
    corpus = d.unionAll(alien).unionAll(clone_src)
    scores = {
        r["doc_id"]: r["mean_tri_prob"]
        for r in lm.ngram_lm_score(corpus).collect()
    }
    in_corpus = [v for k, v in scores.items() if k < 900000]
    assert scores[900001] < min(in_corpus)
    assert scores[900002] == scores[7]


def test_lm_score_with_separate_reference(spark):
    """CCNet shape: scoring under a DIFFERENT reference LM. Docs whose
    trigrams never appear in the reference bottom out at the smoothing
    floor k/(k*V), strictly below any doc sharing reference trigrams."""
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat " * 10)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (10, "the cat sat on the mat"),
            (11, "purple quantum bananas dance wildly tonight"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["mean_tri_prob"]
        for r in lm.ngram_lm_score(docs, reference=ref).collect()
    }
    assert scores[10] > scores[11] > 0.0


def test_lm_plan_stays_jvm_side(spark):
    """The scorer must be all-JVM (no Python stages) with partial
    aggregation on the count groupBys and the 1-row V table broadcast."""
    plan = lm.ngram_lm_score(load_table(spark, TEST_SF_DIR, "documents"))
    p = plan.sparkSession._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "extended"
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_count" in p or "partial_sum" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p  # 1-row V


def test_lm_short_docs_have_no_score_rows(spark):
    docs = spark.createDataFrame(
        [(1, "only two"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_trigrams"] for r in lm.ngram_lm_score(docs).collect()}
    assert 1 not in out  # < 3 tokens → no trigrams → no row
    assert out[2] == 1
