"""lm ngram-builder rewrite (r13): the lead-window form was replaced
with positional element_at reads over the carried token array, deleting
the doc-id exchange the window forced on every lm plan (fingerprint
10 → 6 Exchange). These tests pin exact row-level equality against the
legacy lead-window implementation, kept inline as the executable spec —
including the edge docs the range filter guards (< n tokens, empty,
NULL text) — plus the no-exchange/no-window plan property that is the
point of the rewrite.

(The same rewrite was probed for dedup.exploded_distinct_shingles and
REJECTED on measurement — its consumers need the id distribution anyway,
so the window only costs a near-sorted sort; see the operator docstring
and bench_logs/r13/probe_shingle_ab_sf01.out. The edge-doc pins below
cover that builder too so a future rewrite keeps its guard semantics.)
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators import dedup as D
from nhl_data_pipeline_spark.operators import lm as LM
from nhl_data_pipeline_spark.operators.text import tokens
from tests.conftest import TEST_SF_DIR


def _legacy_ngrams(d, n, id_col, text_col):
    tok = d.select(
        id_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
    parts = ["tok", *[f"t{i}" for i in range(1, n)]]
    return (
        tok.select(id_col, "tok", *leads)
        .filter(F.col(f"t{n - 1}").isNotNull())
        .select(id_col, F.concat_ws(" ", *parts).alias("gram"))
    )


def _edge_corpus(spark):
    rows = [
        (0, "a b c d e"),          # normal
        (1, "a b"),                # < n tokens for n=3: no output rows
        (2, ""),                   # empty text
        (3, None),                 # NULL text
        (4, "x x x x"),            # duplicate shingles collapse
        (5, "one two three"),      # exactly n tokens: one shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _assert_same(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_lm_ngrams_match_legacy(spark):
    docs = load_table(spark, TEST_SF_DIR, "documents")
    for n in (2, 3):
        new = LM._ngrams(docs, n, id_col="doc_id", text_col="text")
        old = _legacy_ngrams(docs, n, "doc_id", "text")
        _assert_same(new, old)
    edge = _edge_corpus(spark)
    _assert_same(
        LM._ngrams(edge, 3, id_col="doc_id", text_col="text"),
        _legacy_ngrams(edge, 3, "doc_id", "text"),
    )


def test_lm_ngrams_plan_has_no_exchange_or_window(spark):
    """The r13 point of the rewrite: the ngram build is a pure map —
    no exchange, no window/sort of the exploded token table."""
    docs = load_table(spark, TEST_SF_DIR, "documents")
    p = (
        LM._ngrams(docs, 3, id_col="doc_id", text_col="text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p and "Window" not in p


def test_shingle_builder_edge_docs(spark):
    """Guard semantics of the (kept) lead-window shingle builder on the
    adversarial docs: <n-token / empty / NULL-text docs vanish, duplicate
    shingles collapse to one row, n counts the DISTINCT set."""
    docs = _edge_corpus(spark)
    rows = {
        (r["doc_id"], r["s"]): r["n"]
        for r in D.exploded_distinct_shingles(
            docs, tokens(F.col("text")), 3
        ).collect()
    }
    ids = {d for d, _ in rows}
    assert ids == {0, 4, 5}
    assert rows[(5, "one two three")] == 1
    # doc 0: 5 tokens -> 3 shingles, all distinct
    assert sum(1 for d, _ in rows if d == 0) == 3
    assert all(n == 3 for (d, _), n in rows.items() if d == 0)
    # doc 4: "x x x x" -> two identical windows collapse to one row
    assert sum(1 for d, _ in rows if d == 4) == 1
    assert rows[(4, "x x x")] == 1
