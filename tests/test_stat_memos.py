"""Scalar-statistics memo boundary (r13, VERDICT r12 ask #8).

catalog.py's memoization policy allows exactly two memo classes: lazy
table plans (test_catalog_memo.py) and file-identity-keyed SCALAR
statistics that gate plan shape. These tests pin the scalar class: after
building every memo-using query, the memos hold only ints (row counts)
or BPE merge lists (pairs of strings) — never DataFrames, Rows, result
sets, or anything else that would smuggle data across runs — and every
key carries the (path, size, mtime_ns) invalidation triple.
"""

from __future__ import annotations

from nhl_data_pipeline_spark.plans import q_similarity, q_text
from nhl_data_pipeline_spark.plans.registry import all_queries
from tests.conftest import TEST_SF_DIR


def _check_key(key) -> None:
    # (path str, st_size int, st_mtime_ns int): the invalidation triple.
    assert isinstance(key, tuple) and len(key) == 3, key
    path, size, mtime = key
    assert isinstance(path, str) and path.endswith(".parquet"), key
    assert isinstance(size, int) and isinstance(mtime, int), key


def test_stat_memos_hold_only_scalars(spark):
    specs = all_queries()
    # Build (not run) every memo-populating query so the memos are warm.
    for name in ("ngram_lm_quality", "dedup_minhash_lsh", "tfidf_top_terms",
                 "kmeans_semantic_dedup"):
        fn = specs[name].bench_fn or specs[name].fn
        fn(spark, TEST_SF_DIR)

    assert q_text._DOC_COUNT_MEMO, "doc-count memo never populated"
    for key, val in q_text._DOC_COUNT_MEMO.items():
        _check_key(key)
        assert type(val) is int, (key, type(val))

    assert q_similarity._VEC_COUNT_MEMO, "vec-count memo never populated"
    for key, val in q_similarity._VEC_COUNT_MEMO.items():
        _check_key(key)
        assert type(val) is int, (key, type(val))

    assert q_text._BPE_MEMO, "BPE memo never populated"
    for key, val in q_text._BPE_MEMO.items():
        _check_key(key)
        assert isinstance(val, list), (key, type(val))
        for pair in val:
            assert (
                isinstance(pair, tuple)
                and len(pair) == 2
                and all(isinstance(p, str) for p in pair)
            ), pair
    spark.catalog.clearCache()
