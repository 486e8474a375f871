"""Property-based tests for the dialect-pinned scalar helpers.

The reference has no property/randomized testing (SURVEY §5 'not present');
these pin each Snowflake-dialect divergence against an independent Python
reference over generated inputs. One Spark job per example batch keeps the
suite fast.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.functions.scalars import (
    accent_fold,
    nhl_season_code,
    split_part,
    sunday_zero_dow,
)
from nhl_data_pipeline_spark.functions import scalars as S

TOKEN = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8
)


def _run(spark, values, col_builder, schema="v string"):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r["out"] for r in df.select(col_builder(F.col("v")).alias("out")).collect()]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(TOKEN, min_size=1, max_size=6), min_size=1, max_size=20))
def test_split_part_last_token(spark, token_lists):
    values = [" ".join(toks) for toks in token_lists]
    got = _run(spark, values, lambda c: split_part(c, " ", -1))
    want = [v.split(" ")[-1] for v in values]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2035, 12, 31)),
        min_size=1,
        max_size=30,
    )
)
def test_nhl_season_code(spark, dates):
    df = spark.createDataFrame([(d,) for d in dates], "v date")
    got = [r["out"] for r in df.select(nhl_season_code(F.col("v")).alias("out")).collect()]
    want = [
        d.year * 10000 + (d.year + 1) if d.month >= 10 else (d.year - 1) * 10000 + d.year
        for d in dates
    ]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2035, 12, 31)),
        min_size=1,
        max_size=30,
    )
)
def test_sunday_zero_dow(spark, dates):
    df = spark.createDataFrame([(d,) for d in dates], "v date")
    got = [r["out"] for r in df.select(sunday_zero_dow(F.col("v")).alias("out")).collect()]
    # python weekday(): Monday=0..Sunday=6 → Snowflake base: Sunday=0..Saturday=6
    want = [(d.weekday() + 1) % 7 for d in dates]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=S._ACCENTED + "abcXYZ ", max_size=20), min_size=1, max_size=20))
def test_accent_fold(spark, texts):
    got = _run(spark, texts, accent_fold)
    table = str.maketrans(S._ACCENTED, S._FOLDED)
    want = [t.translate(table) for t in texts]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=S._ACCENTED + "abc XYZ", max_size=15), min_size=1, max_size=15))
def test_accent_fold_unicode_agrees_on_latin(spark, texts):
    """The general NFKD pandas-UDF path agrees with the JVM translate path
    on the Latin alphabet both cover."""
    from nhl_data_pipeline_spark.functions.scalars import accent_fold_unicode

    df = spark.createDataFrame([(t,) for t in texts], "v string")
    got = [
        (r["a"], r["b"])
        for r in df.select(
            accent_fold(F.col("v")).alias("a"), accent_fold_unicode("v").alias("b")
        ).collect()
    ]
    for a, b in got:
        assert a == b
