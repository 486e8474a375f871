"""Every registered query must match its DuckDB oracle at sf0.001.

This mirrors the driver's sf0.01 correctness gate (row count + columns +
order-insensitive value compare) on the smallest scale factor so the suite
stays fast. `python -m nhl_data_pipeline_spark.plans.parity` runs the same
check at sf0.01 ad hoc.
"""

from __future__ import annotations

import pytest

from nhl_data_pipeline_spark.plans.parity import compare_query
from nhl_data_pipeline_spark.plans.registry import all_queries
from tests.conftest import TEST_SF_DIR


def _names() -> list[str]:
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    r = compare_query(spark, duck, name, TEST_SF_DIR)
    assert r.ok, r.detail
    spec = all_queries()[name]
    if spec.oracle is not None:
        assert r.spark_rows == r.oracle_rows


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(all_queries())
