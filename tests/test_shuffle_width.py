"""catalog.shuffle_width_for — the size-derived shuffle-width policy
(r9, VERDICT r8 asks #2/#3).

A fixed shuffle width makes per-task hash/sort state grow linearly with
the lake (measured: ~15 GB spill per jaccard run at sf10, raw exponent
1.25 on join_chain_revenue). The helper derives width from driver-side
parquet stats; these tests pin its arithmetic, its cluster fallback, and
that the gated call sites actually plant the width in the physical plan
when (and only when) the lake is above the spill regime.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import (
    ROW_BYTES_PER_PARTITION,
    TEXT_BYTES_PER_PARTITION,
    shuffle_width_for,
)
from tests.conftest import TEST_SF_DIR


def _fake_lake(tmp_path, sizes: dict[str, int]) -> str:
    for name, n in sizes.items():
        (tmp_path / f"{name}.parquet").write_bytes(b"\0" * n)
    return str(tmp_path)


def test_width_floors_at_parallelism(spark, tmp_path):
    lake = _fake_lake(tmp_path, {"lineitem": 1024})
    par = spark.sparkContext.defaultParallelism
    assert shuffle_width_for(spark, lake, "lineitem", 8 << 20) == par


def test_width_scales_with_bytes_and_sums_tables(spark, tmp_path):
    lake = _fake_lake(
        tmp_path, {"orders": 64 << 20, "lineitem": 192 << 20}
    )
    # 256 MiB total at an 8 MiB budget -> 33 partitions (+1 ceil-ish).
    assert shuffle_width_for(
        spark, lake, ("orders", "lineitem"), 8 << 20
    ) == 33
    # Single-table form.
    assert shuffle_width_for(spark, lake, "orders", 8 << 20) == max(
        spark.sparkContext.defaultParallelism, 9
    )


def test_missing_path_falls_back_to_parallelism(spark, tmp_path):
    # Cluster paths (hdfs://, s3://) fail os.path.getsize — the plan must
    # stay valid at the session parallelism instead of raising.
    par = spark.sparkContext.defaultParallelism
    assert (
        shuffle_width_for(spark, "/nonexistent", "lineitem", 8 << 20) == par
    )
    # One present + one missing table: still the fallback (partial sums
    # would understate the lake).
    lake = _fake_lake(tmp_path, {"orders": 1 << 30})
    assert (
        shuffle_width_for(spark, lake, ("orders", "lineitem"), 8 << 20)
        == par
    )


def test_budgets_are_sane():
    # Text explodes ~30x into shingle rows, plain rows ~4x decompressed —
    # the text budget must stay well under the row budget.
    assert TEXT_BYTES_PER_PARTITION * 8 <= ROW_BYTES_PER_PARTITION


def test_minhash_band_join_takes_explicit_width(spark):
    """width=N must hash-partition BOTH self-join sides on the band keys
    at N — REPARTITION_BY_NUM satisfies the join distribution, so the
    plan shows the explicit width and no extra planted exchange."""
    from nhl_data_pipeline_spark.catalog import load_table
    from nhl_data_pipeline_spark.plans.q_text import minhash_band_pairs

    d = load_table(spark, TEST_SF_DIR, "documents")
    p = minhash_band_pairs(d, width=57)._jdf.queryExecution().toString()
    assert p.count("REPARTITION_BY_NUM") >= 2
    assert "57" in p
    # Default (None) keeps the planner's own shape: no forced widths.
    p0 = minhash_band_pairs(d)._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" not in p0


@pytest.mark.parametrize("qname", ["join_chain_revenue", "composite_key_join"])
def test_fact_joins_stay_ungated_at_test_sf(spark, qname):
    """At fixture SF the width gate must NOT fire (width == parallelism):
    the pinned broadcast/AQE plan shapes stay byte-identical."""
    from nhl_data_pipeline_spark.plans.registry import all_queries

    df = all_queries()[qname].fn(spark, TEST_SF_DIR)
    p = df._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" not in p


def test_join_chain_gate_fires_above_spill_regime(spark, tmp_path, monkeypatch):
    """With a synthetic >8 MiB/partition lake the fact sides must carry
    the explicit size-derived repartition on their join keys."""
    import nhl_data_pipeline_spark.plans.q_joins as qj

    real_width = shuffle_width_for

    def big_width(s, d, tables, budget):
        return 4 * s.sparkContext.defaultParallelism

    monkeypatch.setattr(qj, "load_table", lambda s, d, n: _tiny(s, n))
    import nhl_data_pipeline_spark.catalog as cat

    monkeypatch.setattr(cat, "shuffle_width_for", big_width)
    df = qj.join_chain_revenue(spark, TEST_SF_DIR)
    p = df._jdf.queryExecution().toString()
    assert p.count("REPARTITION_BY_NUM") >= 3
    assert str(4 * spark.sparkContext.defaultParallelism) in p
    assert real_width is shuffle_width_for  # sanity: module fn untouched


def _tiny(spark, name):
    from nhl_data_pipeline_spark.catalog import load_table

    return load_table(spark, TEST_SF_DIR, name)
