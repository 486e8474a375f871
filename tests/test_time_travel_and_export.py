"""Versioned tables, temporal regression thresholds, export sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.nhl.time_travel import diff_versions
from nhl_data_pipeline_spark.sources import export, versioned


def test_versioned_write_read(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = versioned.write_version(spark.range(10), path)
    v1 = versioned.write_version(spark.range(12), path)
    assert (v0, v1) == (0, 1)
    assert versioned.read_version(spark, path).count() == 12  # latest
    assert versioned.read_version(spark, path, 0).count() == 10
    assert versioned.latest_version(path) == 1
    with pytest.raises(ValueError):
        versioned.read_version(spark, path, 7)


def test_diff_within_tolerance_passes(spark):
    prev = spark.range(100).withColumn("x", F.col("id") * 2)
    cur = spark.range(120).withColumn("x", F.col("id") * 2)  # +20% rows
    d = diff_versions(cur, prev)
    assert d.passed and d.row_change_pct == pytest.approx(0.2)


def test_diff_row_count_breach_fails(spark):
    prev = spark.range(100)
    cur = spark.range(10)  # -90%
    d = diff_versions(cur, prev)
    assert not d.passed
    assert any("row count" in r for r in d.reasons)


def test_diff_null_fraction_breach_fails(spark):
    prev = spark.range(100).withColumn("x", F.lit(1))
    cur = spark.range(100).withColumn(
        "x", F.when(F.col("id") < 90, F.lit(1))  # 10% nulls appear
    )
    d = diff_versions(cur, prev)
    assert not d.passed
    assert any("null fraction of x" in r for r in d.reasons)


def test_export_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "csv_out")
    export.export_csv(spark.range(5).withColumn("x", F.col("id") * 2), path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 5


def test_export_sheets_row_cap_guard(spark):
    big = spark.range(30_000).withColumn("x", F.lit("y"))
    with pytest.raises(ValueError, match="exceeds the Sheets practical cap"):
        export.export_sheets(big, "ss", "ws")


def test_export_sheets_stub_gated(spark):
    small = spark.range(3)
    with pytest.raises(NotImplementedError):
        export.export_sheets(small, "ss", "ws")
