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


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_into_update_insert_delete(spark, tmp_path):
    path = str(tmp_path / "vt_merge")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    v0 = versioned.merge_into(spark, path, base, on=["id"])
    assert v0 == 0

    # update id=2, insert id=4 — one commit, new version
    upd = spark.createDataFrame([(2, "b2"), (4, "d")], "id long, val string")
    v1 = versioned.merge_into(spark, path, upd, on=["id"])
    assert v1 == 1
    assert _rows(versioned.read_version(spark, path)) == {
        (1, "a"), (2, "b2"), (3, "c"), (4, "d")
    }
    # time travel: the pre-merge snapshot is intact
    assert _rows(versioned.read_version(spark, path, 0)) == {
        (1, "a"), (2, "b"), (3, "c")
    }

    # matched delete, unmatched ignored
    dels = spark.createDataFrame([(1, None), (9, None)], "id long, val string")
    versioned.merge_into(
        spark, path, dels, on=["id"],
        when_matched="delete", when_not_matched="ignore",
    )
    assert _rows(versioned.read_version(spark, path)) == {
        (2, "b2"), (3, "c"), (4, "d")
    }

    # matched ignore keeps the target's row
    ign = spark.createDataFrame([(3, "ZZZ")], "id long, val string")
    versioned.merge_into(
        spark, path, ign, on=["id"],
        when_matched="ignore", when_not_matched="ignore",
    )
    assert (3, "c") in _rows(versioned.read_version(spark, path))


def test_merge_commit_retry_on_collision(spark, tmp_path):
    """A racer committing between merge-read and merge-write must not be
    overwritten: the pinned errorifexists write collides and the retry
    re-merges on top of the racer's snapshot."""
    import os

    path = str(tmp_path / "vt_race")
    versioned.write_version(
        spark.createDataFrame([(1, "a")], "id long, val string"), path
    )
    # simulate the racer: v=1 already exists when our merge tries to commit
    racer = spark.createDataFrame([(7, "racer")], "id long, val string")
    racer.write.parquet(os.path.join(path, "v=1"))

    v = versioned.merge_into(
        spark, path,
        spark.createDataFrame([(2, "mine")], "id long, val string"),
        on=["id"],
    )
    assert v == 2
    got = _rows(versioned.read_version(spark, path))
    assert (7, "racer") in got and (2, "mine") in got  # nothing lost


def test_compact_and_expire(spark, tmp_path):
    import os

    path = str(tmp_path / "vt_compact")
    df = spark.range(100).repartition(8).withColumn("x", F.col("id") * 2)
    versioned.write_version(df, path)
    v = versioned.compact(spark, path, target_files=1)
    vdir = os.path.join(path, f"v={v}")
    files = [f for f in os.listdir(vdir) if f.endswith(".parquet")]
    assert len(files) == 1
    assert _rows(versioned.read_version(spark, path, v)) == _rows(
        versioned.read_version(spark, path, 0)
    )

    expired = versioned.expire_versions(path, keep_last=1)
    assert expired == [0]
    with pytest.raises(ValueError, match="not in"):
        versioned.read_version(spark, path, 0)


def test_export_all_models_golden_headers(spark, tmp_path):
    """The 11-model export manifest (reference sheets_export.py:39-57)
    drives the REAL model DAG to CSV: every manifest model exports, each
    CSV's header row equals the model's columns in model order (golden
    header per model), and the Bruins-only subsets all fit the Sheets
    row cap they exist for."""
    import csv
    from pathlib import Path

    from nhl_data_pipeline_spark.nhl import fixtures
    from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline

    bronze = {
        "game_boxscore": fixtures.boxscore_snapshots(spark),
        "game_pbp": fixtures.pbp_snapshots(spark),
        "schedule": fixtures.schedule_snapshots(spark),
        "odds_player_props": fixtures.odds_snapshots(spark),
    }
    models = run_pipeline(spark, bronze).models
    paths = export.export_all(models, str(tmp_path / "exports"))
    assert list(paths) == list(export.EXPORT_MODELS)  # manifest order
    for name, path in paths.items():
        files = list(Path(path).glob("*.csv"))
        assert len(files) == 1, (name, files)  # single-file Tableau shape
        with open(files[0], newline="") as fh:
            header = next(csv.reader(fh))
        assert header == models[name].columns, name
    for name in export.EXPORT_MODELS:
        if name.startswith("bruins_"):
            assert models[name].count() <= export.SHEETS_ROW_CAP, name
