"""The reference's SECOND analyst worksheet — the odds/betting analysis —
runs verbatim over the ENGINE'S OWN model outputs.

`dbt_nhl/analysis/odds_matching_queries.sql` (all eight statements, read
byte-for-byte from the reference tree) executes via ``resolve_dbt_refs``
(the `{{ ref('model') }}` templating dbt compiles away) +
``spark_sql_compat``, against the temp views the engine's NHL model DAG
registers when built from the committed bronze fixtures. This is the
strongest switch-over proof available: not synthetic views shaped like
the reference's models, but the engine's actual crosswalk /
fact_player_sog_props_v2 outputs satisfying the reference's downstream
SQL unchanged — names, filters, and semantics.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.nhl import fixtures
from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline
from nhl_data_pipeline_spark.plans.dialect import (
    resolve_dbt_refs,
    spark_sql_compat,
)

WORKSHEET = Path("/root/reference/dbt_nhl/analysis/odds_matching_queries.sql")


def _statements() -> list[str]:
    raw = WORKSHEET.read_text()
    no_comments = re.sub(r"--[^\n]*", "", raw)
    return [s.strip() for s in no_comments.split(";") if s.strip()]


@pytest.fixture(scope="module")
def odds_models(spark):
    bronze = {
        "game_boxscore": fixtures.boxscore_snapshots(spark),
        "schedule": fixtures.schedule_snapshots(spark),
        "game_pbp": fixtures.pbp_snapshots(spark),
        "odds_player_props": fixtures.odds_snapshots(spark),
    }
    return run_pipeline(spark, bronze).models


def test_worksheet_has_eight_statements():
    assert len(_statements()) == 8


@pytest.mark.parametrize("idx", range(8))
def test_odds_worksheet_statement_verbatim(spark, odds_models, idx):
    stmt = _statements()[idx]
    df = spark_sql_compat(spark, resolve_dbt_refs(stmt))
    rows = df.collect()
    # every statement must RUN; the crosswalk/sample/performance queries
    # (1, 2, 4, 8) are non-empty on the fixture season
    if idx in (0, 1, 3, 7):
        assert len(rows) > 0, (idx, stmt[:120])


def test_crosswalk_overview_semantics(spark, odds_models):
    """Worksheet §1 equals an independent Spark-native re-expression over
    the same model output (per-method counts + avg confidence)."""
    stmt = _statements()[0]
    got = {
        r["match_method"]: (r["num_players"], r["avg_confidence_pct"])
        for r in spark_sql_compat(spark, resolve_dbt_refs(stmt)).collect()
    }
    want = {
        r["match_method"]: (
            r["n"],
            float(r["avg_pct"]),
        )
        for r in odds_models["stg_player_name_crosswalk"]
        .groupBy("match_method")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("confidence") * 100, 1).alias("avg_pct"),
        )
        .collect()
    }
    assert got == want and len(got) >= 2  # several match strategies fire


def test_betting_performance_semantics(spark, odds_models):
    """Worksheet §4's total_props equals a direct recount of the decided,
    matched props in the engine's v2 fact."""
    stmt = _statements()[3]
    row = spark_sql_compat(spark, resolve_dbt_refs(stmt)).collect()[0]
    direct = (
        odds_models["fact_player_sog_props_v2"]
        .filter("match_method IS NOT NULL AND actual_sog IS NOT NULL")
        .count()
    )
    assert row["total_props"] == direct > 0
    assert row["overs_hit"] + row["unders_hit"] + row["pushes"] == direct
