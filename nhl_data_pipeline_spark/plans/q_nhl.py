"""Driver-visible entry for the NHL domain pipeline (SURVEY §3.1).

Runs the full bronze→staging→silver→odds model DAG over the seeded
synthetic fixtures (deterministic — same rows every run) and returns the
betting-performance report. No SQL oracle: the DAG consumes nested-JSON
snapshot fixtures, not the lake tables, so the driver records the
rows-only check; the real assertions live in tests/test_nhl_pipeline.py
(latest-snapshot dedup, grain, crosswalk classes, quality suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.plans.registry import query


@query(
    "nhl_pipeline_e2e",
    covers="S6,P1-P6,F1-F4,J1-J9,A1-A9,W1-W6,U1",
    oracle=None,
)
def nhl_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full model DAG end-to-end; returns rpt_sog_props_performance.

    sf_dir is unused — inputs are the seeded snapshot fixtures (the NHL API
    shapes from FIXTURES.md), which is the point: this exercises the
    nested-JSON parse → flatten → dedup → entity-resolution → report chain
    the reference runs daily.
    """
    from nhl_data_pipeline_spark.nhl import fixtures
    from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline

    bronze = {
        "game_boxscore": fixtures.boxscore_snapshots(spark),
        "game_pbp": fixtures.pbp_snapshots(spark),
        "schedule": fixtures.schedule_snapshots(spark),
        "odds_player_props": fixtures.odds_snapshots(spark),
    }
    result = run_pipeline(spark, bronze)
    return result["rpt_sog_props_performance"].orderBy(F.asc("line_value"))
