"""Materialize the deterministic NHL bronze fixtures as parquet.

The nhl_pipeline_e2e query and its DuckDB oracle both consume these files,
so the correctness gate hash-compares the full bronze→report DAG against an
independent SQL engine. Regenerate (and commit) after any fixtures.py
change; tests/test_nhl_pipeline.py asserts the committed files still match
the in-memory fixtures.

Run: python tools/gen_bronze_fixtures.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BRONZE_DIR = os.path.join(
    REPO, "nhl_data_pipeline_spark", "nhl", "bronze_fixtures"
)

FAMILIES = ("game_boxscore", "game_pbp", "schedule", "odds_player_props")


def write_all() -> None:
    from nhl_data_pipeline_spark.nhl import fixtures
    from nhl_data_pipeline_spark.session import get_spark

    spark = get_spark("gen-bronze-fixtures")
    dfs = {
        "game_boxscore": fixtures.boxscore_snapshots(spark),
        "game_pbp": fixtures.pbp_snapshots(spark),
        "schedule": fixtures.schedule_snapshots(spark),
        "odds_player_props": fixtures.odds_snapshots(spark),
    }
    for name, df in dfs.items():
        path = os.path.join(BRONZE_DIR, name)
        # single file per family: tiny fixture data, tidy to commit
        df.coalesce(1).write.mode("overwrite").parquet(path)
        # drop Spark bookkeeping files so only the parquet is committed
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(path, f))
        print(f"wrote {path}: {df.count()} rows")


if __name__ == "__main__":
    write_all()
