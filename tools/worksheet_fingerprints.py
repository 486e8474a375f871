"""Generate tests/worksheet_fingerprints.json: physical-plan operator
counts for the 8 verbatim odds-worksheet statements.

The verbatim suites (tests/test_worksheet_verbatim_odds.py) prove the
reference's analyst SQL RUNS and returns correct values — but a dialect-
shim regression that degrades a worksheet PLAN (un-broadcasting a dim,
adding an exchange) would pass them. This pins the same scale-relevant
operator multiset the registry gate pins (tools/plan_fingerprints.py),
evaluated over the deterministic fixture-built model views.

Regenerate deliberately after an intentional plan or model change:
    python tools/worksheet_fingerprints.py
then review the diff like any other code change.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from plan_fingerprints import fingerprint  # noqa: E402

OUT = (
    Path(__file__).resolve().parent.parent
    / "tests"
    / "worksheet_fingerprints.json"
)
WORKSHEET = Path("/root/reference/dbt_nhl/analysis/odds_matching_queries.sql")


def statements() -> list[str]:
    raw = WORKSHEET.read_text()
    no_comments = re.sub(r"--[^\n]*", "", raw)
    return [s.strip() for s in no_comments.split(";") if s.strip()]


def build_models(spark) -> None:
    from nhl_data_pipeline_spark.nhl import fixtures
    from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline

    bronze = {
        "game_boxscore": fixtures.boxscore_snapshots(spark),
        "schedule": fixtures.schedule_snapshots(spark),
        "game_pbp": fixtures.pbp_snapshots(spark),
        "odds_player_props": fixtures.odds_snapshots(spark),
    }
    run_pipeline(spark, bronze)  # registers every model as a temp view


def main() -> None:
    from nhl_data_pipeline_spark.plans.dialect import (
        resolve_dbt_refs,
        spark_sql_compat,
    )
    from nhl_data_pipeline_spark.session import get_spark

    spark = get_spark("worksheet_fingerprints", cpus=8)
    build_models(spark)
    out: dict[str, dict[str, int]] = {}
    for i, stmt in enumerate(statements()):
        df = spark_sql_compat(spark, resolve_dbt_refs(stmt))
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[f"odds_stmt_{i}"] = fingerprint(plan)
        print(f"odds_stmt_{i}", out[f"odds_stmt_{i}"])
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
