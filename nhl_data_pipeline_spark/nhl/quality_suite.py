"""The reference's COMPLETE dbt schema-test suite, transcribed and run on
Spark.

Source of truth: the three schema.yml files of the reference dbt project —
dbt_nhl/models/bronze/schema.yml (16 tests), models/staging/schema.yml
(13), models/silver/schema.yml (204; 965 lines) — 233 declared test
instances in total (the ".context/DECISIONS.md:395" claim of "54 passing
tests" predates the later models; the YAMLs as committed declare 233).
Every instance below cites its reference layer/model and keeps the
reference's column names; where the engine's model spells a column
differently (e.g. reference ``shots`` = engine ``shots_on_goal``), the
per-model ``map`` translates — the asserted SEMANTICS are identical.

Test kinds (dbt core + dbt_utils, silver/schema.yml):
- not_null / unique                     → quality.not_null / quality.unique
- accepted_values                       → quality.accepted_values
- relationships (FK, 15 instances)      → quality.relationships
- dbt_utils.unique_combination_of_columns (:207-211, :607-612, tsabp)
                                        → quality.unique (multi-col)
- dbt_utils.accepted_range (tsabp pct columns)
                                        → quality.accepted_range

Consciously skipped (recorded, not silently dropped): the three
``fact_player_sog_props`` (v1) column tests — the engine ships only the
v2 model (the reference itself superseded v1; the v1 fuzzy OR-LIKE join
survives as the `fuzzy_or_like_join` registered operator).

Scale note: every check is one aggregate / anti-join over the model —
each compiles to a single pushed-down scan with map-side combine, so the
whole 230-check suite is a bounded number of small Spark jobs, not a
per-row framework.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nhl_data_pipeline_spark.nhl.quality import (
    CheckResult,
    accepted_range,
    accepted_values,
    not_null,
    relationships,
    unique,
)

POSITION_CODES_ALL = ["C", "LW", "RW", "L", "R", "D", "G"]  # silver:108
POSITION_CODES_SKATERS = ["C", "LW", "RW", "L", "R", "D"]  # silver (fpgs)

# Per reference model: the declared tests, verbatim from the YAMLs.
# "map" translates reference column names to the engine's spelling where
# they differ; unmapped names are used as-is.
SUITE: dict[str, dict] = {
    # ---------------- bronze/schema.yml (16) ----------------
    "bronze_schedule_snapshots": {
        "source": "bronze:schedule",
        "not_null": ["payload", "s3_key", "ingest_ts"],
    },
    "bronze_game_boxscore_snapshots": {
        "source": "bronze:game_boxscore",
        "not_null": ["payload", "s3_key", "partition_date", "game_id"],
    },
    "bronze_game_pbp_snapshots": {
        "source": "bronze:game_pbp",
        "not_null": ["payload", "s3_key", "partition_date", "game_id"],
    },
    "bronze_odds_player_props": {
        "source": "bronze:odds_player_props",
        # reference odds bronze names its partition column game_date
        "map": {"game_date": "partition_date"},
        "not_null": ["payload", "s3_key", "game_date", "event_id", "market"],
    },
    # ---------------- staging/schema.yml (13) ----------------
    "stg_games": {
        "unique": [["game_id"]],
        "not_null": ["game_id", "game_date", "home_team_id", "away_team_id"],
    },
    "stg_odds_player_props": {
        "not_null": ["game_date", "event_id", "player_name"],
    },
    "stg_player_name_crosswalk": {
        "map": {"nhl_player_id": "player_id"},
        "unique": [["odds_player_name"]],
        "not_null": ["odds_player_name", "nhl_player_id", "nhl_player_name"],
        "accepted_values": {
            "match_method": ["exact", "normalized", "initial_last"],
        },
    },
    # ---------------- silver/schema.yml (204) ----------------
    "dim_date": {
        "unique": [["date_key"]],
        "not_null": [
            "date_key", "year", "month", "day", "day_of_week",
            "season_phase", "is_game_day", "games_on_date", "is_weekend",
        ],
        "accepted_values": {
            "season_phase": [
                "Early Season", "Mid Season", "Late Season",
                "Playoffs", "Off Season", "Unknown",
            ],
        },
    },
    "dim_team": {
        "unique": [["team_id"]],
        "not_null": [
            "team_id", "team_abbrev", "place_name", "common_name",
            "team_name", "logo_url_light", "logo_url_dark",
        ],
    },
    "dim_player": {
        "unique": [["player_id"]],
        "not_null": ["player_id", "player_name", "position_code", "position_type"],
        "accepted_values": {
            "position_code": POSITION_CODES_ALL,
            "position_type": ["F", "D", "G"],
        },
    },
    "fact_game_results": {
        "unique": [["game_id"]],
        "not_null": [
            "game_id", "date_key", "home_team_id", "away_team_id",
            "home_score", "away_score", "season", "game_type",
            "periods_played", "goal_differential", "total_goals",
            "venue_name", "game_state", "went_to_overtime",
            "source_partition_date", "source_s3_key",
        ],
        "accepted_values": {"game_state": ["OFF"]},
        "relationships": [
            ("date_key", "dim_date", "date_key"),
            ("home_team_id", "dim_team", "team_id"),
            ("away_team_id", "dim_team", "team_id"),
        ],
    },
    "fact_player_game_stats": {
        "map": {
            "shots": "shots_on_goal",
            "pp_goals": "power_play_goals",
            "sh_goals": "shorthanded_goals",
            "time_on_ice": "toi",
        },
        "unique_combination": [["game_id", "player_id"]],  # silver:207-211
        "not_null": [
            "game_id", "player_id", "date_key", "team_id",
            "opponent_team_id", "opponent_team_abbrev", "home_away",
            "position_type", "goals", "assists", "points", "shots",
            "position_code", "plus_minus", "penalty_minutes", "pp_goals",
            "sh_goals", "hits", "blocked_shots", "giveaways", "takeaways",
            "time_on_ice", "shifts",
        ],
        "accepted_values": {
            "home_away": ["home", "away"],
            "position_type": ["F", "D"],
            "position_code": POSITION_CODES_SKATERS,
        },
        "relationships": [
            ("game_id", "fact_game_results", "game_id"),
            ("player_id", "dim_player", "player_id"),
            ("date_key", "dim_date", "date_key"),
            ("team_id", "dim_team", "team_id"),
            ("opponent_team_id", "dim_team", "team_id"),
        ],
    },
    "fact_team_game_stats": {
        # (r7: the shots_for->shots_on_goal rename map is gone — the
        # engine model now carries the reference's column name directly.)
        "not_null": [
            "game_id", "team_id", "date_key", "opponent_team_id",
            "season", "game_type", "home_away", "goals_for",
            "goals_against", "goal_differential", "shots_for",
            "shots_against", "shot_differential", "shooting_pct",
            "save_pct", "hits", "giveaways", "takeaways",
            "penalty_minutes", "pp_goals", "sh_goals",
        ],
        "accepted_values": {
            "home_away": ["home", "away"],
            "result": ["W", "L"],
        },
    },
    "player_shot_metrics": {
        "not_null": [
            "season", "player_id", "player_name", "team_id", "team_abbrev",
            "position_code", "position_type", "games_played",
            "total_shots", "total_goals", "total_assists", "total_points",
            "total_plus_minus", "total_hits", "total_blocked_shots",
            "total_takeaways", "total_giveaways", "total_shifts",
            "total_pp_goals", "total_sh_goals",
            "shots_per_game", "goals_per_game", "assists_per_game",
            "points_per_game", "plus_minus_per_game", "hits_per_game",
            "blocked_shots_per_game", "takeaways_per_game",
            "giveaways_per_game", "shifts_per_game", "shooting_pct",
        ],
        "accepted_values": {
            "position_code": POSITION_CODES_SKATERS,
            "position_type": ["F", "D"],
        },
        "relationships": [
            ("player_id", "dim_player", "player_id"),
            ("team_id", "dim_team", "team_id"),
        ],
    },
    "fact_shot_events": {
        "map": {
            "shooter_player_id": "player_id",
            "shooter_position_code": "position_code",
            "shooter_position_type": "position_type",
            "shooting_team_id": "team_id",
            "defending_team_id": "opponent_team_id",
        },
        "unique_combination": [["game_id", "event_id"]],  # silver:607-612
        "not_null": [
            "game_id", "event_id", "game_date", "season", "game_type",
            "period", "period_type", "time_in_period", "time_remaining",
            "shooter_player_id", "shooting_team_id", "shooter_home_away",
            "defending_team_id", "event_type", "shot_result", "is_goal",
            "home_team_id", "home_team_abbrev", "away_team_id",
            "away_team_abbrev",
        ],
        "accepted_values": {
            "shooter_position_code": POSITION_CODES_SKATERS,
            "shooter_position_type": ["F", "D"],
            "shooter_home_away": ["home", "away"],
            "event_type": ["shot-on-goal", "goal", "missed-shot"],
            "shot_result": ["goal", "saved", "missed"],
            "is_goal": [0, 1],
        },
        "relationships": [
            ("shooter_player_id", "dim_player", "player_id"),
            ("shooting_team_id", "dim_team", "team_id"),
            ("defending_team_id", "dim_team", "team_id"),
            ("goalie_id", "dim_player", "player_id"),
            ("assist1_player_id", "dim_player", "player_id"),
            ("assist2_player_id", "dim_player", "player_id"),
            ("home_team_id", "dim_team", "team_id"),
            ("away_team_id", "dim_team", "team_id"),
        ],
    },
    "team_shots_against_by_position": {
        "unique_combination": [["game_id", "team_id"]],
        "not_null": [
            "game_id", "game_date", "team_id", "team_abbrev", "team_name",
            "season", "home_away", "shots_against_forwards",
            "shots_against_defense", "total_shots_against",
            "shots_against_forwards_3game_avg",
            "shots_against_defense_3game_avg",
            "shots_against_forwards_5game_avg",
            "shots_against_defense_5game_avg",
            "shots_against_forwards_season_avg",
            "shots_against_defense_season_avg",
            "games_played_in_season",
        ],
        "accepted_values": {
            "home_away": ["home", "away"],
            "result": ["W", "L"],
        },
        "accepted_range": [
            ("pct_shots_against_from_forwards", 0, 100, True),
            ("pct_shots_against_from_defense", 0, 100, True),
        ],
        "relationships": [
            ("game_id", "fact_game_results", "game_id"),
            ("game_date", "dim_date", "date_key"),
            ("team_id", "dim_team", "team_id"),
        ],
    },
    "fact_player_sog_props_v2": {
        "not_null": ["game_date", "event_id", "odds_player_name"],
    },
    "rpt_sog_props_performance": {
        "not_null": ["analysis_type"],
    },
}

# Reference tests NOT runnable on the engine's DAG, with the reason —
# surfaced by suite_counts() so the parity gap is explicit, never silent.
SKIPPED: list[tuple[str, str, str]] = [
    (
        "fact_player_sog_props", t, "v1 model superseded by v2 in the engine"
        " (the v1 OR-LIKE fuzzy join lives on as plans/q_joins.py's"
        " fuzzy_or_like_join operator)"
    )
    for t in ("not_null(game_date)", "not_null(event_id)",
              "not_null(odds_player_name)")
]


def _frame(
    model: str, spec: dict, models: dict[str, DataFrame],
    bronze: dict[str, DataFrame] | None,
) -> DataFrame:
    src = spec.get("source")
    if src and src.startswith("bronze:"):
        if bronze is None:
            raise KeyError(f"{model}: bronze frames not provided")
        return bronze[src.split(":", 1)[1]]
    return models[model]


def run_reference_suite(
    models: dict[str, DataFrame],
    bronze: dict[str, DataFrame] | None = None,
) -> list[CheckResult]:
    """Every runnable reference test instance, as CheckResults."""
    out: list[CheckResult] = []
    for model, spec in SUITE.items():
        if spec.get("source", "").startswith("bronze:") and bronze is None:
            continue
        df = _frame(model, spec, models, bronze)
        m = spec.get("map", {})
        col = lambda c: m.get(c, c)  # noqa: E731
        nn = [col(c) for c in spec.get("not_null", [])]
        if nn:
            results = not_null(df, model, *nn)
            # report under the REFERENCE column name so counts line up
            for ref_c, r in zip(spec.get("not_null", []), results):
                out.append(
                    CheckResult(model, f"not_null({ref_c})", r.passed, r.failing_rows)
                )
        for cols in spec.get("unique", []):
            out.append(unique(df, model, *[col(c) for c in cols]))
        for cols in spec.get("unique_combination", []):
            out.append(unique(df, model, *[col(c) for c in cols]))
        for ref_c, values in spec.get("accepted_values", {}).items():
            r = accepted_values(df, model, col(ref_c), values)
            out.append(
                CheckResult(model, f"accepted_values({ref_c})", r.passed, r.failing_rows)
            )
        for ref_c, lo, hi, inclusive in spec.get("accepted_range", []):
            out.append(accepted_range(df, model, col(ref_c), lo, hi, inclusive))
        for ref_c, parent, parent_col in spec.get("relationships", []):
            r = relationships(df, model, col(ref_c), models[parent], parent_col)
            out.append(
                CheckResult(
                    model,
                    f"relationships({ref_c}→{parent}.{parent_col})",
                    r.passed,
                    r.failing_rows,
                )
            )
    return out


def suite_counts() -> dict[str, int]:
    """Declared / runnable / skipped instance counts vs the reference."""
    declared = 0
    for spec in SUITE.values():
        declared += len(spec.get("not_null", []))
        declared += len(spec.get("unique", []))
        declared += len(spec.get("unique_combination", []))
        declared += len(spec.get("accepted_values", {}))
        declared += len(spec.get("accepted_range", []))
        declared += len(spec.get("relationships", []))
    return {
        "runnable": declared,
        "skipped": len(SKIPPED),
        "reference_declared": declared + len(SKIPPED),
    }
