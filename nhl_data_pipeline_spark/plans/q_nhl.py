"""Driver-visible entry for the NHL domain pipeline (SURVEY §3.1).

Runs the full bronze→staging→silver→odds model DAG and returns the
betting-performance report. Bronze inputs are the committed fixture parquet
files (`nhl/bronze_fixtures/`, written by tools/gen_bronze_fixtures.py from
the deterministic fixtures) so the DuckDB oracle can consume the IDENTICAL
bytes: the oracle below re-derives the whole report chain — latest-snapshot
dedup, nested-JSON flattens, entity-resolution crosswalk, bookmaker
preference rank, Over/Under pivot, game resolution, outcome classification,
hit-rate report — in independent SQL, making the e2e DAG hash-checked
rather than rows-only.

Reference chain being mirrored (cited per step in nhl/*.py):
stg_games.sql / stg_player_game_stats.sql / stg_odds_player_props.sql →
dim_player.sql → stg_player_name_crosswalk.sql →
fact_player_game_stats.sql → fact_player_sog_props_v2.sql →
rpt_sog_props_performance.sql:25-118.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.functions.scalars import _ACCENTED, _FOLDED
from nhl_data_pipeline_spark.plans.registry import query

BRONZE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "nhl",
    "bronze_fixtures",
)

# DuckDB twins of the crosswalk key expressions (odds.py:34-38 /
# functions/scalars.py accent fold).
_FOLD = f"upper(trim(translate({{c}}, '{_ACCENTED}', '{_FOLDED}')))"


def _fold(c: str) -> str:
    return _FOLD.format(c=c)


def _key3(c: str) -> str:
    f = _fold(c)
    return f"left({f}, 1) || '|' || upper((string_split({f}, ' '))[-1])"


def _oracle() -> str:
    box = f"{BRONZE_DIR}/game_boxscore/*.parquet"
    odds = f"{BRONZE_DIR}/odds_player_props/*.parquet"
    pgs_side = """
        SELECT game_id,
               CAST(json_extract_string(payload, '$.gameDate') AS DATE) AS game_date,
               json_extract_string(payload, '$.gameState') AS game_state,
               unnest(CAST(json_extract(payload, '$.playerByGameStats.{side}Team.{arr}')
                           AS JSON[])) AS pl
        FROM box_latest
    """
    sides = "\n        UNION ALL\n".join(
        pgs_side.format(side=side, arr=arr)
        for side in ("home", "away")
        for arr in ("forwards", "defense")
    )
    return f"""
        WITH box AS (
            SELECT * FROM read_parquet('{box}')
        ),
        box_latest AS (
            SELECT * FROM box
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY game_id ORDER BY partition_date DESC, s3_key DESC
            ) = 1
        ),
        stg_games AS (
            SELECT CAST(json_extract(payload, '$.id') AS BIGINT) AS game_id,
                   CAST(json_extract_string(payload, '$.gameDate') AS DATE) AS game_date,
                   json_extract_string(payload, '$.homeTeam.name.default') AS home_team_name,
                   json_extract_string(payload, '$.gameState') AS game_state
            FROM box_latest
        ),
        pgs_raw AS (
        {sides}
        ),
        stg_pgs AS (
            SELECT game_id, game_date, game_state,
                   CAST(json_extract(pl, '$.playerId') AS BIGINT) AS player_id,
                   json_extract_string(pl, '$.name.default') AS player_name,
                   CAST(json_extract(pl, '$.sog') AS INTEGER) AS shots_on_goal
            FROM pgs_raw
            WHERE json_extract(pl, '$.playerId') IS NOT NULL
              AND json_type(json_extract(pl, '$.playerId')) <> 'NULL'
        ),
        dim_player AS (
            SELECT player_id, player_name FROM stg_pgs
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY player_id ORDER BY game_date DESC, game_id DESC
            ) = 1
        ),
        actuals AS (
            SELECT game_id, player_id, shots_on_goal AS actual_sog
            FROM stg_pgs WHERE game_state = 'OFF'
        ),
        odds_raw AS (
            SELECT * FROM read_parquet('{odds}')
        ),
        odds_latest AS (
            SELECT * FROM odds_raw
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY event_id ORDER BY partition_date DESC, s3_key DESC
            ) = 1
        ),
        bk AS (
            SELECT event_id,
                   json_extract_string(payload, '$.home_team') AS home_team_name,
                   json_extract_string(payload, '$.away_team') AS away_team_name,
                   CAST(json_extract_string(payload, '$.data.commence_time') AS TIMESTAMP)
                       AS commence_time,
                   unnest(CAST(json_extract(payload, '$.data.bookmakers') AS JSON[])) AS b
            FROM odds_latest
        ),
        mk AS (
            SELECT event_id, home_team_name, away_team_name, commence_time,
                   json_extract_string(b, '$.key') AS bookmaker_key,
                   unnest(CAST(json_extract(b, '$.markets') AS JSON[])) AS m
            FROM bk
        ),
        oc AS (
            SELECT event_id, home_team_name, away_team_name, commence_time, bookmaker_key,
                   CAST(json_extract_string(m, '$.last_update') AS TIMESTAMP)
                       AS line_last_update,
                   unnest(CAST(json_extract(m, '$.outcomes') AS JSON[])) AS o
            FROM mk
            WHERE json_extract_string(m, '$.key') = 'player_shots_on_goal'
        ),
        stg_odds AS (
            SELECT event_id, home_team_name, away_team_name, commence_time,
                   bookmaker_key, line_last_update,
                   json_extract_string(o, '$.name') AS bet_type,
                   json_extract_string(o, '$.description') AS odds_player_name,
                   CAST(json_extract(o, '$.point') AS DOUBLE) AS line_value
            FROM oc
            WHERE json_extract_string(o, '$.description') IS NOT NULL
        ),
        odds_names AS (
            SELECT DISTINCT odds_player_name FROM stg_odds
        ),
        s1 AS (
            SELECT n.odds_player_name, r.player_id, r.player_name,
                   1.00 AS match_confidence
            FROM odds_names n JOIN dim_player r
              ON upper(trim(n.odds_player_name)) = upper(trim(r.player_name))
        ),
        s2 AS (
            SELECT n.odds_player_name, r.player_id, r.player_name,
                   0.95 AS match_confidence
            FROM odds_names n JOIN dim_player r
              ON {_fold('n.odds_player_name')} = {_fold('r.player_name')}
            WHERE n.odds_player_name NOT IN (SELECT odds_player_name FROM s1)
        ),
        s3 AS (
            SELECT odds_player_name, player_id, player_name, 0.85 AS match_confidence
            FROM (
                SELECT n.odds_player_name, r.player_id, r.player_name
                FROM odds_names n JOIN dim_player r
                  ON {_key3('n.odds_player_name')} = {_key3('r.player_name')}
                WHERE n.odds_player_name NOT IN (SELECT odds_player_name FROM s1)
                  AND n.odds_player_name NOT IN (SELECT odds_player_name FROM s2)
            )
            QUALIFY COUNT(*) OVER (PARTITION BY odds_player_name) = 1
        ),
        xw AS (
            SELECT odds_player_name, player_id FROM (
                SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
            )
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY odds_player_name
                ORDER BY match_confidence DESC, player_name ASC
            ) = 1
        ),
        best AS (
            SELECT * FROM stg_odds
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY event_id, odds_player_name, bet_type
                ORDER BY CASE bookmaker_key
                           WHEN 'draftkings' THEN 1 WHEN 'fanduel' THEN 2
                           WHEN 'betmgm' THEN 3 WHEN 'caesars' THEN 4
                           ELSE 9 END ASC,
                         line_last_update DESC, bookmaker_key ASC
            ) = 1
        ),
        pivoted AS (
            SELECT event_id, odds_player_name, home_team_name, away_team_name,
                   commence_time,
                   MAX(CASE WHEN bet_type = 'Over' THEN line_value END) AS line_value
            FROM best
            GROUP BY 1, 2, 3, 4, 5
        ),
        with_game AS (
            SELECT p.*, g.game_id, g.game_state
            FROM pivoted p
            LEFT JOIN stg_games g
              ON CAST(p.commence_time AS DATE) = g.game_date
             AND p.home_team_name = g.home_team_name
        ),
        classified AS (
            SELECT w.line_value, a.actual_sog,
                   CASE WHEN x.player_id IS NULL THEN 'unmatched'
                        WHEN w.game_state IS NULL OR w.game_state <> 'OFF' THEN 'pending'
                        WHEN a.actual_sog IS NULL THEN 'pending'
                        WHEN a.actual_sog > w.line_value THEN 'over'
                        WHEN a.actual_sog < w.line_value THEN 'under'
                        ELSE 'push' END AS outcome
            FROM with_game w
            LEFT JOIN xw x ON w.odds_player_name = x.odds_player_name
            LEFT JOIN actuals a
              ON w.game_id = a.game_id AND x.player_id = a.player_id
        )
        SELECT line_value,
               CAST(COUNT(CASE WHEN outcome = 'over' THEN 1 END) AS BIGINT) AS n_over,
               'by_line' AS analysis_type,
               CAST(COUNT(CASE WHEN outcome = 'under' THEN 1 END) AS BIGINT) AS n_under,
               CAST(COUNT(CASE WHEN outcome = 'push' THEN 1 END) AS BIGINT) AS n_push,
               CASE WHEN COUNT(CASE WHEN outcome <> 'push' THEN 1 END) > 0
                    THEN CAST(COUNT(CASE WHEN outcome = 'over' THEN 1 END) AS DOUBLE)
                         / COUNT(CASE WHEN outcome <> 'push' THEN 1 END)
                    ELSE NULL END AS over_hit_rate,
               ROUND(AVG(actual_sog), 2) AS avg_actual_sog,
               ROUND(AVG(line_value), 2) AS avg_line,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM classified
        WHERE outcome IN ('over', 'under', 'push')
        GROUP BY line_value
        HAVING COUNT(*) >= 5
    """


@query(
    "nhl_pipeline_e2e",
    covers="S6,P1-P6,F1-F4,J1-J9,A1-A9,W1-W6,U1",
    oracle=_oracle(),
)
def nhl_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full model DAG end-to-end; returns rpt_sog_props_performance.

    sf_dir is unused — inputs are the committed bronze fixture parquet
    files (the NHL API shapes from FIXTURES.md), which is the point: this
    exercises the nested-JSON parse → flatten → dedup → entity-resolution →
    report chain the reference runs daily, and the oracle above re-derives
    the same report independently in DuckDB over the same files.
    """
    from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline

    bronze = {
        name: spark.read.parquet(os.path.join(BRONZE_DIR, name))
        for name in ("game_boxscore", "game_pbp", "schedule", "odds_player_props")
    }
    result = run_pipeline(spark, bronze)
    return result["rpt_sog_props_performance"].orderBy(F.asc("line_value"))
