"""Dimension models (reference: dbt_nhl/models/silver/dim_*.sql).

Sparse dims grown from observed data, never pre-seeded
(.context/DECISIONS.md:185-212). All are tiny by construction — every fact
join against them is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nhl_data_pipeline_spark.functions.scalars import nhl_season_code, sunday_zero_dow


def dim_date(spark: SparkSession, start: str = "2020-01-01", days: int = 2500) -> DataFrame:
    """Generated date spine with calendar flags + NHL season code
    (dim_date.sql:12-114). Snowflake GENERATOR/SEQ4 → spark.range; the
    DAYOFWEEK 0=Sunday base is preserved via sunday_zero_dow."""
    spine = spark.range(0, days)
    d = F.date_add(F.lit(start).cast("date"), F.col("id").cast("int"))
    dow = sunday_zero_dow(d)
    return spine.select(
        F.col("id").alias("date_key"),
        d.alias("date_day"),
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day_of_month"),
        dow.alias("day_of_week"),
        F.dayofyear(d).alias("day_of_year"),
        F.weekofyear(d).alias("week_of_year"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "EEEE").alias("day_name"),
        dow.isin(0, 6).alias("is_weekend"),
        nhl_season_code(d).alias("season_code"),
        # NHL regular season months Oct-Apr (dim_date.sql:84-110 flags family)
        F.month(d).isin(10, 11, 12, 1, 2, 3, 4).alias("is_hockey_season"),
    )


def dim_team(stg_games: DataFrame) -> DataFrame:
    """Sparse team dim: DISTINCT home ∪ away teams observed in games
    (dim_team.sql:11-30); full name via concat (:38-46)."""
    home = stg_games.select(
        F.col("home_team_id").alias("team_id"),
        F.col("home_team_abbrev").alias("team_abbrev"),
        F.col("home_team_name").alias("team_name"),
    )
    away = stg_games.select(
        F.col("away_team_id").alias("team_id"),
        F.col("away_team_abbrev").alias("team_abbrev"),
        F.col("away_team_name").alias("team_name"),
    )
    return home.union(away).distinct()


def dim_player(
    stg_player_game_stats: DataFrame,
    today: str = "2024-11-15",
    dim_team: DataFrame | None = None,
) -> DataFrame:
    """Sparse player dim: latest observed identity per player
    (dim_player.sql:11-79): name/team/position from the most recent game
    (players can change teams mid-season → current team = last seen),
    two-level position hierarchy (position_code + position_type,
    .context/DECISIONS.md:324-352), current season via the injected
    as-of date (reproducibility rule SURVEY §7.3.4).

    ``current_team_abbrev`` matches the reference's output
    (dim_player.sql:75 — the crosswalk and its analyst worksheet read it);
    the reference carries the abbrev inside player-game stats, our staging
    normalizes to team_id, so the abbrev resolves through the (tiny,
    broadcast) dim_team when provided — NULL-typed otherwise, keeping the
    schema stable."""
    w = Window.partitionBy("player_id").orderBy(
        F.desc("game_date"), F.desc("game_id")
    )
    latest = (
        stg_player_game_stats.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "player_id",
            F.col("player_name"),
            F.col("position_code"),
            F.col("position_type"),
            F.col("team_id").alias("current_team_id"),
            F.col("game_date").alias("last_seen_date"),
        )
    )
    if dim_team is not None:
        latest = latest.join(
            F.broadcast(
                dim_team.select(
                    F.col("team_id").alias("current_team_id"),
                    F.col("team_abbrev").alias("current_team_abbrev"),
                )
            ),
            "current_team_id",
            "left",
        )
    else:
        latest = latest.withColumn(
            "current_team_abbrev", F.lit(None).cast("string")
        )
    current_season = nhl_season_code(F.lit(today).cast("date"))
    return latest.withColumn("current_season", current_season)
