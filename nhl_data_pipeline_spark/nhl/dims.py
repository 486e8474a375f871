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


def dim_date(
    spark: SparkSession,
    start: str = "2020-01-01",
    days: int = 2500,
    game_dates: DataFrame | None = None,
    today: str = "2024-11-15",
) -> DataFrame:
    """Generated date spine at full reference-schema parity
    (dim_date.sql:12-120). Snowflake GENERATOR/SEQ4 → spark.range; the
    DAYOFWEEK 0=Sunday base is preserved via sunday_zero_dow.

    ``date_key`` is the DATE itself (dim_date.sql:43 — the facts'
    relationship tests join on it). ``game_dates`` feeds the
    is_game_day/games_on_date indicators (dim_date.sql:31-38 counts
    bronze boxscore snapshots per gameDate; our pipeline passes
    stg_games, the deduped equivalent — one row per game); omitted →
    every date reads as a non-game day, the same as an empty bronze.
    ``today`` is injected, never CURRENT_DATE (SURVEY §7.3.4), so the
    is_today/relative flags are reproducible; nhl_season is NULL in the
    July–September off-season (dim_date.sql:62-73) while season_code
    (our pre-existing non-null variant) is kept alongside for engine
    queries that want a total season mapping.
    """
    spine = spark.range(0, days)
    d = F.date_add(F.lit(start).cast("date"), F.col("id").cast("int"))
    dow = sunday_zero_dow(d)
    td = F.lit(today).cast("date")
    mo = F.month(d)
    out = spine.select(
        d.alias("date_key"),
        d.alias("date_day"),
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.dayofmonth(d).alias("day_of_month"),
        dow.alias("day_of_week"),
        F.dayofyear(d).alias("day_of_year"),
        F.weekofyear(d).alias("week_of_year"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "MMM").alias("month_abbrev"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "EEE").alias("day_abbrev"),
        # NULL off-season Jul-Sep (dim_date.sql:62-73)
        F.when(mo.isin(7, 8, 9), F.lit(None).cast("int"))
        .otherwise(nhl_season_code(d))
        .alias("nhl_season"),
        F.when(mo.between(10, 12), "Early Season")
        .when(mo.between(1, 2), "Mid Season")
        .when(mo.between(3, 4), "Late Season")
        .when(mo.between(5, 6), "Playoffs")
        .when(mo.between(7, 9), "Off Season")
        .otherwise("Unknown")
        .alias("season_phase"),
        dow.isin(0, 6).alias("is_weekend"),
        (d == td).alias("is_today"),
        (d == F.date_sub(td, 1)).alias("is_yesterday"),
        (d == F.date_add(td, 1)).alias("is_tomorrow"),
        ((d >= F.date_sub(td, 7)) & (d <= td)).alias("is_last_7_days"),
        ((d >= F.date_sub(td, 30)) & (d <= td)).alias("is_last_30_days"),
        (
            (F.year(d) == F.year(td)) & (F.month(d) == F.month(td))
        ).alias("is_current_month"),
        nhl_season_code(d).alias("season_code"),
        # NHL regular season months Oct-Apr (dim_date.sql:84-110 flags family)
        F.month(d).isin(10, 11, 12, 1, 2, 3, 4).alias("is_hockey_season"),
    )
    if game_dates is not None:
        gd = game_dates.groupBy(
            F.col("game_date").alias("date_key")
        ).agg(F.count(F.lit(1)).cast("int").alias("_games"))
        out = out.join(F.broadcast(gd), "date_key", "left")
    else:
        out = out.withColumn("_games", F.lit(None).cast("int"))
    return out.select(
        "*",
        F.col("_games").isNotNull().alias("is_game_day"),
        F.coalesce(F.col("_games"), F.lit(0)).alias("games_on_date"),
    ).drop("_games")


def dim_team(stg_games: DataFrame) -> DataFrame:
    """Sparse team dim: DISTINCT home ∪ away teams observed in games
    (dim_team.sql:11-30); full name via CONCAT(place, ' ', common)
    (:38), conference/division placeholders (:40-41 — reference TODO,
    kept NULL-typed for schema parity) and the NHL-CDN logo URLs
    constructed from the abbrev (:44-46)."""
    home = stg_games.select(
        F.col("home_team_id").alias("team_id"),
        F.col("home_team_abbrev").alias("team_abbrev"),
        F.col("home_team_place").alias("place_name"),
        F.col("home_team_common").alias("common_name"),
    )
    away = stg_games.select(
        F.col("away_team_id").alias("team_id"),
        F.col("away_team_abbrev").alias("team_abbrev"),
        F.col("away_team_place").alias("place_name"),
        F.col("away_team_common").alias("common_name"),
    )
    logo = lambda suffix: F.concat(  # noqa: E731
        F.lit("https://assets.nhle.com/logos/nhl/svg/"),
        F.coalesce(F.col("team_abbrev"), F.lit("")),
        F.lit(suffix),
    )
    return (
        home.union(away)
        .distinct()
        .filter(F.col("team_id").isNotNull())
        .select(
            "team_id",
            "team_abbrev",
            "place_name",
            "common_name",
            F.concat_ws(" ", "place_name", "common_name").alias("team_name"),
            F.lit(None).cast("string").alias("conference"),
            F.lit(None).cast("string").alias("division"),
            logo("_light.svg").alias("logo_url_light"),
            logo("_dark.svg").alias("logo_url_dark"),
        )
    )


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
