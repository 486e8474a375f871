"""Explicit StructTypes for the four raw payload families.

The reference is schema-on-read (Snowflake VARIANT, hand-written cast
paths); Spark-first means declaring the payload schema once and parsing
with from_json, so Catalyst prunes nested fields and every downstream cast
is checked. Field inventory derives from FIXTURES.md, i.e. every payload
path any dbt model reads (citations therein).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _team_struct() -> T.StructType:
    # boxscore homeTeam/awayTeam (dim_team.sql:13-29, fact_game_results.sql:14-35)
    return T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("abbrev", T.StringType()),
            T.StructField("name", T.StructType([T.StructField("default", T.StringType())])),
            T.StructField("placeName", T.StructType([T.StructField("default", T.StringType())])),
            T.StructField("commonName", T.StructType([T.StructField("default", T.StringType())])),
            T.StructField("score", T.IntegerType()),
            T.StructField("sog", T.IntegerType()),
        ]
    )


def player_struct() -> T.StructType:
    # playerByGameStats entries, all 15 stat fields (fact_player_game_stats.sql:11-27)
    return T.StructType(
        [
            T.StructField("playerId", T.LongType()),
            T.StructField("name", T.StructType([T.StructField("default", T.StringType())])),
            T.StructField("position", T.StringType()),
            T.StructField("goals", T.IntegerType()),
            T.StructField("assists", T.IntegerType()),
            T.StructField("points", T.IntegerType()),
            T.StructField("plusMinus", T.IntegerType()),
            T.StructField("sog", T.IntegerType()),
            T.StructField("pim", T.IntegerType()),
            T.StructField("powerPlayGoals", T.IntegerType()),
            T.StructField("shorthandedGoals", T.IntegerType()),
            T.StructField("hits", T.IntegerType()),
            T.StructField("blockedShots", T.IntegerType()),
            T.StructField("giveaways", T.IntegerType()),
            T.StructField("takeaways", T.IntegerType()),
            T.StructField("faceoffWinningPctg", T.DoubleType()),
            T.StructField("toi", T.StringType()),  # 'MM:SS' kept as string
            T.StructField("shifts", T.IntegerType()),
        ]
    )


def boxscore_payload() -> T.StructType:
    sides = T.StructType(
        [
            T.StructField("forwards", T.ArrayType(player_struct())),
            T.StructField("defense", T.ArrayType(player_struct())),
        ]
    )
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("season", T.IntegerType()),
            T.StructField("gameType", T.IntegerType()),
            T.StructField("gameDate", T.StringType()),  # 'YYYY-MM-DD'
            T.StructField("gameState", T.StringType()),
            T.StructField("venue", T.StructType([T.StructField("default", T.StringType())])),
            T.StructField(
                "periodDescriptor",
                T.StructType([T.StructField("number", T.IntegerType())]),
            ),
            T.StructField("homeTeam", _team_struct()),
            T.StructField("awayTeam", _team_struct()),
            T.StructField(
                "playerByGameStats",
                T.StructType(
                    [T.StructField("homeTeam", sides), T.StructField("awayTeam", sides)]
                ),
            ),
        ]
    )


def pbp_payload() -> T.StructType:
    # plays[] (fact_shot_events.sql:14-84)
    details = T.StructType(
        [
            T.StructField("xCoord", T.DoubleType()),
            T.StructField("yCoord", T.DoubleType()),
            T.StructField("shootingPlayerId", T.LongType()),
            T.StructField("scoringPlayerId", T.LongType()),
            T.StructField("goalieInNetId", T.LongType()),
            T.StructField("shotType", T.StringType()),
            T.StructField("reason", T.StringType()),
            T.StructField("eventOwnerTeamId", T.IntegerType()),
            T.StructField("assist1PlayerId", T.LongType()),
            T.StructField("assist2PlayerId", T.LongType()),
            T.StructField("homeScore", T.IntegerType()),
            T.StructField("awayScore", T.IntegerType()),
        ]
    )
    play = T.StructType(
        [
            T.StructField("eventId", T.IntegerType()),
            T.StructField("typeDescKey", T.StringType()),
            T.StructField(
                "periodDescriptor",
                T.StructType(
                    [
                        T.StructField("number", T.IntegerType()),
                        T.StructField("periodType", T.StringType()),
                    ]
                ),
            ),
            T.StructField("timeInPeriod", T.StringType()),
            T.StructField("timeRemaining", T.StringType()),
            T.StructField("details", details),
        ]
    )
    small_team = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("abbrev", T.StringType())]
    )
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("gameDate", T.StringType()),
            T.StructField("season", T.IntegerType()),
            T.StructField("gameType", T.IntegerType()),
            T.StructField("homeTeam", small_team),
            T.StructField("awayTeam", small_team),
            T.StructField("plays", T.ArrayType(play)),
        ]
    )


def schedule_payload() -> T.StructType:
    # gameWeek[] → games[] (bruins_next_opponent.sql:19-33, gamecenter_selection.py:22-48)
    small_team = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("abbrev", T.StringType())]
    )
    game = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("gameState", T.StringType()),
            T.StructField("gameType", T.IntegerType()),
            T.StructField("startTimeUTC", T.StringType()),
            T.StructField("homeTeam", small_team),
            T.StructField("awayTeam", small_team),
        ]
    )
    week_day = T.StructType(
        [
            T.StructField("date", T.StringType()),
            T.StructField("games", T.ArrayType(game)),
        ]
    )
    return T.StructType([T.StructField("gameWeek", T.ArrayType(week_day))])


def odds_payload() -> T.StructType:
    # bookmakers[] → markets[] → outcomes[] (stg_odds_player_props.sql:22-91)
    outcome = T.StructType(
        [
            T.StructField("name", T.StringType()),  # Over | Under
            T.StructField("description", T.StringType()),  # player display name
            T.StructField("point", T.DoubleType()),
            T.StructField("price", T.IntegerType()),  # American odds
        ]
    )
    market = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("last_update", T.StringType()),
            T.StructField("outcomes", T.ArrayType(outcome)),
        ]
    )
    bookmaker = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("markets", T.ArrayType(market)),
        ]
    )
    return T.StructType(
        [
            T.StructField("extracted_at", T.StringType()),
            T.StructField("home_team", T.StringType()),
            T.StructField("away_team", T.StringType()),
            T.StructField(
                "data",
                T.StructType(
                    [
                        T.StructField("commence_time", T.StringType()),
                        T.StructField("bookmakers", T.ArrayType(bookmaker)),
                    ]
                ),
            ),
        ]
    )
