"""Deterministic synthetic NHL raw-snapshot fixtures.

Generates the four bronze snapshot families as raw JSON strings + envelope
columns (FIXTURES.md §1), with every edge case the reference's models
handle:

- multiple snapshots per game with different (partition_date, s3_key) and
  drifting stats → exercises latest-snapshot-wins dedup (stg_games.sql:32);
- games in OFF / LIVE / FUT states → completed-games filter in silver
  (fact_game_results.sql:83);
- null playerId roster rows (stg_player_game_stats.sql:78);
- pbp non-shot events, null coords, negative xCoord
  (player_shot_locations.sql:32-34);
- odds name-mismatch classes vs roster names: punctuation ("JT Miller" vs
  "J.T. Miller"), accents ("Léon Draisaitl" vs "Leon Draisaitl"), case,
  and an unmatched name (stg_player_name_crosswalk.sql:9-15);
- Over/Under lines incl. a push (actual == line) and pending games.

Everything is seeded — same fixture every run, so tests assert exact rows.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42
SEASON = 20242025

TEAMS = [
    # (id, abbrev, place, common)
    (1, "BOS", "Boston", "Bruins"),
    (2, "TOR", "Toronto", "Maple Leafs"),
    (3, "NYR", "New York", "Rangers"),
    (4, "MTL", "Montréal", "Canadiens"),
    (5, "DET", "Detroit", "Red Wings"),
    (6, "CHI", "Chicago", "Blackhawks"),
    (7, "EDM", "Edmonton", "Oilers"),
    (8, "COL", "Colorado", "Avalanche"),
    # r10 (VERDICT r9 ask #7): ids 9/10 join the league so the reference
    # worksheet's `team_id = 10` statement (team_shot_example_queries.sql
    # §4) selects rows over the fixture lake instead of an empty set.
    (9, "OTT", "Ottawa", "Senators"),
    (10, "WPG", "Winnipeg", "Jets"),
]

# Roster names include the crosswalk's documented mismatch classes.
SPECIAL_PLAYERS = {
    8470001: "J.T. Miller",  # odds feed drops the dots
    8470002: "Leon Draisaitl",  # odds feed adds accents
    8470003: "Tim Stutzle",  # odds feed uses different case
}

POSITIONS = ["C", "L", "R", "D"]
SHOT_TYPES = ["wrist", "slap", "snap", "backhand", "tip-in"]
BOOKMAKERS = [("draftkings", "DraftKings"), ("fanduel", "FanDuel"), ("betmgm", "BetMGM")]

ENVELOPE = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("s3_key", T.StringType()),
        T.StructField("partition_date", T.StringType()),
        T.StructField("game_id", T.LongType()),
    ]
)

ODDS_ENVELOPE = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("s3_key", T.StringType()),
        T.StructField("partition_date", T.StringType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("market", T.StringType()),
        T.StructField("ingest_ts", T.StringType()),
    ]
)


@dataclass
class Game:
    game_id: int
    date: str
    home: tuple
    away: tuple
    state: str  # OFF | LIVE | FUT


def _player_pool(rng: random.Random) -> dict[int, dict]:
    """~88 players: 11 per team, ids stable, positions round-robin."""
    pool: dict[int, dict] = {}
    pid = 8470000
    for team in TEAMS:
        for j in range(11):
            pid += 1
            name = SPECIAL_PLAYERS.get(
                pid, f"{'Alex Max Sam Chris Pat Drew Cole Jake Luke Ryan Matt'.split()[j]}"
                f" {team[3].replace(' ', '')}{j}"
            )
            pool[pid] = {
                "playerId": pid,
                "name": name,
                "team_id": team[0],
                "position": "D" if j >= 7 else POSITIONS[j % 3],
            }
    return pool


def _games() -> list[Game]:
    games = []
    gid = 2024020100
    dates = [f"2024-11-{d:02d}" for d in range(1, 15)]
    # last two: a LIVE game and a FUT game, both involving BOS so the
    # bruins_next_opponent model has a subject. The four OTT/WPG games
    # (r10) are OFF and reuse mid-season dates (a second game that day)
    # so every completed game stays inside the as_of=2024-11-15 window.
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7), (1, 2), (3, 0), (5, 7), (6, 4),
             (0, 4), (1, 5), (2, 6), (3, 7),
             (8, 9), (9, 8), (0, 8), (9, 3),
             (7, 0), (2, 0)]
    date_of = (dates[:12] + [dates[8], dates[9], dates[10], dates[11]]
               + [dates[12], dates[13]])
    for i, (h, a) in enumerate(pairs):
        state = "OFF"
        if i == len(pairs) - 2:
            state = "LIVE"
        if i == len(pairs) - 1:
            state = "FUT"
        games.append(Game(gid + i, date_of[i], TEAMS[h], TEAMS[a], state))
    return games


def _roster(rng: random.Random, pool: dict[int, dict], team_id: int, snapshot: int) -> dict:
    """playerByGameStats side dict; stats drift by snapshot index so the
    latest-snapshot dedup is observable. One forward row has a null
    playerId (scratched/unparsed entry)."""
    members = [p for p in pool.values() if p["team_id"] == team_id]
    fwds, dfs = [], []
    for p in members:
        goals = rng.randint(0, 2) if snapshot > 0 else rng.randint(0, 1)
        assists = rng.randint(0, 2)
        sog = goals + rng.randint(0, 4) + snapshot  # drifts per snapshot
        row = {
            "playerId": p["playerId"],
            "name": {"default": p["name"]},
            "position": p["position"],
            "goals": goals,
            "assists": assists,
            "points": goals + assists,
            "plusMinus": rng.randint(-3, 3),
            "sog": sog,
            "pim": rng.choice([0, 0, 2, 4]),
            "powerPlayGoals": min(goals, rng.randint(0, 1)),
            "shorthandedGoals": 0,
            "hits": rng.randint(0, 6),
            "blockedShots": rng.randint(0, 4),
            "giveaways": rng.randint(0, 3),
            "takeaways": rng.randint(0, 3),
            "faceoffWinningPctg": round(rng.uniform(0, 1), 3),
            "toi": f"{rng.randint(8, 22)}:{rng.randint(0, 59):02d}",
            "shifts": rng.randint(12, 28),
        }
        (dfs if p["position"] == "D" else fwds).append(row)
    # A parse-glitch entry with null playerId — silver must drop it.
    fwds.append({"playerId": None, "name": {"default": "Unknown Skater"},
                 "position": "C", "goals": 0, "assists": 0, "points": 0,
                 "plusMinus": 0, "sog": 0, "pim": 0, "powerPlayGoals": 0,
                 "shorthandedGoals": 0, "hits": 0, "blockedShots": 0,
                 "giveaways": 0, "takeaways": 0, "faceoffWinningPctg": None,
                 "toi": None, "shifts": 0})
    return {"forwards": fwds, "defense": dfs}


def _team_json(team: tuple, score: int, sog: int) -> dict:
    tid, abbrev, place, common = team
    return {
        "id": tid,
        "abbrev": abbrev,
        "name": {"default": f"{place} {common}"},
        "placeName": {"default": place},
        "commonName": {"default": common},
        "score": score,
        "sog": sog,
    }


def boxscore_snapshots(spark: SparkSession) -> DataFrame:
    """game_boxscore_snapshots with 1-3 snapshots per game."""
    rng = random.Random(SEED)
    pool = _player_pool(rng)
    rows = []
    for g in _games():
        n_snaps = 3 if g.game_id % 5 == 0 else (2 if g.game_id % 2 == 0 else 1)
        for snap in range(n_snaps):
            sstats = _roster(random.Random(SEED + g.game_id + snap), pool, g.home[0], snap)
            astats = _roster(random.Random(SEED * 2 + g.game_id + snap), pool, g.away[0], snap)
            home_goals = sum(p["goals"] for p in sstats["forwards"] + sstats["defense"])
            away_goals = sum(p["goals"] for p in astats["forwards"] + astats["defense"])
            period = 3 if home_goals != away_goals else 4  # tie → OT decided it
            if period == 4:
                home_goals += 1  # OT winner
            payload = {
                "id": g.game_id,
                "season": SEASON,
                "gameType": 2,
                "gameDate": g.date,
                "gameState": g.state,
                "venue": {"default": f"{g.home[2]} Arena"},
                "periodDescriptor": {"number": period},
                "homeTeam": _team_json(
                    g.home, home_goals,
                    sum(p["sog"] for p in sstats["forwards"] + sstats["defense"]),
                ),
                "awayTeam": _team_json(
                    g.away, away_goals,
                    sum(p["sog"] for p in astats["forwards"] + astats["defense"]),
                ),
                "playerByGameStats": {"homeTeam": sstats, "awayTeam": astats},
            }
            pdate = g.date if snap == 0 else f"2024-11-{int(g.date[-2:]) + snap:02d}"
            rows.append(
                (
                    json.dumps(payload),
                    f"raw/nhl/game_boxscore/date={pdate}/hour=03/game_id={g.game_id}/"
                    f"snapshot_{pdate.replace('-', '_')}_03.json",
                    pdate,
                    g.game_id,
                )
            )
    return spark.createDataFrame(rows, ENVELOPE).withColumn(
        "partition_date", F.to_date("partition_date")
    )


def pbp_snapshots(spark: SparkSession) -> DataFrame:
    """game_pbp_snapshots: ~45 plays per completed game, mixed event types."""
    rows = []
    for g in _games():
        if g.state == "FUT":
            continue
        rng = random.Random(SEED * 3 + g.game_id)
        pool = _player_pool(random.Random(SEED))
        home_pids = [p["playerId"] for p in pool.values() if p["team_id"] == g.home[0]]
        away_pids = [p["playerId"] for p in pool.values() if p["team_id"] == g.away[0]]
        plays = []
        for ev in range(45):
            kind = rng.choice(
                ["shot-on-goal", "shot-on-goal", "missed-shot", "goal",
                 "faceoff", "hit", "penalty", "blocked-shot"]
            )
            is_home = rng.random() < 0.5
            shooter = rng.choice(home_pids if is_home else away_pids)
            details = {
                "xCoord": None if ev % 15 == 7 else round(rng.uniform(-99, 99), 1),
                "yCoord": None if ev % 15 == 7 else round(rng.uniform(-42, 42), 1),
                "shootingPlayerId": shooter if kind != "goal" else None,
                "scoringPlayerId": shooter if kind == "goal" else None,
                "goalieInNetId": rng.choice(away_pids if is_home else home_pids),
                "shotType": rng.choice(SHOT_TYPES) if kind in ("shot-on-goal", "goal", "missed-shot") else None,
                "reason": "wide" if kind == "missed-shot" else None,
                "eventOwnerTeamId": g.home[0] if is_home else g.away[0],
                "assist1PlayerId": rng.choice(home_pids) if kind == "goal" else None,
                "assist2PlayerId": None,
                "homeScore": rng.randint(0, 4),
                "awayScore": rng.randint(0, 4),
            }
            plays.append(
                {
                    "eventId": ev + 1,
                    "typeDescKey": kind,
                    "periodDescriptor": {"number": min(3, ev // 16 + 1), "periodType": "REG"},
                    "timeInPeriod": f"{rng.randint(0, 19)}:{rng.randint(0, 59):02d}",
                    "timeRemaining": f"{rng.randint(0, 19)}:{rng.randint(0, 59):02d}",
                    "details": details,
                }
            )
        payload = {
            "id": g.game_id,
            "gameDate": g.date,
            "season": SEASON,
            "gameType": 2,
            "homeTeam": {"id": g.home[0], "abbrev": g.home[1]},
            "awayTeam": {"id": g.away[0], "abbrev": g.away[1]},
            "plays": plays,
        }
        rows.append(
            (
                json.dumps(payload),
                f"raw/nhl/game_pbp/date={g.date}/hour=04/game_id={g.game_id}/"
                f"snapshot_{g.date.replace('-', '_')}_04.json",
                g.date,
                g.game_id,
            )
        )
    return spark.createDataFrame(rows, ENVELOPE).withColumn(
        "partition_date", F.to_date("partition_date")
    )


def schedule_snapshots(spark: SparkSession) -> DataFrame:
    """schedule_snapshots: two snapshots (stale + latest), gameWeek[] → games[]."""
    games = _games()
    rows = []
    for snap_i, ingest_ts in enumerate(["2024-11-13 10:00:00", "2024-11-14 10:00:00"]):
        week = {}
        for g in games:
            state = g.state
            if snap_i == 0 and g.state == "LIVE":
                state = "FUT"  # older snapshot: game not started yet
            week.setdefault(g.date, []).append(
                {
                    "id": g.game_id,
                    "gameState": state,
                    "gameType": 2,
                    "startTimeUTC": f"{g.date}T00:00:00Z",
                    "homeTeam": {"id": g.home[0], "abbrev": g.home[1]},
                    "awayTeam": {"id": g.away[0], "abbrev": g.away[1]},
                }
            )
        payload = {
            "gameWeek": [{"date": d, "games": gs} for d, gs in sorted(week.items())]
        }
        rows.append(
            (
                json.dumps(payload),
                f"raw/nhl/schedule/date=2024-11-{13 + snap_i}/hour=10/snapshot.json",
                ingest_ts,
            )
        )
    schema = T.StructType(
        [
            T.StructField("payload", T.StringType()),
            T.StructField("s3_key", T.StringType()),
            T.StructField("ingest_ts", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema).withColumn(
        "ingest_ts", F.to_timestamp("ingest_ts")
    )


def _odds_name(roster_name: str) -> str:
    """Apply the documented odds-feed name corruptions."""
    return {
        "J.T. Miller": "JT Miller",
        "Leon Draisaitl": "Léon Draisaitl",
        "Tim Stutzle": "TIM STUTZLE",
    }.get(roster_name, roster_name)


def odds_snapshots(spark: SparkSession) -> DataFrame:
    """odds_player_props: player_shots_on_goal lines per game, 3 bookmakers,
    Over/Under pairs; includes a guaranteed push line, pending (FUT) games,
    and one unmatched player name."""
    rng = random.Random(SEED * 5)
    pool = _player_pool(random.Random(SEED))
    rows = []
    for g in _games():
        if g.state == "LIVE":
            continue
        event_id = f"ev{g.game_id}"
        home_full = f"{g.home[2]} {g.home[3]}"
        away_full = f"{g.away[2]} {g.away[3]}"
        # prop targets: 4 skaters from each side, by id order for determinism
        pids = sorted(
            [p["playerId"] for p in pool.values() if p["team_id"] in (g.home[0], g.away[0])]
        )[:8]
        names = [_odds_name(pool[p]["name"]) for p in pids]
        if g.game_id % 4 == 0:
            names.append("Nonexistent Player")  # unmatched in roster
        bookmakers = []
        for bi, (bkey, btitle) in enumerate(BOOKMAKERS):
            outcomes = []
            for nm in names:
                line = rng.choice([1.5, 2.5, 2.5, 3.5])
                if nm == names[0]:
                    line = 2.0  # integer line → push is possible
                outcomes.append({"name": "Over", "description": nm, "point": line,
                                 "price": rng.choice([-120, -115, -110, 100, 105])})
                outcomes.append({"name": "Under", "description": nm, "point": line,
                                 "price": rng.choice([-120, -115, -110, 100, 105])})
            bookmakers.append(
                {
                    "key": bkey,
                    "title": btitle,
                    "markets": [
                        {
                            "key": "player_shots_on_goal",
                            "last_update": f"{g.date}T0{bi + 1}:00:00Z",
                            "outcomes": outcomes,
                        }
                    ],
                }
            )
        payload = {
            "extracted_at": f"{g.date}T06:00:00Z",
            "home_team": home_full,
            "away_team": away_full,
            "data": {"commence_time": f"{g.date}T23:00:00Z", "bookmakers": bookmakers},
        }
        rows.append(
            (
                json.dumps(payload),
                f"raw/odds/player_props/date={g.date}/hour=06/event_id={event_id}/snapshot.json",
                g.date,
                event_id,
                "player_shots_on_goal",
                f"{g.date} 06:00:00",
            )
        )
    return spark.createDataFrame(rows, ODDS_ENVELOPE).withColumns(
        {
            "partition_date": F.to_date("partition_date"),
            "ingest_ts": F.to_timestamp("ingest_ts"),
        }
    )
