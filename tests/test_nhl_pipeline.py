"""End-to-end tests of the NHL model DAG over deterministic fixtures.

Covers the reference's documented invariants (SURVEY §1.4): latest-snapshot
wins, completed-games filter placement, null-player drops, crosswalk match
classes, over/under/push/pending/unmatched outcomes, and the dbt-style
quality suite.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.nhl import fixtures
from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline
from nhl_data_pipeline_spark.nhl.quality import run_standard_suite


@pytest.fixture(scope="session")
def bronze(spark):
    return {
        "game_boxscore": fixtures.boxscore_snapshots(spark),
        "game_pbp": fixtures.pbp_snapshots(spark),
        "schedule": fixtures.schedule_snapshots(spark),
        "odds_player_props": fixtures.odds_snapshots(spark),
    }


@pytest.fixture(scope="session")
def models(spark, bronze, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    return run_pipeline(spark, bronze, warehouse_dir=wh).models


def test_latest_snapshot_wins(spark, bronze, models):
    # Bronze keeps every snapshot (append-only, duplicate-tolerant)…
    raw_counts = (
        bronze["game_boxscore"].groupBy("game_id").count().filter("count > 1").count()
    )
    assert raw_counts > 0, "fixture must contain multi-snapshot games"
    # …staging keeps exactly one row per game, from the max partition_date.
    sg = models["stg_games"]
    assert sg.groupBy("game_id").count().filter("count > 1").count() == 0
    multi = (
        bronze["game_boxscore"].groupBy("game_id")
        .agg(F.max("partition_date").alias("max_pd"), F.count("*").alias("n"))
        .filter("n > 1")
    )
    joined = sg.join(multi, "game_id").filter(F.col("partition_date") != F.col("max_pd"))
    assert joined.count() == 0


def test_completed_filter_in_silver_not_staging(models):
    states = {r["game_state"] for r in models["stg_games"].select("game_state").distinct().collect()}
    assert states == {"OFF", "LIVE", "FUT"}  # staging keeps all states
    assert models["fact_game_results"].filter("game_id IS NULL").count() == 0
    n_off = models["stg_games"].filter("game_state = 'OFF'").count()
    assert models["fact_game_results"].count() == n_off


def test_null_player_rows_dropped(models):
    assert models["stg_player_game_stats"].filter("player_id IS NULL").count() == 0
    assert models["stg_player_game_stats"].count() > 0


def test_team_game_stats_grain_and_derivations(models):
    ftgs = models["fact_team_game_stats"]
    # two rows (home+away) per completed game
    per_game = ftgs.groupBy("game_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_game] == [2]
    # goals_for of one side == goals_against of the other
    bad = (
        ftgs.alias("h")
        .join(ftgs.alias("a"), (F.col("h.game_id") == F.col("a.game_id")) & (F.col("h.home_away") == F.lit("home")) & (F.col("a.home_away") == F.lit("away")))
        .filter(F.col("h.goals_for") != F.col("a.goals_against"))
        .count()
    )
    assert bad == 0


def test_shot_events_filtered_and_coalesced(models):
    fse = models["fact_shot_events"]
    kinds = {r["event_type"] for r in fse.select("event_type").distinct().collect()}
    assert kinds <= {"shot-on-goal", "goal", "missed-shot"}
    assert fse.filter("player_id IS NULL").count() == 0  # COALESCE worked
    assert fse.filter("shot_result = 'goal' AND is_goal = 0").count() == 0


def test_crosswalk_match_classes(models):
    xw = {r["odds_player_name"]: r for r in models["stg_player_name_crosswalk"].collect()}
    assert xw["JT Miller"]["player_name"] == "J.T. Miller"
    assert xw["JT Miller"]["match_strategy"] == "initial_last"
    assert xw["Léon Draisaitl"]["player_name"] == "Leon Draisaitl"
    assert xw["Léon Draisaitl"]["match_strategy"] == "accent_normalized"
    assert xw["TIM STUTZLE"]["player_name"] == "Tim Stutzle"
    assert xw["TIM STUTZLE"]["match_strategy"] == "exact"  # case-insensitive exact
    assert "Nonexistent Player" not in xw


def test_sog_props_outcomes(models):
    props = models["fact_player_sog_props_v2"]
    outcomes = {r["outcome"] for r in props.select("outcome").distinct().collect()}
    assert "over" in outcomes and "under" in outcomes
    assert "pending" in outcomes  # FUT game lines
    assert "unmatched" in outcomes  # Nonexistent Player
    # one line per (event, player)
    assert (
        props.groupBy("event_id", "odds_player_name").count().filter("count > 1").count()
        == 0
    )
    # implied probability within (0, 1) where odds exist
    bad_prob = props.filter(
        F.col("over_implied_prob").isNotNull()
        & ((F.col("over_implied_prob") <= 0) | (F.col("over_implied_prob") >= 1))
    ).count()
    assert bad_prob == 0
    # game_date rides the ODDS side (reference bronze partition
    # semantics): non-null on every row, including props whose game
    # never resolves against stg_games
    assert props.filter(F.col("game_date").isNull()).count() == 0


def test_sog_props_game_date_survives_unresolved_game(spark, models):
    """A prop for a game ABSENT from stg_games (odds land before the
    schedule snapshot) stays 'pending' with a non-null game_date — the
    reference sources game_date from the odds feed, not the games join,
    and its dbt suite asserts not_null(game_date) on this model."""
    from nhl_data_pipeline_spark.nhl.odds import fact_player_sog_props_v2

    stg_odds = models["stg_odds_player_props"]
    future = stg_odds.withColumn(
        "commence_time",
        F.col("commence_time") + F.expr("INTERVAL 365 DAYS"),
    ).withColumn("game_date", F.to_date("commence_time"))
    out = fact_player_sog_props_v2(
        future,
        models["stg_player_name_crosswalk"],
        models["fact_player_game_stats"],
        models["stg_games"],
    )
    rows = out.select("game_id", "game_date", "outcome").collect()
    assert len(rows) > 0
    assert all(r["game_id"] is None for r in rows)  # no game resolves
    assert all(r["game_date"] is not None for r in rows)
    assert {r["outcome"] for r in rows} <= {"pending", "unmatched"}


def test_rolling_metrics_shapes(models):
    tsm = models["team_shot_metrics"].filter("games_played_in_season >= 3")
    # a 3-game average can never exceed the running max of the inputs
    bad = tsm.filter(F.col("shots_against_3game_avg") > 100).count()
    assert bad == 0
    assert models["player_shot_metrics"].count() > 0
    assert models["team_shots_against_by_position"].count() > 0
    assert models["team_shot_locations"].count() > 0
    assert models["player_shot_locations"].count() > 0


def test_team_shot_metrics_regular_season_only(spark, models):
    """team_shot_metrics.sql:26 filters `WHERE game_type = 2` BEFORE the
    windows; fixtures are all regular season, so inject a playoff row and
    assert it neither appears nor shifts games_played_in_season."""
    from nhl_data_pipeline_spark.nhl import metrics

    ftgs = models["fact_team_game_stats"]
    one = ftgs.orderBy("team_id", "game_date", "game_id").limit(1)
    playoff = (
        one.withColumn("game_type", F.lit(3))
        .withColumn("game_id", F.col("game_id") + 9_000_000)
        .withColumn("game_date", F.date_sub(F.col("game_date"), 30))
    )
    base = metrics.team_shot_metrics(ftgs)
    spiked = metrics.team_shot_metrics(ftgs.unionByName(playoff))
    assert spiked.count() == base.count()
    # the earlier playoff game must not have bumped the season numbering
    assert (
        spiked.groupBy().max("games_played_in_season").first()[0]
        == base.groupBy().max("games_played_in_season").first()[0]
    )


def test_bruins_next_opponent(models):
    rows = models["bruins_next_opponent"].collect()
    assert len(rows) == 1
    assert rows[0]["opponent_name"] is not None


def test_quality_suite_green(models):
    results = run_standard_suite(models)
    failures = [str(r) for r in results if not r.passed]
    assert not failures, f"quality checks failed: {failures}"
    assert len(results) >= 18


def test_reference_dbt_suite_green(models, bronze):
    """The reference's FULL declared dbt test suite (bronze + staging +
    silver schema.yml, 233 instances) transcribed and run over the
    engine's model DAG: every runnable instance green, ≥54 of them (the
    `.context/DECISIONS.md:395` baseline), skips recorded explicitly."""
    from nhl_data_pipeline_spark.nhl.quality_suite import (
        SKIPPED,
        run_reference_suite,
        suite_counts,
    )

    results = run_reference_suite(models, bronze)
    failures = [str(r) for r in results if not r.passed]
    assert not failures, f"reference dbt checks failed: {failures}"
    counts = suite_counts()
    assert len(results) == counts["runnable"]
    # well past the reference's own "54 passing tests" baseline
    assert len(results) >= 54
    assert len(SKIPPED) == counts["skipped"] == 3


def test_reference_dbt_suite_counts_match_yaml():
    """The transcription is COMPLETE: runnable+skipped equals the number
    of test instances the reference's three schema.yml files declare
    (counted from the YAMLs themselves when the reference tree is
    available)."""
    import pytest as _pytest

    from nhl_data_pipeline_spark.nhl.quality_suite import suite_counts

    ref = Path("/root/reference/dbt_nhl/models")
    if not ref.exists():
        _pytest.skip("reference tree not available")
    yaml = _pytest.importorskip("yaml")
    declared = 0
    for layer in ("bronze", "staging", "silver"):
        doc = yaml.safe_load((ref / layer / "schema.yml").read_text())
        for m in doc.get("models", []):
            declared += len(m.get("tests") or [])
            for c in m.get("columns") or []:
                declared += len(c.get("tests") or [])
    assert suite_counts()["reference_declared"] == declared == 233


def test_analyst_sql_corpus_runs(spark, models):
    """SURVEY §3.2: ad-hoc analyst SQL must run via spark.sql over the
    registered model views (dialect-adjusted analysis queries)."""
    leaders = spark.sql(
        """
        SELECT player_name, SUM(goals) AS goals
        FROM fact_player_game_stats
        GROUP BY player_name
        ORDER BY goals DESC, player_name
        LIMIT 5
        """
    ).collect()
    assert len(leaders) == 5
    streak = spark.sql(
        """
        SELECT t.team_id, t.game_date, t.shots_for
        FROM fact_team_game_stats t
        WHERE (t.team_id, t.game_date) IN (
            SELECT team_id, MAX(game_date) FROM fact_team_game_stats GROUP BY team_id
        )
        """
    ).collect()
    assert len(streak) > 0


def test_full_analysis_corpus_runs(spark, models):
    """SURVEY §3.2 acceptance: every analyst query family executes via
    spark.sql over the registered views and returns a sane shape."""
    from nhl_data_pipeline_spark.nhl.analysis_corpus import run_corpus

    results = {name: df.collect() for name, df in run_corpus(spark).items()}
    assert set(results) >= {
        "latest_team_game", "shot_volume_leaders", "shot_efficiency",
        "rolling_trends", "hot_streaks", "shot_differential", "home_vs_away",
        "ml_features_recent", "crosswalk_quality", "unmatched_odds_names",
        "betting_performance", "top_line_beaters", "daily_over_trend",
    }
    assert len(results["latest_team_game"]) == 10  # one row per team
    assert len(results["home_vs_away"]) > 0
    assert [r["odds_player_name"] for r in results["unmatched_odds_names"]] == [
        "Nonexistent Player"
    ]
    assert len(results["betting_performance"]) > 0
    strategies = {r["match_strategy"] for r in results["crosswalk_quality"]}
    assert strategies == {"exact", "accent_normalized", "initial_last"}


def test_committed_bronze_parquet_matches_fixtures(spark, bronze):
    """The committed bronze_fixtures parquet (consumed by nhl_pipeline_e2e
    and its DuckDB oracle) must stay byte-identical in content to the
    in-memory fixtures — regenerate via tools/gen_bronze_fixtures.py after
    any fixtures.py change."""
    from nhl_data_pipeline_spark.plans.q_nhl import BRONZE_DIR

    for name, df in bronze.items():
        committed = spark.read.parquet(f"{BRONZE_DIR}/{name}")
        assert committed.schema == df.schema, name
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, committed.collect()))
        assert a == b, f"{name}: committed parquet drifted from fixtures"


def test_bruins_filtered_models(models):
    """The four Bruins Tableau extracts are exact filters of their parents
    (bruins_*.sql): same rows, no more, no fewer."""
    tsl = models["team_shot_locations"]
    psl = models["player_shot_locations"]
    fse = models["fact_shot_events"]

    bos_id = (
        models["dim_team"].filter(F.col("team_abbrev") == "BOS").collect()[0]["team_id"]
    )

    # team locations: both perspectives for BOS
    got = models["bruins_team_shot_locations"]
    want = tsl.filter(F.col("team_abbrev") == "BOS")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert {r["perspective"] for r in got.collect()} == {"offense", "defense"}

    # player locations: BOS shooters only
    gotp = models["bruins_player_shot_locations"]
    assert gotp.count() > 0
    assert gotp.filter(F.col("team_id") != bos_id).count() == 0
    assert gotp.count() == psl.filter(F.col("team_id") == bos_id).count()

    # shot events: BOS on either side of the event
    gote = models["bruins_shot_events"]
    wante = fse.filter(
        (F.col("team_id") == bos_id) | (F.col("opponent_team_id") == bos_id)
    )
    assert gote.count() == wante.count() > 0
    assert gote.exceptAll(wante).count() == 0

    # opponent locations: next opponent's OFFENSE rows only (the :21
    # perspective swap), labeled with the opponent's name
    bno = models["bruins_next_opponent"].collect()
    assert len(bno) == 1
    opp_id, opp_name = bno[0]["opponent_team_id"], bno[0]["opponent_name"]
    goto = models["bruins_opponent_shot_locations"]
    rows = goto.collect()
    assert len(rows) > 0
    assert all(r["team_id"] == opp_id for r in rows)
    assert all(r["perspective"] == "offense" for r in rows)
    assert all(r["context_label"] == opp_name for r in rows)
    assert len(rows) == tsl.filter(
        (F.col("team_id") == opp_id) & (F.col("perspective") == "offense")
    ).count()


def test_extract_final_game_ids_first_seen_cap(spark):
    """Selection mirrors gamecenter_selection.py: final states only,
    10-digit ids, dedup, and the cap keeps the EARLIEST-listed games."""
    from nhl_data_pipeline_spark.nhl.staging import extract_final_game_ids

    rows = spark.createDataFrame(
        [
            (2024020103, "OFF", "2024-11-03"),
            (2024020101, "OFF", "2024-11-01"),
            (2024020101, "OFF", "2024-11-02"),  # re-listed: dedup to one
            (2024020102, "LIVE", "2024-11-01"),  # not final
            (999, "OFF", "2024-11-01"),  # not a 10-digit id
            (2024020104, "FINAL", "2024-11-02"),
        ],
        "game_id long, game_state string, game_date string",
    ).withColumn("game_date", F.to_date("game_date"))
    got = [r["game_id"] for r in extract_final_game_ids(rows, max_games=2).collect()]
    # earliest-listed finals win the cap: 101 (11-01) then 104 (11-02)
    assert got == [2024020101, 2024020104]


def test_cli_end_to_end(spark, tmp_path):
    """python -m nhl_data_pipeline_spark.cli collapsed into main():
    builds the DAG from the committed bronze fixtures, passes the
    reference quality gate (exit 0), materializes the warehouse, and
    writes the export manifest."""
    import os

    from nhl_data_pipeline_spark.cli import main
    from nhl_data_pipeline_spark.sources.export import EXPORT_MODELS

    wh = str(tmp_path / "wh")
    ex = str(tmp_path / "csv")
    rc = main(["--warehouse", wh, "--export", ex])
    assert rc == 0
    assert os.path.isdir(os.path.join(wh, "fact_shot_events"))
    for m in EXPORT_MODELS:
        assert os.path.isdir(os.path.join(ex, m)), m


def test_cli_cluster_conf_reaches_session(spark, capsys):
    """--cluster-cores/--dataset-bytes route through session.cluster_conf
    and the derived confs land on the (live) session — the measured
    sizing policy is reachable from the one-command entry point."""
    from nhl_data_pipeline_spark.cli import main
    from nhl_data_pipeline_spark.session import cluster_conf

    want = cluster_conf(total_cores=64, dataset_bytes=100 << 30)
    saved = {k: spark.conf.get(k) for k in want}
    try:
        rc = main(["--skip-quality", "--cluster-cores", "64",
                   "--dataset-bytes", str(100 << 30)])
        assert rc == 0
        out = capsys.readouterr().out
        for k, v in want.items():
            assert spark.conf.get(k) == v, k
            assert f"cluster_conf: {k}={v}" in out
        # the 100 GiB / 128 MiB working-set rule beats 2×cores here
        assert want["spark.sql.shuffle.partitions"] == "800"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_cli_failed_gate_blocks_export(tmp_path, monkeypatch, capsys):
    """A failed quality gate halts before the export step — the same
    contract as the reference's `dbt build` (tests run before the export
    scripts) — unless --export-anyway explicitly overrides."""
    import os

    from nhl_data_pipeline_spark.nhl import quality_suite
    from nhl_data_pipeline_spark.nhl.quality import CheckResult
    from nhl_data_pipeline_spark.cli import main

    monkeypatch.setattr(
        quality_suite,
        "run_reference_suite",
        lambda models, bronze: [
            CheckResult("dim_teams", "not_null(team_id)", False, 3)
        ],
    )
    ex = str(tmp_path / "csv")
    rc = main(["--export", ex])
    assert rc == 1
    assert "export skipped: quality gate failed" in capsys.readouterr().out
    assert not os.path.exists(ex)

    rc = main(["--export", ex, "--export-anyway"])
    assert rc == 1  # exit code still reports the failure
    assert os.path.isdir(ex)
