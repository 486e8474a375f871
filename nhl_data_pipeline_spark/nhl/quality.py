"""Declarative data-quality checks: the dbt schema-test semantics on Spark.

unique / not_null / accepted_values / relationships (FK) /
unique_combination_of_columns — the reference's 54-test suite
(dbt_nhl/models/silver/schema.yml, strategy at .context/DECISIONS.md:355-396)
expressed as data, run in one pass per table where possible.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    table: str
    check: str
    passed: bool
    failing_rows: int

    def __str__(self) -> str:  # pragma: no cover
        status = "PASS" if self.passed else "FAIL"
        return f"{status} {self.table}.{self.check} ({self.failing_rows} failing)"


def not_null(df: DataFrame, table: str, *cols: str) -> list[CheckResult]:
    agg = df.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols]
    ).first()
    return [
        CheckResult(table, f"not_null({c})", agg[c] == 0, agg[c]) for c in cols
    ]


def unique(df: DataFrame, table: str, *cols: str) -> CheckResult:
    """unique / unique_combination_of_columns (silver/schema.yml:207-211)."""
    dup = (
        df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    ).count()
    return CheckResult(table, f"unique({', '.join(cols)})", dup == 0, dup)


def accepted_values(
    df: DataFrame, table: str, col: str, values: list
) -> CheckResult:
    bad = df.filter(~F.col(col).isin(values) & F.col(col).isNotNull()).count()
    return CheckResult(table, f"accepted_values({col})", bad == 0, bad)


def accepted_range(
    df: DataFrame,
    table: str,
    col: str,
    min_value: float,
    max_value: float,
    inclusive: bool = True,
) -> CheckResult:
    """dbt_utils.accepted_range semantics (silver/schema.yml pct checks):
    non-null values must fall inside [min, max] (or the open interval)."""
    c = F.col(col)
    if inclusive:
        bad_cond = (c < min_value) | (c > max_value)
    else:
        bad_cond = (c <= min_value) | (c >= max_value)
    bad = df.filter(c.isNotNull() & bad_cond).count()
    return CheckResult(
        table, f"accepted_range({col},[{min_value},{max_value}])", bad == 0, bad
    )


def relationships(
    child: DataFrame, table: str, col: str, parent: DataFrame, parent_col: str
) -> CheckResult:
    """FK integrity: every non-null child key exists in the parent
    (the 10 relationship tests, silver/schema.yml)."""
    orphans = (
        child.select(F.col(col))
        .filter(F.col(col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .count()
    )
    return CheckResult(table, f"relationships({col}→{parent_col})", orphans == 0, orphans)


POSITION_CODES = ["C", "LW", "RW", "L", "R", "D", "G"]  # silver/schema.yml:108


def run_standard_suite(models: dict[str, DataFrame]) -> list[CheckResult]:
    """The reference's core schema tests over our model DAG."""
    out: list[CheckResult] = []
    fgr = models["fact_game_results"]
    fpgs = models["fact_player_game_stats"]
    ftgs = models["fact_team_game_stats"]
    fse = models["fact_shot_events"]
    dt = models["dim_team"]
    dp = models["dim_player"]

    out += not_null(fgr, "fact_game_results", "game_id", "game_date", "home_team_id")
    out.append(unique(fgr, "fact_game_results", "game_id"))
    out.append(accepted_values(fgr, "fact_game_results", "winning_side", ["home", "away"]))

    out += not_null(fpgs, "fact_player_game_stats", "game_id", "player_id", "team_id")
    out.append(unique(fpgs, "fact_player_game_stats", "game_id", "player_id"))
    out.append(
        accepted_values(fpgs, "fact_player_game_stats", "position_code", POSITION_CODES)
    )
    out.append(accepted_values(fpgs, "fact_player_game_stats", "home_away", ["home", "away"]))
    out.append(relationships(fpgs, "fact_player_game_stats", "player_id", dp, "player_id"))
    out.append(relationships(fpgs, "fact_player_game_stats", "team_id", dt, "team_id"))

    out.append(unique(ftgs, "fact_team_game_stats", "game_id", "team_id"))
    out.append(relationships(ftgs, "fact_team_game_stats", "team_id", dt, "team_id"))

    out.append(unique(fse, "fact_shot_events", "game_id", "event_id"))
    out.append(
        accepted_values(fse, "fact_shot_events", "shot_result", ["goal", "saved", "missed"])
    )
    out.append(relationships(fse, "fact_shot_events", "team_id", dt, "team_id"))

    out.append(unique(dp, "dim_player", "player_id"))
    out.append(unique(dt, "dim_team", "team_id"))
    return out
