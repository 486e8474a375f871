"""Temporal regression validation: current vs previous table version.

Reproduces src/nhl_pipeline/utils/time_travel_validator.py:28-303 +
config/data_validation.yml thresholds: a table fails validation when its
row count moved more than ±50% or any column's null fraction moved more
than ±5 percentage points versus the previous version. One aggregate pass
per version — no collect loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROW_COUNT_TOLERANCE = 0.50  # ±50% (data_validation.yml:15)
NULL_PCT_TOLERANCE = 0.05  # ±5 percentage points (data_validation.yml:16)


@dataclass(frozen=True)
class TableDiff:
    rows_current: int
    rows_previous: int
    row_change_pct: float | None
    null_pct_changes: dict[str, float]
    passed: bool
    reasons: tuple[str, ...]


def _profile(df: DataFrame) -> tuple[int, dict[str, float]]:
    """(row_count, null fraction per column) in one aggregate."""
    cols = df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols],
    ).first()
    n = agg["_n"]
    return n, {c: (agg[c] / n if n else 0.0) for c in cols}


def diff_versions(current: DataFrame, previous: DataFrame) -> TableDiff:
    n_cur, nulls_cur = _profile(current)
    n_prev, nulls_prev = _profile(previous)
    reasons: list[str] = []

    change = None
    if n_prev > 0:
        change = (n_cur - n_prev) / n_prev
        if abs(change) > ROW_COUNT_TOLERANCE:
            reasons.append(
                f"row count changed {change:+.1%} (tolerance ±{ROW_COUNT_TOLERANCE:.0%})"
            )
    elif n_cur > 0:
        reasons.append("previous version was empty")

    null_changes: dict[str, float] = {}
    for c in set(nulls_cur) & set(nulls_prev):
        delta = nulls_cur[c] - nulls_prev[c]
        null_changes[c] = delta
        if abs(delta) > NULL_PCT_TOLERANCE:
            reasons.append(
                f"null fraction of {c} moved {delta:+.1%} (tolerance ±{NULL_PCT_TOLERANCE:.0%})"
            )

    return TableDiff(
        rows_current=n_cur,
        rows_previous=n_prev,
        row_change_pct=change,
        null_pct_changes=null_changes,
        passed=not reasons,
        reasons=tuple(reasons),
    )
