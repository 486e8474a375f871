"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically at runtime; salting is the explicit fallback for the cases
AQE can't fix — skewed aggregation keys feeding a join, or a replicable
small side that is too big to broadcast whole but fine to replicate
n_salts×. The reference never needed this (Snowflake did), but a 100 TB
fact⋈fact join on a power-law key (e.g. star players in shot events) does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across n_salts
    sub-partitions and the small side replicated to match.

    The salt is derived deterministically from the big side's full row hash
    (pmod(hash(*cols), n)), so results are reproducible. Output equals the
    plain join (verified in tests) minus the `salt` plumbing column.

    Only join types that never emit unmatched SMALL-side rows are allowed:
    the small side exists n_salts times, so 'right'/'full' (or right-side
    semi/anti) would emit each unmatched small-side row n_salts times.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would duplicate "
            f"unmatched small-side rows n_salts times"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def top_frequency_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Identify hot keys (for split-plan joins: salted path for hot keys,
    plain path for the long tail — union the two)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(key)
    )
