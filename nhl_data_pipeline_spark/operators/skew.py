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


_MAX_HOT_KEYS = 10_000  # literal-IN routing predicate stays codegen-sane


def split_plan_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    hot_keys: list | None = None,
    min_count: int | None = None,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Hot/tail split join: rows whose key is HOT take the salted path
    (small side replicated n_salts×, but only its hot rows), the long
    tail joins plain — the composition :func:`top_frequency_keys`'s
    docstring promises. Result equals the plain join row-for-row.

    Why not salt everything: full salting replicates the ENTIRE small
    side n_salts×, an n_salts-fold shuffle/build cost paid for the >99%
    of keys that were never skewed. Splitting replicates only the few
    hot dim rows and leaves the tail's shuffle untouched; the routing
    predicate is a literal IN over ≤ ``_MAX_HOT_KEYS`` keys, evaluated
    in whole-stage codegen at the scan — no extra join, no extra
    exchange on the tail path. Measured trade
    (``bench.py::_skew_join_probe``, 20M fact / 20K dim): with a TINY
    dim, full salting wins (1.8 s vs split's 2.4 s — the split pays a
    second fact scan + union while replicating 20K rows costs nothing);
    the split form is for a LARGE small-side, where n_salts× replication
    dominates and hot-row-only replication is the difference between a
    runnable plan and an OOM. AQE's skew-split is the zero-code
    alternative, but its compressed-size detection misses hot-KEY skew
    entirely (same probe).

    ``hot_keys`` may be passed directly (e.g. from monitoring, or the
    previous batch's census); with ``min_count`` instead, the hot set is
    derived by one aggregate scan of ``big`` — by construction it is
    tiny (keys exceeding min_count occurrences), and the collect is
    guarded at ``_MAX_HOT_KEYS``.

    Join types: the same left-shaped family as :func:`salted_join`
    minus ``cross`` (a cross join has no key to split on). NULL join
    keys never match in these joins; they are routed to the tail path
    explicitly (``isin`` yields NULL for them, and both branches of a
    naive boolean split would drop them) so 'left' outputs keep the
    unmatched null-key rows exactly like a plain join.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"split_plan_join supports {sorted(allowed)}; got {how!r}"
            " (right/full would duplicate unmatched small-side rows;"
            " cross has no join key to split on)"
        )
    if (hot_keys is None) == (min_count is None):
        raise ValueError("pass exactly one of hot_keys / min_count")
    if hot_keys is None:
        rows = (
            top_frequency_keys(big, key, min_count)
            .limit(_MAX_HOT_KEYS + 1)
            .collect()
        )
        if len(rows) > _MAX_HOT_KEYS:
            raise ValueError(
                f"more than {_MAX_HOT_KEYS} keys exceed min_count="
                f"{min_count}; that is not a hot-key skew profile —"
                " raise min_count or salt the whole join"
            )
        hot_keys = [r[0] for r in rows]
    # NULL never equi-matches, so a NULL "hot key" belongs on the tail
    # path (where the explicit isNull() routing already preserves it for
    # left-shaped outputs). It must ALSO be stripped from the IN list:
    # isin([..., None]) evaluates to NULL for every non-member, which
    # would fail BOTH the hot filter and the negated tail filter and
    # silently drop the entire long tail. top_frequency_keys counts the
    # NULL group like any other, so a derived hot set can contain it.
    hot_keys = [k for k in hot_keys if k is not None]
    if len(hot_keys) > _MAX_HOT_KEYS:
        raise ValueError(f"hot_keys exceeds {_MAX_HOT_KEYS}")
    if not hot_keys:
        return big.join(small, key, how)
    k = F.col(key)
    is_hot = k.isin(hot_keys)
    hot_big = big.filter(is_hot)
    tail_big = big.filter(k.isNull() | ~is_hot)
    hot = salted_join(
        hot_big, small.filter(F.col(key).isin(hot_keys)), key,
        n_salts=n_salts, how=how,
    )
    tail = tail_big.join(small, key, how)
    return hot.unionByName(tail)
