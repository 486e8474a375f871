"""Helpers for building the DuckDB oracle SQL strings.

Centralizes the parity idioms (decimal-exact sums, bigint counts) so every
query's oracle is built from the same vetted fragments.
"""

from __future__ import annotations


def dsum_expr(expr: str, scale: int = 6) -> str:
    """Order-independent SUM over a double expression, as DOUBLE (no alias).

    ``scale`` must be ≥ the expression's true decimal scale so the cast is
    exact (see functions.scalars.dec)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def dsum(expr: str, alias: str, scale: int = 6) -> str:
    """Order-independent SUM over a double expression, emitted as DOUBLE."""
    return f"{dsum_expr(expr, scale)} AS {alias}"


def davg(expr: str, alias: str, scale: int = 6) -> str:
    """Order-independent AVG as exact-decimal SUM / COUNT(*), as DOUBLE."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*) AS {alias}"


def bcount(alias: str, filter_expr: str | None = None) -> str:
    """COUNT(*) (optionally filtered) pinned to BIGINT (DuckDB COUNT is already
    BIGINT; the cast also guards conditional-sum variants)."""
    inner = f"CASE WHEN {filter_expr} THEN 1 END" if filter_expr else "*"
    return f"CAST(COUNT({inner}) AS BIGINT) AS {alias}"


def bsum(expr: str, alias: str) -> str:
    """SUM over an integer expression pinned to BIGINT (DuckDB sums ints to
    HUGEINT, which would break schema parity)."""
    return f"CAST(SUM({expr}) AS BIGINT) AS {alias}"
