"""Near-duplicate detection operators: shingling, MinHash+LSH, SimHash.

All portable-deterministic: hashes are md5 strings (identical in every
engine), MinHash takes the lexicographic MIN of seeded md5s, SimHash derives
bits from md5 hex nibbles. No engine-specific hash functions, no Python in
the hot path — everything is Spark higher-order array functions over a
tokens column, so the per-document work is JVM-vectorized and the only
shuffles are the candidate-pair joins.

Scale design (100 TB posture):
- shingle→explode→equi-join is the exact-jaccard path; its join fan-out is
  bounded by shingle frequency — at scale, drop top-frequency shingles
  (stop-shingles) before the join, exactly like skew salting.
- MinHash+LSH replaces the all-pairs comparison with b band-bucket
  equi-joins (b*r = k): only same-bucket docs meet, so cost tracks true
  near-dup density instead of n².
- SimHash gives a single 16-bit bucket per doc: one groupBy, no join, for
  coarse near-dup clustering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- shingles


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a tokens array.

    Guard: docs with < n tokens get an empty array (Spark's sequence(1, k)
    DESCENDS when k < 1, unlike SQL generate_series — do not remove the
    WHEN)."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(toks_expr: str, n: int = 3) -> str:
    """DuckDB fragment producing the same distinct n-gram shingle list."""
    return (
        f"list_distinct(list_transform(generate_series(1, len({toks_expr}) - {n - 1}),"
        f" i -> array_to_string(list_slice({toks_expr}, i, i + {n - 1}), ' ')))"
    )


# ---------------------------------------------------------------- minhash


def minhash_signature(shingles_col: str, k: int = 12) -> Column:
    """k-element MinHash signature: per seed, the lexicographic min of
    md5('<seed>|' || shingle). String-min MinHash is engine-portable and
    preserves the Jaccard-estimation property (any uniform hash works).

    Built via F.expr with a UNIQUE lambda variable per seed: repeating
    python-lambda higher-order functions inside one array() makes Spark's
    sibling lambda variables collide and silently return wrong values
    (caught by the sf0.1 oracle sweep — the per-seed mins weren't mins).
    Takes a column NAME so the expression is plain SQL text.
    """
    mins = ", ".join(
        f"array_min(transform({shingles_col}, s{i} -> md5(concat('{i}|', s{i}))))"
        for i in range(k)
    )
    return F.expr(f"array({mins})")


def minhash_signature_sql(shingles_expr: str, k: int = 12) -> str:
    mins = ", ".join(
        f"list_min(list_transform({shingles_expr}, s -> md5('{seed}|' || s)))"
        for seed in range(k)
    )
    return f"[{mins}]"


def lsh_band_keys(sig_col: Column, bands: int, rows: int) -> Column:
    """Array of `bands` bucket keys; docs sharing any key are candidates.
    Key = md5 of the band's signature slice."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.element_at(sig_col, b * rows + r + 1) for r in range(rows)]
                )
            )
            for b in range(bands)
        ]
    )


def lsh_band_keys_sql(sig_expr: str, bands: int, rows: int) -> str:
    keys = ", ".join(
        "md5(" + " || '|' || ".join(f"{sig_expr}[{b * rows + r + 1}]" for r in range(rows)) + ")"
        for b in range(bands)
    )
    return f"[{keys}]"


# ---------------------------------------------------------------- simhash

_HEX = "0123456789abcdef"


def simhash(tokens_col: str, bits: int = 16) -> Column:
    """bits-bit SimHash over a tokens array column (by name).

    Bit b of each token's md5 is nibble (hex char) b//4, bit b%4. Sum the
    ±1 contributions across tokens; bit is 1 where the sum is positive.
    Pure integer/string ops — identical in any engine. Built as SQL text
    with unique lambda variables per bit (see minhash_signature for the
    sibling-lambda collision this avoids).
    """
    terms = []
    for b in range(bits):
        pos, div = b // 4 + 1, 2 ** (b % 4)
        bit = (
            f"CAST(floor((instr('{_HEX}', substring(md5(t{b}), {pos}, 1)) - 1)"
            f" / {div}) AS BIGINT) % 2"
        )
        s = (
            f"aggregate({tokens_col}, CAST(0 AS BIGINT),"
            f" (a{b}, t{b}) -> a{b} + ({bit}) * 2 - 1)"
        )
        terms.append(f"CASE WHEN ({s}) > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END")
    return F.expr("(" + " + ".join(terms) + ")")


def simhash_sql(toks_expr: str, bits: int = 16) -> str:
    md5s = f"list_transform({toks_expr}, t -> md5(t))"
    terms = []
    for b in range(bits):
        pos, div = b // 4 + 1, 2 ** (b % 4)
        bit = (
            f"(CAST(floor((strpos('{_HEX}', h[{pos}]) - 1) / {div}) AS BIGINT) % 2)"
        )
        s = f"list_sum(list_transform({md5s}, h -> {bit} * 2 - 1))"
        terms.append(f"CASE WHEN {s} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


# ------------------------------------------------------------ exact dedup


def exact_dedup_keep_min(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the smallest id.
    One hash-aggregate shuffle on the fingerprint — the 100 TB-safe shape
    (no window, no sort)."""
    return (
        df.select(key.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(f"keep_{id_col}"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
