"""Line-level boilerplate dedup: strip lines repeated across documents.

The CCNet/RefinedWeb curation stage the doc-level dedup family can't
express: navigation menus, cookie banners, and legal footers repeat across
thousands of pages while the surrounding documents stay unique, so
doc-granularity near-dup passes keep them all. Removing every line that
occurs in ≥ `min_docs` distinct documents kills the boilerplate and keeps
the prose.

Scale shape (100 TB):
1. explode docs to (doc_id, pos, line) — pure codegen, no Python;
2. line frequency = one map-side-combinable groupBy on the line (carry an
   xxhash64 of the line instead of the string to move 8-byte shuffle keys
   when lines are long);
3. the frequent-line set is SMALL by construction (boilerplate ⇒ repeated
   ⇒ few distinct strings), so it broadcast-anti-joins against the
   exploded lines — the corpus-sized side never shuffles for the filter;
4. reassembly is one groupBy(doc_id) with an order-restoring
   sort_array(collect_list(struct(pos, line))) — the only corpus-sized
   shuffle in the plan.

Reference analog: the staging dedup of repeated payload snapshots
(`dbt_nhl/models/staging/stg_games.sql:32` latest-snapshot ROW_NUMBER
rule) works at row grain; this operator generalizes the "same content seen
many times ⇒ keep once / drop" rule to sub-document grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEWLINE = "\n"


def exploded_lines(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, line) — one row per physical line, position-preserving."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), NEWLINE)).alias("pos", "line"),
    )


def frequent_lines(
    lines: DataFrame, min_docs: int, *, id_col: str = "doc_id"
) -> DataFrame:
    """Lines occurring in ≥ min_docs distinct docs (the boilerplate set).

    Blank/whitespace-only lines are excluded: nearly every multi-paragraph
    document contains them, so they'd always cross the threshold and the
    strip would collapse paragraph structure corpus-wide — whitespace is
    not boilerplate."""
    # Filters/aggregates as parsed SQL strings (r12 chatter pass): same
    # expression trees, one py4j round trip each instead of one per node.
    return (
        lines.filter("length(trim(line)) > 0")
        .groupBy("line")
        .agg(F.expr(f"count(DISTINCT {id_col})").alias("n_docs"))
        .filter(f"n_docs >= {int(min_docs)}")
    )


def strip_frequent_lines(
    docs: DataFrame,
    min_docs: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove boilerplate lines; reassemble each doc in original order.

    Returns (id, text, n_lines, n_removed): the cleaned text (empty string
    when every line was boilerplate), the original line count, and how many
    lines were stripped. Deterministic and idempotent given a fixed corpus.
    """
    lines = exploded_lines(docs, id_col=id_col, text_col=text_col)
    boiler = frequent_lines(lines, min_docs, id_col=id_col).select("line")
    kept = lines.join(F.broadcast(boiler), "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.expr(
            "concat_ws('\\n', transform("
            "sort_array(collect_list(struct(pos, line))), s -> s.line))"
        ).alias("text"),
        F.expr("count(1)").alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.expr("count(1)").alias("n_lines"))
    return totals.join(rebuilt, id_col, "left").selectExpr(
        id_col,
        "COALESCE(text, '') AS text",
        "n_lines",
        "n_lines - COALESCE(n_kept, 0) AS n_removed",
    )


def strip_frequent_lines_sql(
    min_docs: int,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`strip_frequent_lines` (same columns/rows)."""
    return f"""
        WITH lines AS (
            SELECT {id_col},
                   generate_subscripts(sp, 1) - 1 AS pos,
                   unnest(sp) AS line
            FROM (
                SELECT {id_col}, string_split({text_col}, chr(10)) AS sp
                FROM {table}
            )
        ),
        boiler AS (
            SELECT line
            FROM (
                SELECT line, count(DISTINCT {id_col}) AS n_docs
                FROM lines WHERE length(trim(line)) > 0 GROUP BY 1
            )
            WHERE n_docs >= {min_docs}
        ),
        kept AS (
            SELECT l.* FROM lines l
            WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.line = l.line)
        ),
        rebuilt AS (
            SELECT {id_col},
                   string_agg(line, chr(10) ORDER BY pos) AS text,
                   CAST(count(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY 1
        ),
        totals AS (
            SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_lines
            FROM lines GROUP BY 1
        )
        SELECT t.{id_col},
               COALESCE(r.text, '') AS text,
               t.n_lines,
               t.n_lines - COALESCE(r.n_kept, 0) AS n_removed
        FROM totals t LEFT JOIN rebuilt r USING ({id_col})
    """


def line_profile(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc line stats: counts + how much of the doc is repeated lines.

    (id, n_lines, n_unique_lines, dup_line_frac) — the Gopher-style
    repeated-line signals at line grain, one scan + one groupBy."""
    lines = exploded_lines(docs, id_col=id_col, text_col=text_col)
    uniq = F.count_distinct(F.col("line"))
    n = F.count(F.lit(1))
    return lines.groupBy(id_col).agg(
        n.alias("n_lines"),
        uniq.alias("n_unique_lines"),
        ((n - uniq).cast("double") / n).alias("dup_line_frac"),
    )
