"""Corpus report card: one-scan per-source quality/size summary.

The dataset-datasheet stage of a curation pipeline: before training, you
want per-(source, lang) document counts, token totals, exact length
histograms, dedup rate, and quality mass — and at 100 TB you want all of
it from ONE scan, not a metric-per-query dashboard. Everything here is a
single groupBy with conditional aggregates:

- counts/sums are plain aggregates;
- the length histogram is EXACT fixed-width bins (conditional counts per
  bin — cross-engine exact, unlike approx_percentile sketches whose
  internals differ per engine);
- dup_docs counts docs whose canonical fingerprint appears more than once
  WITHIN the group (a two-level aggregate: fp-grain then group-grain —
  both map-side combinable, fingerprints only on the wire).

The DuckDB twin reproduces every cell bit-for-bit (all-integer output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.operators.text import fingerprint, token_count

HIST_BINS = (0, 25, 50, 75, 100)  # token-count bin lower edges; last is open


def _bin_cols() -> list[F.Column]:
    cols = []
    for i, lo in enumerate(HIST_BINS):
        hi = HIST_BINS[i + 1] if i + 1 < len(HIST_BINS) else None
        cond = F.col("n_tokens") >= lo
        if hi is not None:
            cond = cond & (F.col("n_tokens") < hi)
        cols.append(
            F.count(F.when(cond, 1)).alias(
                f"docs_{lo}_{hi if hi is not None else 'inf'}_tok"
            )
        )
    return cols


def corpus_report(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) summary. One wide-metric scan + a fingerprint
    sub-aggregate; group keys are low-cardinality so the final rollup is
    tiny however large the corpus."""
    base = docs.select(
        "source",
        "lang",
        token_count(F.col("text")).cast("int").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        fingerprint(F.col("text")).alias("fp"),
    )
    # fp-grain first: docs per (group, fp); then group-grain rollup. Both
    # aggregates combine map-side; only (source, lang, fp, counts) shuffle.
    per_fp = base.groupBy("source", "lang", "fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_chars").alias("chars"),
    )
    hist_src = base.groupBy("source", "lang").agg(
        *_bin_cols(),
    )
    rollup = per_fp.groupBy("source", "lang").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("n_tokens"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique_fps"),
        F.sum(F.when(F.col("n") > 1, F.col("n")))
        .cast("bigint")
        .alias("dup_docs_raw"),
    )
    return (
        rollup.join(hist_src, ["source", "lang"])
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_unique_fps",
            F.coalesce("dup_docs_raw", F.lit(0)).cast("bigint").alias("dup_docs"),
            *[
                F.col(f"docs_{lo}_{HIST_BINS[i + 1] if i + 1 < len(HIST_BINS) else 'inf'}_tok").cast(
                    "bigint"
                ).alias(
                    f"docs_{lo}_{HIST_BINS[i + 1] if i + 1 < len(HIST_BINS) else 'inf'}_tok"
                )
                for i, lo in enumerate(HIST_BINS)
            ],
        )
    )


def corpus_report_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`corpus_report` (same columns, same values)."""
    toks = "len(string_split_regex(text, '\\s+'))"
    bins = []
    for i, lo in enumerate(HIST_BINS):
        hi = HIST_BINS[i + 1] if i + 1 < len(HIST_BINS) else None
        cond = f"n_tokens >= {lo}" + (f" AND n_tokens < {hi}" if hi else "")
        name = f"docs_{lo}_{hi if hi is not None else 'inf'}_tok"
        bins.append(
            f"CAST(count(*) FILTER (WHERE {cond}) AS BIGINT) AS {name}"
        )
    return f"""
        WITH base AS (
            SELECT source, lang,
                   CAST({toks} AS INT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS fp
            FROM {table}
        ),
        per_fp AS (
            SELECT source, lang, fp,
                   count(*) AS n, sum(n_tokens) AS tok, sum(n_chars) AS chars
            FROM base GROUP BY 1, 2, 3
        ),
        rollup AS (
            SELECT source, lang,
                   CAST(sum(n) AS BIGINT) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS n_tokens,
                   CAST(sum(chars) AS BIGINT) AS n_chars,
                   CAST(count(*) AS BIGINT) AS n_unique_fps,
                   CAST(COALESCE(sum(n) FILTER (WHERE n > 1), 0) AS BIGINT)
                       AS dup_docs
            FROM per_fp GROUP BY 1, 2
        ),
        hist AS (
            SELECT source, lang, {", ".join(bins)}
            FROM base GROUP BY 1, 2
        )
        SELECT r.source, r.lang, r.n_docs, r.n_tokens, r.n_chars,
               r.n_unique_fps, r.dup_docs,
               {", ".join("h." + b.split(" AS ")[-1] for b in bins)}
        FROM rollup r JOIN hist h USING (source, lang)
    """


QUANTILES = (0.5, 0.95, 0.99)


def group_quantiles(
    docs: DataFrame,
    *,
    group_cols: tuple[str, ...] = ("source", "lang"),
    qs: tuple[float, ...] = QUANTILES,
) -> DataFrame:
    """EXACT per-group token-count quantiles, no sort of the corpus.

    approx_percentile is a sketch whose merge order varies run-to-run and
    differs per engine; a full sort is a corpus-wide exchange. This is the
    exact middle path for value domains with bounded cardinality (token
    counts, lengths, scores-quantized): compress the distribution first —
    groupBy (group, value) COUNT moves one row per DISTINCT value (map-
    side combined), then a per-group cumulative sum over the few hundred
    distinct values gives rank boundaries, and quantile q is the FIRST
    value whose running count reaches ceil(q·n) (the lower discrete
    quantile — same definition in the DuckDB twin, so cells match
    bit-for-bit; ties and duplicates are exact, not estimated).

    Output: group_cols + one BIGINT column per q (``p50 p95 p99``).
    """
    from pyspark.sql.window import Window

    gc = list(group_cols)
    val = token_count(F.col("text")).cast("bigint").alias("v")
    # NULL values (null text) are excluded in BOTH engines explicitly:
    # Spark windows order NULLS FIRST, DuckDB NULLS LAST, so leaving them
    # in would silently skew the rank lookup differently per engine.
    dist = (
        docs.select(*gc, val)
        .filter(F.col("v").isNotNull())
        .groupBy(*gc, "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(*gc).orderBy("v")
    cum = dist.select(
        *gc,
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(*gc)).alias("n"),
    )
    aggs = []
    for q in qs:
        name = f"p{int(q * 100)}"
        rank = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("v"))).alias(name)
        )
    return cum.groupBy(*gc).agg(*aggs)


def group_quantiles_sql(
    table: str = "documents",
    *,
    qs: tuple[float, ...] = QUANTILES,
) -> str:
    """DuckDB twin of :func:`group_quantiles` (same discrete-rank rule)."""
    toks = "len(string_split_regex(text, '\\s+'))"
    cols = ", ".join(
        f"min(CASE WHEN cum >= ceil({q} * n) THEN v END) AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
        WITH dist AS (
            SELECT source, lang, CAST({toks} AS BIGINT) AS v,
                   count(*) AS c
            FROM {table}
            WHERE {toks} IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        cum AS (
            SELECT source, lang, v,
                   sum(c) OVER (PARTITION BY source, lang ORDER BY v) AS cum,
                   sum(c) OVER (PARTITION BY source, lang) AS n
            FROM dist
        )
        SELECT source, lang, {cols}
        FROM cum GROUP BY 1, 2
    """
