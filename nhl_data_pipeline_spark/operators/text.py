"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting — all as JVM-side column expressions (split /
higher-order array functions), no Python UDFs, so they stay inside
whole-stage codegen and scale linearly with input bytes.

Column-expression builders return pyspark Columns; each has a matching
DuckDB SQL fragment builder (suffix ``_sql``) used by the oracle strings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"

# Minimal per-language stopword lists for the n-gram/stopword heuristic.
# Real pipelines plug fastText/cld3 here via a Pandas UDF; the heuristic is
# the deterministic, dependency-free baseline.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "les", "et", "en", "une"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}
ALL_STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex path would swap the
    pattern; the operator shape is identical)."""
    return F.split(col, TOKEN_PATTERN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def _in_list_sql(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def hits_in_tokens(toks: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens (from a pre-tokenized array) in the stopword list."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


# --- Spark-SQL string twins (r12, guide §5 driver cost) -----------------
#
# Building these expressions through the Column API costs hundreds of py4j
# round-trips EACH (measured: one hits_in_tokens 53, the lang-ID CASE
# chain 766, the gopher battery 771 — at ~0.13 ms/trip that is most of
# text_profile's 0.47 s plan-build time, re-paid inside every timed bench
# rep). Each twin renders the SAME expression tree as its Column form to
# one SQL string, which crosses the boundary in a single F.expr/selectExpr
# call. They are generated from the same constants as the Column forms so
# the policy (stopword lists, weights, thresholds) cannot diverge. Float
# literals carry the D suffix: bare `0.4` parses as DECIMAL(1,1) in Spark
# SQL, while the Column forms build double literals.


def _array_lit_spark_sql(words: tuple[str, ...]) -> str:
    assert not any("'" in w or "\\" in w for w in words), words
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def hits_in_tokens_spark_sql(toks_sql: str, words: tuple[str, ...]) -> str:
    """One-round-trip twin of :func:`hits_in_tokens`."""
    arr = _array_lit_spark_sql(words)
    return f"size(filter({toks_sql}, t -> array_contains({arr}, t)))"


def lang_id_from_hits_spark_sql(hits_sql: dict[str, str]) -> str:
    """One-round-trip twin of :func:`lang_id_from_hits`: the same
    precedence logic (earlier langs win ties) AND the same NESTED CASE
    nesting as the Column chain — a flat 5-branch CASE was tried first
    and defeated the optimizer's ``CASE = 'en'`` simplification, leaving
    all five branch conditions in curation_pipeline's pushed filter
    (nested, the pushed predicate reduces to just the matched branch's
    condition, as it did with the Column form)."""
    langs = list(LANG_STOPWORDS)
    expr = "'unknown'"
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        conds = [f"{hits_sql[lang]} > 0"]
        for other in langs[i + 1 :]:
            conds.append(f"{hits_sql[lang]} >= {hits_sql[other]}")
        for other in langs[:i]:
            conds.append(f"{hits_sql[lang]} > {hits_sql[other]}")
        expr = (
            "CASE WHEN " + " AND ".join(conds) + f" THEN '{lang}' "
            f"ELSE {expr} END"
        )
    return expr


def quality_from_counts_spark_sql(n_sql: str, stop_sql: str, nu_sql: str) -> str:
    """One-round-trip twin of :func:`quality_from_counts` (same 0.4/0.3/0.3
    policy constants; weight changes must edit both forms — the parity
    suite catches a one-sided edit)."""
    nd = f"CAST({n_sql} AS DOUBLE)"
    return (
        f"0.4D * least({nd} / 50.0D, 1.0D)"
        f" + 0.3D * (1.0D - CAST({stop_sql} AS DOUBLE) / {nd})"
        f" + 0.3D * (CAST({nu_sql} AS DOUBLE) / {n_sql})"
    )


def gopher_pass_spark_sql(toks_sql: str) -> str:
    """One-round-trip twin of ``gopher_flags_from_tokens(t)["pass_gopher"]``
    — just the conjunction (the optimizer prunes the struct to this same
    expression when only the pass flag is selected)."""
    n = f"size({toks_sql})"
    nd = f"CAST({n} AS DOUBLE)"
    tok_chars = (
        f"aggregate(transform({toks_sql}, w -> length(w)), 0, (a, v) -> a + v)"
    )
    mean_len = f"CAST({tok_chars} AS DOUBLE) / {nd}"
    symbols = (
        f"size(filter({toks_sql}, w -> contains(w, '#')))"
        f" + size(filter({toks_sql}, w -> contains(w, '...')))"
    )
    alpha = f"size(filter({toks_sql}, w -> w RLIKE '[A-Za-z]'))"
    stops = (
        f"size(array_distinct(filter({toks_sql}, w -> "
        f"array_contains({_array_lit_spark_sql(ALL_STOPWORDS)}, w))))"
    )
    return (
        f"({n} >= {GOPHER_MIN_WORDS} AND {n} <= {GOPHER_MAX_WORDS})"
        f" AND ({mean_len} >= {GOPHER_MIN_MEAN_WORD_LEN}D"
        f" AND {mean_len} <= {GOPHER_MAX_MEAN_WORD_LEN}D)"
        f" AND (CAST({symbols} AS DOUBLE) / {nd} <= {GOPHER_MAX_SYMBOL_RATIO}D)"
        f" AND (CAST({alpha} AS DOUBLE) / {nd} >= {GOPHER_MIN_ALPHA_WORD_FRAC}D)"
        f" AND ({stops} >= {GOPHER_MIN_DISTINCT_STOPWORDS})"
    )


def bigrams_of_tokens_spark_sql(toks_sql: str) -> str:
    """One-round-trip twin of :func:`bigrams_of_tokens`."""
    return (
        f"transform(slice({toks_sql}, 1, greatest(size({toks_sql}) - 1, 0)),"
        f" (x, i) -> concat(x, ' ', element_at({toks_sql}, i + 2)))"
    )


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given stopword list (with repeats)."""
    return hits_in_tokens(tokens(col), words)


def stopword_hits_sql(text_expr: str, words: tuple[str, ...]) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex({text_expr}, '\\s+'),"
        f" t -> t IN ({_in_list_sql(words)}))) AS INT)"
    )


def lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """Argmax language from precomputed per-language hit counts (CASE chain
    over int columns — cheap; pair with a materialized hit-count projection
    so tokenization runs once per row, not once per CASE branch)."""
    langs = list(LANG_STOPWORDS)
    expr = F.lit("unknown")
    # Build from the last precedence upward so earlier langs win ties.
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = hits[lang] > 0
        for other in langs[i + 1 :]:
            cond = cond & (hits[lang] >= hits[other])
        for other in langs[:i]:
            cond = cond & (hits[lang] > hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits, fixed precedence on ties,
    'unknown' when nothing matches. Analog of a production lang-ID stage;
    same CASE chain is emitted to SQL by lang_id_sql().

    NOTE: inlines stopword_hits per CASE branch (conditionals defeat
    subexpression elimination, so `split` re-runs per branch) — fine for
    composition; the profiling query uses lang_id_from_hits over a
    materialized hit-count projection instead."""
    hits = {lang: stopword_hits(col, ws) for lang, ws in LANG_STOPWORDS.items()}
    return lang_id_from_hits(hits)


def lang_id_sql(text_expr: str) -> str:
    hits = {
        lang: stopword_hits_sql(text_expr, ws) for lang, ws in LANG_STOPWORDS.items()
    }
    langs = list(LANG_STOPWORDS)
    sql = "'unknown'"
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        conds = [f"{hits[lang]} > 0"]
        conds += [f"{hits[lang]} >= {hits[o]}" for o in langs[i + 1 :]]
        conds += [f"{hits[lang]} > {hits[o]}" for o in langs[:i]]
        sql = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {sql} END"
    return sql


def unique_ratio(col: Column | str) -> Column:
    t = tokens(col)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def quality_from_counts(
    n_tokens: Column, stop_hits: Column, n_unique: Column
) -> Column:
    """The quality formula over precomputed counts — the ONE place the
    0.4/0.3/0.3 policy lives. Both the per-column form below and the
    materialized-count projections in plans/q_text.py call this, so a
    weight change cannot silently diverge the oracle-checked copies."""
    n = n_tokens.cast("double")
    return (
        0.4 * F.least(n / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - stop_hits.cast("double") / n)
        + 0.3 * (n_unique.cast("double") / n_tokens)
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic: length richness + non-stopword mass
    + lexical diversity. Analog of length/punct/stopword-ratio scoring in
    training-data curation; weights are illustrative policy.
    """
    t = tokens(col)
    return quality_from_counts(
        F.size(t),
        stopword_hits(col, ALL_STOPWORDS),
        F.size(F.array_distinct(t)),
    )


def quality_score_sql(text_expr: str) -> str:
    toks = f"string_split_regex({text_expr}, '\\s+')"
    n = f"CAST(len({toks}) AS DOUBLE)"
    stop = stopword_hits_sql(text_expr, ALL_STOPWORDS)
    uniq = f"CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})"
    return (
        f"0.4 * LEAST({n} / 50.0, 1.0)"
        f" + 0.3 * (1.0 - CAST({stop} AS DOUBLE) / {n})"
        f" + 0.3 * ({uniq})"
    )


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of whitespace-collapsed,
    lower-cased, trimmed text. The exact-dedup key."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def fingerprint_sql(text_expr: str) -> str:
    return f"md5(lower(trim(regexp_replace({text_expr}, '\\s+', ' ', 'g'))))"


# GPT-2-style pre-tokenizer (simplified, ASCII classes): contractions,
# space-prefixed letter runs, digit runs, punctuation runs. The real BPE
# merge table is a model artifact; pre-tokenization is where the engine
# work is — counts from this regex track BPE token counts closely enough
# for length/cost accounting, entirely inside codegen.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def tokens_bpe(col: Column | str) -> Column:
    """BPE-ish pre-tokenization via regexp_extract_all — the swap-in
    alternative to the whitespace :func:`tokens` for token-budget
    accounting (sequence packing, cost estimates). JVM regex, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))


def token_count_bpe(col: Column | str) -> Column:
    return F.size(tokens_bpe(col))


def bigrams_of_tokens(t: Column) -> Column:
    """Token 2-grams from a pre-tokenized array — per-row HOF expression."""
    return F.transform(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda x, i: F.concat(x, F.lit(" "), F.element_at(t, i + F.lit(2))),
    )


def bigrams(col: Column | str) -> Column:
    """Token 2-grams as 'tok_i tok_i+1' strings, built with array HOFs —
    no explode, no shuffle, stays a per-row expression."""
    return bigrams_of_tokens(tokens(col))


def repetition_stats(col: Column | str) -> Column:
    """Gopher-style repetition signals as one per-row fold:
    ``struct(n_bigrams, top_bigram_n, dup_bigram_mass)``.

    top_bigram_n = occurrences of the most frequent bigram; dup_bigram_mass
    = total occurrences of bigrams appearing more than once. Computed by
    sorting the row's bigram array and folding run lengths (O(n log n) per
    row, JVM-side, no shuffle). Mirrors the "fraction of characters in the
    most common n-gram" / "duplicated n-gram" removal rules of
    Gopher/MassiveText-style curation (Rae et al. 2021 §A1.1), on token
    counts. For corpora of very LONG documents, prefer the explode →
    groupBy(doc_id, bigram) form (same results, linear per row, one
    shuffle); this fold is the short-document fast path.
    """
    srt = F.array_sort(bigrams(col))
    zero = F.lit(0).cast("long")

    def step(acc: Column, x: Column) -> Column:
        is_new = acc.prev.isNull() | (acc.prev != x)
        run = F.when(is_new, F.lit(1).cast("long")).otherwise(acc.run + 1)
        ended_dup = F.when(
            (~acc.prev.isNull()) & (acc.prev != x) & (acc.run > 1), acc.run
        ).otherwise(zero)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
            (acc.dup + ended_dup).alias("dup"),
        )

    fold = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("best"),
            zero.alias("dup"),
        ),
        step,
        lambda acc: F.struct(
            F.size(srt).cast("long").alias("n_bigrams"),
            acc.best.alias("top_bigram_n"),
            (acc.dup + F.when(acc.run > 1, acc.run).otherwise(zero)).alias(
                "dup_bigram_mass"
            ),
        ),
    )
    return fold


def top_bigram_frac(col: Column | str) -> Column:
    """Fraction of the row's bigrams taken by its single most frequent
    bigram; 0.0 for rows with no bigrams. Gopher drops docs above ~0.2."""
    s = repetition_stats(col)
    return F.when(s.n_bigrams > 0, s.top_bigram_n / s.n_bigrams).otherwise(
        F.lit(0.0)
    )


def dup_bigram_frac(col: Column | str) -> Column:
    """Fraction of bigram occurrences belonging to bigrams seen more than
    once in the row; 0.0 for rows with no bigrams."""
    s = repetition_stats(col)
    return F.when(s.n_bigrams > 0, s.dup_bigram_mass / s.n_bigrams).otherwise(
        F.lit(0.0)
    )


def repetition_agg(df, id_col: str = "doc_id", text_col: str = "text",
                   tokens_col: str | None = None):
    """Per-doc repetition aggregate WITHOUT zero-fill: docs whose text has
    no bigrams are absent (left-join + coalesce at the call site, or use
    :func:`repetition_stats_exploded` for the zero-filled contract).

    This codegen path beats the per-row fold by ~20× even on SHORT docs —
    interpreted ``aggregate`` over a struct accumulator costs ~40 µs per
    array element, while explode → two hash aggregates stays in whole-stage
    codegen (measured at sf0.1: 10.7 s fold vs ~0.5 s exploded for 5000
    ~50-token docs) — so it is the default engine path, not just the
    long-document one.
    """
    # tokens_col path: the bigram HOF as ONE expr string (r12 — the
    # Column form costs ~870 py4j round-trips per build, see the
    # *_spark_sql twins above). text_col path keeps the Column form: its
    # regex pattern would need escaping games inside a SQL literal.
    bg = (
        F.expr(bigrams_of_tokens_spark_sql(tokens_col))
        if tokens_col is not None
        else bigrams(F.col(text_col))
    )
    per_bg = (
        df.select(id_col, F.explode(bg).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.expr("count(1)").alias("c"))
    )
    # Aggregates as parsed SQL strings (r12 chatter pass) — same trees.
    return per_bg.groupBy(id_col).agg(
        F.expr("CAST(sum(c) AS BIGINT)").alias("n_bigrams"),
        F.expr("CAST(max(c) AS BIGINT)").alias("top_bigram_n"),
        F.expr(
            "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)"
        ).alias("dup_bigram_mass"),
    )


def repetition_stats_exploded(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Distributed form of :func:`repetition_stats`: explode bigrams →
    count per (doc, bigram) → re-aggregate per doc. Same results row-for-row
    (pinned by tests/test_operator_equivalence.py) at linear work per row
    however long the document, entirely in whole-stage codegen — see
    :func:`repetition_agg` for the measured ~20× win over the fold. Two
    shuffles, both keyed (doc_id[, bigram]), so hot documents spread across
    partitions in the first aggregate.
    """
    agg = repetition_agg(df, id_col, text_col)
    # docs with no bigrams vanish at the explode — restore them as zeros so
    # the contract matches the per-row fold exactly
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", zero).alias("n_bigrams"),
            F.coalesce("top_bigram_n", zero).alias("top_bigram_n"),
            F.coalesce("dup_bigram_mass", zero).alias("dup_bigram_mass"),
        )
    )


def _bigrams_sql(text_expr: str) -> str:
    l = f"string_split_regex({text_expr}, '\\s+')"
    return (
        f"list_transform(list_zip({l}[1:len({l})-1], {l}[2:len({l})]),"
        " p -> p[1] || ' ' || p[2])"
    )


def _bigram_hist_vals_sql(text_expr: str) -> str:
    return f"map_values(list_aggregate({_bigrams_sql(text_expr)}, 'histogram'))"


def top_bigram_frac_sql(text_expr: str) -> str:
    vals = _bigram_hist_vals_sql(text_expr)
    n = f"len({_bigrams_sql(text_expr)})"
    return (
        f"CASE WHEN {n} > 0 THEN CAST(list_max({vals}) AS DOUBLE) / {n}"
        " ELSE 0.0 END"
    )


def dup_bigram_frac_sql(text_expr: str) -> str:
    vals = _bigram_hist_vals_sql(text_expr)
    n = f"len({_bigrams_sql(text_expr)})"
    return (
        f"CASE WHEN {n} > 0 THEN"
        f" CAST(coalesce(list_sum(list_filter({vals}, c -> c > 1)), 0)"
        f" AS DOUBLE) / {n} ELSE 0.0 END"
    )


# PII redaction: ordered (pattern, replacement) pairs. Patterns stay inside
# the regex subset Java and RE2/DuckDB share (no lookaround, no backrefs) so
# the Spark column and the SQL oracle are literally the same regexes. Order
# matters: emails before phones (digits in hostnames), IPs before phones.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "[IP]"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    (
        r"(?:\+?[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
        "[PHONE]",
    ),
)


def redact_pii(col: Column | str) -> Column:
    """Scrub emails / IPv4s / SSNs / US-style phone numbers to typed
    placeholder tags. A chain of JVM ``regexp_replace`` calls — whole-stage
    codegen, linear in input bytes, no Python. The standard pre-training
    redaction pass (the production variant swaps in NER-model spans via a
    Pandas UDF; the operator contract — text in, redacted text out — is
    identical)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_hits(col: Column | str) -> Column:
    """Count of PII spans that redaction would replace (cheap audit metric:
    sum it per source to find leaky providers before training)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for pat, tag in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        # redact as we count, exactly like redact_pii, so later patterns
        # can't re-match inside spans an earlier pattern already claimed
        c = F.regexp_replace(c, pat, tag)
    return total


def redact_pii_sql(text_expr: str) -> str:
    sql = text_expr
    for pat, tag in PII_PATTERNS:
        # DuckDB standard strings pass backslashes through verbatim — only
        # quotes need escaping for the literally-identical regex to land.
        p = pat.replace("'", "''")
        sql = f"regexp_replace({sql}, '{p}', '{tag}', 'g')"
    return sql


def pii_hits_sql(text_expr: str) -> str:
    sql = text_expr
    terms = []
    for pat, tag in PII_PATTERNS:
        p = pat.replace("'", "''")
        terms.append(f"len(regexp_extract_all({sql}, '{p}'))")
        sql = f"regexp_replace({sql}, '{p}', '{tag}', 'g')"
    return "CAST(" + " + ".join(terms) + " AS INT)"


# Gopher-style rule battery (Rae et al. 2021, "Scaling Language Models",
# table A1 — thresholds adapted): hard per-document filters that run BEFORE
# model-based quality scoring in a pretraining pipeline. Every rule is a
# pure codegen expression over one tokenization, with a DuckDB SQL twin.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1  # '#' and '...' per word
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8  # words containing >= 1 alphabetic char
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_flags(col: Column | str) -> Column:
    """Struct of per-rule booleans + the overall pass flag.

    Fields: word_count_ok, mean_word_len_ok, symbol_ratio_ok,
    alpha_frac_ok, stopwords_ok, pass_gopher. One tokenize per row; every
    rule derives from the same array (materialize the struct in its own
    projection when composing, same pattern as the profile query).
    """
    return gopher_flags_from_tokens(tokens(col))


def gopher_flags_from_tokens(t: Column) -> Column:
    """Same battery over a pre-tokenized array (composition form: the
    profile query feeds its materialized single-tokenize column)."""
    n = F.size(t)
    nd = n.cast("double")
    # mean word length from token lengths (length(text)/n would miscount
    # separator runs)
    tok_chars = F.aggregate(
        F.transform(t, lambda w: F.length(w)),
        F.lit(0),
        lambda a, v: a + v,
    )
    mean_len = tok_chars.cast("double") / nd
    symbols = F.size(F.filter(t, lambda w: w.contains("#"))) + F.size(
        F.filter(t, lambda w: w.contains("..."))
    )
    alpha = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(w) for w in ALL_STOPWORDS])
    distinct_stops = F.size(
        F.array_distinct(F.filter(t, lambda w: F.array_contains(stop_arr, w)))
    )
    word_count_ok = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    mean_len_ok = (mean_len >= GOPHER_MIN_MEAN_WORD_LEN) & (
        mean_len <= GOPHER_MAX_MEAN_WORD_LEN
    )
    symbol_ok = symbols.cast("double") / nd <= GOPHER_MAX_SYMBOL_RATIO
    alpha_ok = alpha.cast("double") / nd >= GOPHER_MIN_ALPHA_WORD_FRAC
    stops_ok = distinct_stops >= GOPHER_MIN_DISTINCT_STOPWORDS
    return F.struct(
        word_count_ok.alias("word_count_ok"),
        mean_len_ok.alias("mean_word_len_ok"),
        symbol_ok.alias("symbol_ratio_ok"),
        alpha_ok.alias("alpha_frac_ok"),
        stops_ok.alias("stopwords_ok"),
        (word_count_ok & mean_len_ok & symbol_ok & alpha_ok & stops_ok).alias(
            "pass_gopher"
        ),
    )


def gopher_flags_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`gopher_flags` as a struct_pack expression."""
    t = f"string_split_regex({text_expr}, '\\s+')"
    n = f"len({t})"
    nd = f"CAST({n} AS DOUBLE)"
    mean_len = f"CAST(list_sum(list_transform({t}, w -> length(w))) AS DOUBLE) / {nd}"
    symbols = (
        f"(len(list_filter({t}, w -> contains(w, '#')))"
        f" + len(list_filter({t}, w -> contains(w, '...'))))"
    )
    alpha = f"len(list_filter({t}, w -> regexp_matches(w, '[A-Za-z]')))"
    stops = (
        f"len(list_distinct(list_filter({t},"
        f" w -> w IN ({_in_list_sql(ALL_STOPWORDS)}))))"
    )
    wc = f"({n} >= {GOPHER_MIN_WORDS} AND {n} <= {GOPHER_MAX_WORDS})"
    ml = (
        f"({mean_len} >= {GOPHER_MIN_MEAN_WORD_LEN}"
        f" AND {mean_len} <= {GOPHER_MAX_MEAN_WORD_LEN})"
    )
    sy = f"(CAST({symbols} AS DOUBLE) / {nd} <= {GOPHER_MAX_SYMBOL_RATIO})"
    al = f"(CAST({alpha} AS DOUBLE) / {nd} >= {GOPHER_MIN_ALPHA_WORD_FRAC})"
    st = f"({stops} >= {GOPHER_MIN_DISTINCT_STOPWORDS})"
    return (
        "struct_pack(word_count_ok := {wc}, mean_word_len_ok := {ml},"
        " symbol_ratio_ok := {sy}, alpha_frac_ok := {al},"
        " stopwords_ok := {st},"
        " pass_gopher := ({wc} AND {ml} AND {sy} AND {al} AND {st}))"
    ).format(wc=wc, ml=ml, sy=sy, al=al, st=st)


def compression_ratio(col: Column | str) -> Column:
    """zlib-compressibility quality signal: compressed_len / raw_len.

    The Gopher/FineWeb-style repetition detector that n-gram ratios miss:
    machine-generated or template text compresses far below prose (~0.3
    vs ~0.6+), and boilerplate-stuffed pages sit in between. Low ratio ⇒
    repetitive ⇒ usually drop or down-weight.

    This is one of the few legitimately-Python operators in the engine:
    there is no JVM-side zlib expression, so it runs as an Arrow-batched
    pandas UDF (never row-at-a-time). Deterministic: zlib level 6 output
    is stable for a given input across platforms/versions in practice,
    and the TESTS pin parity against direct python zlib, not a stored
    constant. Empty/NULL text → NULL (no signal, not 'perfectly
    compressible').
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def f(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(f)

    return _ratio(F.col(col) if isinstance(col, str) else col)
