"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting — all as JVM-side column expressions (split /
higher-order array functions), no Python UDFs, so they stay inside
whole-stage codegen and scale linearly with input bytes.

Column-expression builders return pyspark Columns; each has a matching
DuckDB SQL fragment builder (suffix ``_sql``) used by the oracle strings.
"""

from __future__ import annotations

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


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given stopword list (with repeats)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def stopword_hits_sql(text_expr: str, words: tuple[str, ...]) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex({text_expr}, '\\s+'),"
        f" t -> t IN ({_in_list_sql(words)}))) AS INT)"
    )


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits, fixed precedence on ties,
    'unknown' when nothing matches. Analog of a production lang-ID stage;
    same CASE chain is emitted to SQL by lang_id_sql()."""
    hits = {lang: stopword_hits(col, ws) for lang, ws in LANG_STOPWORDS.items()}
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


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic: length richness + non-stopword mass
    + lexical diversity. Analog of length/punct/stopword-ratio scoring in
    training-data curation; weights are illustrative policy.
    """
    n = token_count(col).cast("double")
    stop_ratio = stopword_hits(col, ALL_STOPWORDS).cast("double") / n
    return (
        0.4 * F.least(n / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - stop_ratio)
        + 0.3 * unique_ratio(col)
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
