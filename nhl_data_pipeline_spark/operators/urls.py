"""URL canonicalization + URL-keyed dedup for web-scale corpora.

Crawl pipelines dedup by URL before touching content: the same page is
fetched via http/https, with/without default ports, fragments, tracking
params, and trailing slashes. Canonicalize first, then the dedup is the
same hash-agg shape as the content fingerprint (moves canonical-URL
hashes, never payloads).

All transforms are single-pass regexp/string expressions kept inside the
Java∩RE2 subset (no lookaround, numbered-group replacements only) so the
DuckDB twin runs the SAME patterns — pure codegen, stateless map, no UDFs
(pattern: operators/text.py PII regexes).

Canonical form (RFC 3986-lite, the crawl-dedup subset):
  1. scheme + host[:port] lowercased (path/query stay case-sensitive);
  2. `#fragment` dropped;
  3. tracking params dropped (utm_*, fbclid, gclid, ref) — other params
     kept in original order (order can be semantic);
  4. default ports `:80` / `:443` dropped;
  5. trailing `/` dropped from non-root paths; a bare `?` left by step 3
     dropped.

Reference analog: the REST ingestion layer keys its bronze snapshots by
request URL (`src/nhl_pipeline/ingest/api_client.py`); canonicalization is
what makes URL-keyed idempotence robust when upstreams vary formatting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEAD = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
# Tracking params to strip (whole param names only; non-capturing so the
# surrounding patterns own the group numbers; `(?:p&)+` removes RUNS of
# consecutive tracking params in one pass).
_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    head = F.lower(F.regexp_extract(c, _HEAD, 1))
    rest = F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    u = F.when(F.length(head) > 0, F.concat(head, rest)).otherwise(c)
    u = F.regexp_replace(u, r"#.*$", "")                              # fragment
    u = F.regexp_replace(u, r"([?&])(?:" + _TRACKING + r"&)+", r"$1")  # mid runs
    u = F.regexp_replace(u, r"([?&])" + _TRACKING + r"$", "")         # last param
    u = F.regexp_replace(u, r"\?$", "")                               # bare '?'
    u = F.regexp_replace(u, r"^(https?://[^/?#]+):(80|443)([/?#]|$)", r"$1$3")
    u = F.regexp_replace(u, r"^(https?://[^/?#]+(/[^?#]*[^/?#]))/(\?|$)", r"$1$3")
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` — same patterns, RE2 syntax."""
    head = f"lower(regexp_extract({expr}, '{_HEAD}', 1))"
    rest = f"substring({expr}, length({head}) + 1)"
    u = f"(CASE WHEN length({head}) > 0 THEN concat({head}, {rest}) ELSE {expr} END)"
    u = f"regexp_replace({u}, '#.*$', '')"
    u = f"regexp_replace({u}, '([?&])(?:{_TRACKING}&)+', '\\1', 'g')"
    u = f"regexp_replace({u}, '([?&]){_TRACKING}$', '')"
    u = f"regexp_replace({u}, '\\?$', '')"
    u = f"regexp_replace({u}, '^(https?://[^/?#]+):(80|443)([/?#]|$)', '\\1\\3')"
    u = (
        f"regexp_replace({u},"
        f" '^(https?://[^/?#]+(/[^?#]*[^/?#]))/(\\?|$)', '\\1\\3')"
    )
    return u


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(canonical_url, keep_id, n_dups): keep the smallest id per canonical
    URL — one hash-aggregate shuffle on the canonical string (or its
    xxhash64 at scale), the exact-dedup shape."""
    return (
        df.select(F.col(id_col), canonical_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
