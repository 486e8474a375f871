"""Driver-side REST ingestion (reference operators S1-S3).

The reference fetches NHL/odds JSON with requests + retry/backoff/pagination
(src/nhl_pipeline/ingestion/api_utils.py:37-108, fetch_stats_skater_reports
.py:42-140) and wraps each response {extracted_at, source_url, payload}.
HTTP ingestion is inherently driver-side (or a small pandas_udf fan-out) —
it is NOT a Spark-native source; Spark enters at spark.createDataFrame.

The fetcher is injected so tests (and this offline container) run without
network; a `requests`-backed default is constructed only when available.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FetchFn = Callable[[str], dict]

ENVELOPE = T.StructType(
    [
        T.StructField("extracted_at", T.StringType()),
        T.StructField("source_url", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def default_fetcher(retries: int = 3, backoff_s: float = 1.0) -> FetchFn:
    """requests-backed GET with retry/backoff (api_utils.py:37-47 shape).
    Raises ImportError where requests is unavailable — inject a fetcher."""
    import requests  # noqa: F401 — gated import

    def fetch(url: str) -> dict:
        last: Exception | None = None
        for attempt in range(retries):
            try:
                r = requests.get(url, timeout=30)
                if r.status_code == 429:  # rate-limited: exponential backoff
                    time.sleep(backoff_s * 2**attempt)
                    continue
                r.raise_for_status()
                return r.json()
            except Exception as e:  # noqa: BLE001
                last = e
                time.sleep(backoff_s * 2**attempt)
        raise RuntimeError(f"fetch failed after {retries} tries: {url}") from last

    return fetch


def fetch_to_dataframe(
    spark: SparkSession,
    urls: Iterable[str],
    fetch_fn: FetchFn,
    pacing_s: float = 0.0,
) -> DataFrame:
    """Fetch each URL (driver-side, paced like the reference's 0.25 s/game
    sleep) and wrap in the snapshot envelope."""
    rows = []
    now = datetime.now(timezone.utc).isoformat()
    for url in urls:
        payload = fetch_fn(url)
        rows.append((now, url, json.dumps(payload)))
        if pacing_s:
            time.sleep(pacing_s)
    return spark.createDataFrame(rows, ENVELOPE)


def fetch_paginated(
    spark: SparkSession,
    url_template: str,
    fetch_fn: FetchFn,
    page_size: int = 100,
    items_key: str = "data",
    max_pages: int = 1000,
) -> DataFrame:
    """start/limit pagination loop until a short page
    (fetch_stats_skater_reports.py:42-140): each page's items land as one
    envelope row; union happens in createDataFrame once, not per page.

    Completion honesty: a payload MISSING items_key (error-shaped response)
    raises instead of reading as an empty short page, and exhausting
    max_pages without a short page warns — both would otherwise present a
    truncated ingest as complete.
    """
    import warnings

    rows = []
    now = datetime.now(timezone.utc).isoformat()
    complete = False
    for page in range(max_pages):
        url = url_template.format(start=page * page_size, limit=page_size)
        payload = fetch_fn(url)
        if items_key not in payload:
            raise ValueError(
                f"paginated fetch: page {page} payload has no {items_key!r} "
                f"key (error-shaped response?): {sorted(payload)[:8]}"
            )
        items = payload[items_key]
        rows.append((now, url, json.dumps(payload)))
        if len(items) < page_size:
            complete = True
            break
    if not complete:
        warnings.warn(
            f"paginated fetch stopped at max_pages={max_pages} without a "
            f"short page — result is likely TRUNCATED",
            stacklevel=2,
        )
    return spark.createDataFrame(rows, ENVELOPE)
