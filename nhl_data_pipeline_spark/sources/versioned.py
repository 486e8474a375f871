"""Versioned parquet tables: the minimal time-travel substrate.

The reference's temporal regression check reads a table AT(OFFSET => -secs)
via Snowflake time travel (src/nhl_pipeline/utils/time_travel_validator.py:
71-76). Time travel is the one reference capability that requires a table
format (SURVEY §4); with no Delta/Iceberg jars in this environment, this
shim provides the same contract over plain parquet: every write lands in a
new `v=N` directory and readers address any retained version. On a cluster
with Delta/Iceberg available, swap write_version/read_version for
`VERSION AS OF` — the validator below is format-agnostic.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.fullmatch(r"v=(\d+)", d))
    )


def write_version(df: DataFrame, path: str) -> int:
    """Append a new immutable version; returns its number."""
    vs = _versions(path)
    v = (vs[-1] + 1) if vs else 0
    df.write.mode("errorifexists").parquet(os.path.join(path, f"v={v}"))
    return v


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a specific version (default: latest) — `VERSION AS OF` analog."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versions at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def latest_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versions at {path}")
    return vs[-1]
