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


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    max_retries: int = 3,
) -> int:
    """MERGE INTO over the versioned shim; returns the committed version.

    Semantics (the Delta/Iceberg MERGE subset the reference's bronze
    writers use — iceberg/bronze_game_boxscore.py:54-80, which MERGEs new
    snapshots on game_id with commit retries):
    - when_matched='update': target rows whose `on` key appears in source
      are REPLACED by the source rows; 'delete': they are dropped;
      'ignore': they are kept unchanged (source row discarded).
    - when_not_matched='insert': source rows with no target match are
      appended; 'ignore': dropped.

    The merge result commits as a NEW immutable version — time travel keeps
    every pre-merge snapshot readable, which in-place upserts
    (lake.upsert_latest) cannot offer. Concurrency follows the reference's
    optimistic pattern: the version write is errorifexists, and a losing
    racer re-reads the new latest and re-applies the merge (commit retry),
    so no update is silently lost. Plan shape: one left-anti (and for
    'ignore' arms a left-semi) shuffle on the merge key plus a union — the
    same joins a table format's MERGE executes; at scale, partition/bucket
    the table on the leading `on` column so they co-locate.
    """
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(f"when_matched: unknown action {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched: unknown action {when_not_matched!r}")

    last_err: Exception | None = None
    for _ in range(max_retries):
        vs = _versions(path)
        target = read_version(spark, path) if vs else None

        if target is None:
            result = source if when_not_matched == "insert" else source.limit(0)
        else:
            keys = source.select(*on).distinct()
            untouched = target.join(keys, on, "left_anti")
            if when_matched == "update":
                matched_part = source.join(target.select(*on).distinct(), on, "left_semi")
            elif when_matched == "ignore":
                matched_part = target.join(keys, on, "left_semi")
            else:  # delete
                matched_part = None
            inserts = (
                source.join(target.select(*on).distinct(), on, "left_anti")
                if when_not_matched == "insert"
                else None
            )
            result = untouched
            if matched_part is not None:
                result = result.unionByName(matched_part)
            if inserts is not None:
                result = result.unionByName(inserts)

        # Commit to the exact version this merge was computed against +1:
        # writing via write_version would re-list versions and could commit
        # a STALE merge over a racer's snapshot (lost update). errorifexists
        # on the pinned path makes the collision loud; the loop re-merges.
        expected_v = (vs[-1] + 1) if vs else 0
        try:
            result.write.mode("errorifexists").parquet(
                os.path.join(path, f"v={expected_v}")
            )
            return expected_v
        except Exception as exc:  # noqa: BLE001 — errorifexists collision
            last_err = exc  # lost the race: re-read latest, re-merge
    raise RuntimeError(
        f"merge_into: gave up after {max_retries} optimistic retries"
    ) from last_err


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """Rewrite the latest version into `target_files` files as a NEW version
    (Iceberg rewrite_data_files analog): row-identical content, fewer
    files, and every pre-compaction version still readable. Use after many
    small merges — the shim's versions, like real table-format commits,
    otherwise accumulate small files that tax scan planning."""
    latest = read_version(spark, path)
    return write_version(latest.coalesce(target_files), path)


def expire_versions(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` versions (expire_snapshots
    analog); returns the expired version numbers. Time travel to an expired
    version then fails loudly, exactly like an expired Iceberg snapshot."""
    import shutil

    vs = _versions(path)
    expired = vs[:-keep_last] if keep_last > 0 else vs
    for v in expired:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return expired
