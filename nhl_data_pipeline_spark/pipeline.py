"""Materialized-DAG pipeline runner: the engine-side analog of the
reference's orchestration layer.

The reference wires `ingest >> [loads] >> dbt run >> export` as an Airflow
DAG (dags/nhl_daily_ingestion_dag.py:250-252) and relies on dbt to build
models in ref()-dependency order; re-runs are made safe by idempotent
loads. This module is that contract, Spark-native and state-aware:

- **Stages** are named DataFrame builders with explicit dependencies; the
  runner topologically orders them (cycles rejected at construction).
- **Each stage materializes to the lake** (`<root>/<name>/` parquet) with
  a tiny manifest recording its STATE FINGERPRINT: md5 of the stage's
  version token + its dependencies' fingerprints. Source stages carry the
  input snapshot id in their version; bumping any version invalidates
  exactly that stage and its downstream cone — dbt's `state:modified+`
  semantics without a metadata service.
- **Re-runs skip clean stages** (fingerprint match ⇒ read the existing
  parquet, zero compute) and **resume after crashes**: the manifest is
  written only AFTER the parquet commit, so a stage killed mid-write has
  no manifest and rebuilds; its finished upstreams skip. Fingerprints
  chain, so a skipped stage's downstream sees the same fingerprint it
  would after a rebuild.

At 100 TB this is the pattern that matters: the fingerprint is a few
bytes of driver state per stage — skipping is O(1) regardless of data
size, and materialization boundaries double as the shuffle-free restart
points the reference gets from its S3/Snowflake layer hops.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_pipeline_manifest.json"


def _manifest_fp(manifest: Path) -> str | None:
    """Fingerprint from a manifest, or None if absent/unreadable — a torn
    or corrupt manifest means the stage is DIRTY (rebuild), never a crash:
    self-healing is the whole point of the resume contract."""
    if not manifest.exists():
        return None
    try:
        return json.loads(manifest.read_text()).get("fingerprint")
    except (json.JSONDecodeError, OSError):
        return None


@dataclass(frozen=True)
class Stage:
    """One named model: ``fn(spark, inputs)`` where ``inputs`` maps each
    dependency name to its materialized DataFrame. ``version`` is the
    stage's logic/source token — change it to force a rebuild of the
    stage and everything downstream."""

    name: str
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    deps: tuple[str, ...] = ()
    version: str = "1"


@dataclass
class StageResult:
    status: str  # 'built' | 'skipped'
    path: str
    fingerprint: str


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def __post_init__(self) -> None:
        names = [s.name for s in self.stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names in {names}")
        known = set(names)
        for s in self.stages:
            missing = [d for d in s.deps if d not in known]
            if missing:
                raise ValueError(f"stage '{s.name}' depends on unknown {missing}")
        self._order = self._toposort()

    def _toposort(self) -> list[Stage]:
        by_name = {s.name: s for s in self.stages}
        done: dict[str, int] = {}  # 0=visiting, 1=done
        out: list[Stage] = []

        def visit(s: Stage, chain: tuple[str, ...]) -> None:
            state = done.get(s.name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(
                    f"dependency cycle: {' -> '.join(chain + (s.name,))}"
                )
            done[s.name] = 0
            for d in s.deps:
                visit(by_name[d], chain + (s.name,))
            done[s.name] = 1
            out.append(s)

        for s in self.stages:
            visit(s, ())
        return out

    def run(
        self,
        spark: SparkSession,
        root: str,
        *,
        force: tuple[str, ...] = (),
    ) -> dict[str, StageResult]:
        """Build every stale stage in dependency order; skip clean ones.

        ``force`` rebuilds the named stages regardless of state (their
        downstream rebuilds too only if fingerprints change — they don't
        on a pure force, matching dbt's `--full-refresh` of one model).
        """
        unknown = [f for f in force if f not in {s.name for s in self.stages}]
        if unknown:
            raise ValueError(f"force names not in pipeline: {unknown}")
        results: dict[str, StageResult] = {}
        fps: dict[str, str] = {}
        for s in self._order:
            fp = hashlib.md5(
                json.dumps(
                    [s.name, s.version, [fps[d] for d in s.deps]]
                ).encode()
            ).hexdigest()
            fps[s.name] = fp
            out_dir = Path(root) / s.name
            manifest = out_dir / _MANIFEST
            clean = s.name not in force and _manifest_fp(manifest) == fp
            if clean:
                results[s.name] = StageResult("skipped", str(out_dir), fp)
                continue
            inputs = {
                d: spark.read.parquet(str(Path(root) / d)) for d in s.deps
            }
            df = s.fn(spark, inputs)
            # parquet first, manifest only after the commit: a crash
            # between the two leaves no manifest -> the stage rebuilds on
            # resume (at-least-once per stage, exactly-once per manifest).
            if manifest.exists():
                manifest.unlink()
            df.write.mode("overwrite").parquet(str(out_dir))
            # atomic manifest commit: write-to-temp + rename, so a torn
            # write can never leave a half-manifest at the final path
            tmp = manifest.with_suffix(".json.tmp")
            tmp.write_text(json.dumps({"fingerprint": fp}))
            tmp.rename(manifest)
            results[s.name] = StageResult("built", str(out_dir), fp)
        return results

    def read(self, spark: SparkSession, root: str, name: str) -> DataFrame:
        return spark.read.parquet(str(Path(root) / name))
