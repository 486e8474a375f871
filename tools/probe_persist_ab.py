"""Persist-vs-recompute A/B for the multi-consumer text intermediates.

probe_lm_decomp2 / probe_cache_cost found the InMemoryRelation build+read
machinery costs ~10x the recompute it saves at sf0.1 (13 vs 1.5 executor
CPU-s for the full lm query; the knobs — compression, batch size, storage
level — move it < 30%). This probe decides the persist GATE empirically:
same session, alternating arms per rep,

- ``persist``   — the shipped builders as-is;
- ``nopersist`` — DataFrame.persist monkeypatched to identity, so every
  multi-consumer intermediate recomputes (AQE ReusedExchange still
  dedupes identical exchange subtrees at runtime).

Queries: the benched users of corpus-scale persists. kmeans is excluded:
its persist is the iterative-refinement loop state, a different contract.

Usage:
  SPARK_GRAFT_SF_DIR=.testdata/sf1 PYTHONPATH=. \
      python tools/probe_persist_ab.py [--reps 3] [--queries a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Spark 4: live DataFrames are pyspark.sql.classic.dataframe.DataFrame,
# a subclass that OVERRIDES persist — patching the pyspark.sql.DataFrame
# parent silently does nothing (verified: InMemoryTableScan count
# unchanged under the parent patch).
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = (
    "ngram_lm_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "curation_pipeline",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()

    spark = get_spark(
        "probe_persist_ab",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    from bench import _StageMeter  # noqa: E402

    from nhl_data_pipeline_spark.catalog import TABLES, load_table
    from nhl_data_pipeline_spark.plans.registry import all_queries

    meter = _StageMeter(spark)
    specs = all_queries()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    real_persist = DataFrame.persist

    def set_arm(arm: str) -> None:
        if arm == "nopersist":
            DataFrame.persist = lambda self, *a, **k: self  # type: ignore
        else:
            DataFrame.persist = real_persist  # type: ignore

    out = {}
    for name in names:
        spec = specs[name]
        fn = spec.bench_fn or spec.fn
        walls = {"persist": [], "nopersist": []}
        cpus = {"persist": [], "nopersist": []}
        try:
            for arm in ("persist", "nopersist"):
                set_arm(arm)
                for _ in range(2):  # warmup both runtime variants
                    spark.catalog.clearCache()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
            for _ in range(args.reps):
                for arm in ("persist", "nopersist"):
                    set_arm(arm)
                    spark.catalog.clearCache()
                    mark = meter.snap()
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    w = time.perf_counter() - t0
                    delta = meter.since(mark)
                    walls[arm].append(round(w, 3))
                    cpus[arm].append(
                        round(delta["cpu_sec"], 3) if delta else -1.0
                    )
        finally:
            DataFrame.persist = real_persist  # type: ignore
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        out[name] = {
            "wall_persist": med(walls["persist"]),
            "wall_nopersist": med(walls["nopersist"]),
            "cpu_persist": min(cpus["persist"]),
            "cpu_nopersist": min(cpus["nopersist"]),
            "walls": walls,
            "cpus": cpus,
        }
        print(
            json.dumps(
                {name: {k: v for k, v in out[name].items() if not isinstance(v, dict)}}
            )
        )
        sys.stdout.flush()
    print(json.dumps({"probe": "persist_ab", "sf_dir": SF_DIR, "detail": out}))


if __name__ == "__main__":
    main()
