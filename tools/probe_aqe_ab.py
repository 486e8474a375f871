"""Alternating-arm A/B of two AQE policies over the benched queries (r12).

Arms (all runtime confs, same session, interleaved per rep so box drift
hits every arm equally):

- ``base``   — session defaults (parallelismFirst=true, SHJ threshold 0);
- ``pf``     — ``spark.sql.adaptive.coalescePartitions.parallelismFirst=
  false``: AQE coalesces post-shuffle partitions to the 64 MiB advisory
  instead of stopping at defaultParallelism (guide §2.2 "fewer, larger
  reduce partitions ... let AQE coalesce"; the Spark tuning docs
  recommend exactly this flip for real workloads);
- ``pfshj``  — pf + ``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
  = advisory`` (64 MiB): AQE rewrites SMJ to shuffled-hash when every
  build-side partition fits (guide §3.1), dropping the per-partition
  sorts.

Explicit repartition(n) exchanges (the engine's width policies) are
user-specified and AQE never coalesces them, so hot-path widths are
unaffected; only organic aggregation/join exchanges coalesce.

Usage: PYTHONPATH=. python tools/probe_aqe_ab.py [--reps 3] [--queries a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
SHJ = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    spark = get_spark("probe_aqe_ab")
    from nhl_data_pipeline_spark.catalog import TABLES, load_table
    from nhl_data_pipeline_spark.plans.registry import all_queries

    specs = {n: s for n, s in all_queries().items() if s.bench}
    if args.queries:
        want = {q.strip() for q in args.queries.split(",")}
        specs = {n: s for n, s in specs.items() if n in want}

    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    arms = {
        "base": {PF: "true", SHJ: "0"},
        "pf": {PF: "false", SHJ: "0"},
        "pfshj": {PF: "false", SHJ: str(64 << 20)},
    }

    results: dict[str, dict[str, list[float]]] = {
        n: {a: [] for a in arms} for n in specs
    }
    for name, spec in specs.items():
        fn = spec.bench_fn or spec.fn
        # 2 warmups per arm first (JIT both runtime plan variants), then
        # interleaved timed reps.
        for arm, conf in arms.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            for _ in range(2):
                spark.catalog.clearCache()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for _ in range(args.reps):
            for arm, conf in arms.items():
                for k, v in conf.items():
                    spark.conf.set(k, v)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                results[name][arm].append(round(time.perf_counter() - t0, 3))
        for k in (PF, SHJ):
            spark.conf.unset(k)
        med = {
            a: sorted(r)[len(r) // 2] for a, r in results[name].items()
        }
        print(json.dumps({name: med, "reps": results[name]}))
        sys.stdout.flush()
    totals = {
        a: round(
            sum(sorted(r[a])[len(r[a]) // 2] for r in results.values()), 3
        )
        for a in arms
    }
    print(json.dumps({"probe": "aqe_ab", "totals": totals}))


if __name__ == "__main__":
    main()
