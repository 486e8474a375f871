"""Per-query phase attribution at the bench SF (r12 session 2).

Splits each benched query's wall into the three phases the bench's timed
window actually contains (guide §1.1 — decide WHERE the time goes before
touching anything):

- ``build``   — plan construction: the Python builder running to a
  DataFrame (py4j chatter + any builder-side actions);
- ``plan``    — Catalyst analysis + optimization + physical planning,
  forced via ``df._jdf.queryExecution().executedPlan()`` without
  executing a job (AQE wraps the plan lazily, so this is the static
  cost paid once per action);
- ``exec``    — the noop-sink action itself (includes AQE re-planning,
  codegen compile/JIT on first touch, stage scheduling, and the work).

Also records completed-stage and job counts per exec from the UI REST
API, because at sf0.1 scheduling overhead ~ O(stages), not O(bytes).

Usage:
  PYTHONPATH=. python tools/probe_phase.py [--reps 3] [--queries a,b,c]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    spark = get_spark(
        "probe_phase",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    import urllib.request

    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )

    def counts() -> tuple[int, int]:
        def n(path: str) -> int:
            with urllib.request.urlopen(base + path, timeout=30) as r:
                return len(json.loads(r.read()))

        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        except Exception:  # noqa: BLE001
            time.sleep(0.5)
        return n("/stages?status=complete"), n("/jobs")

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

    out: dict[str, dict] = {}
    for name, spec in specs.items():
        fn = spec.bench_fn or spec.fn
        rows = []
        for i in range(args.reps + 2):
            spark.catalog.clearCache()
            s0, j0 = counts()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            s1, j1 = counts()
            if i >= 2:
                rows.append(
                    {
                        "build": round(t1 - t0, 3),
                        "plan": round(t2 - t1, 3),
                        "exec": round(t3 - t2, 3),
                        "stages": s1 - s0,
                        "jobs": j1 - j0,
                    }
                )
        med = sorted(rows, key=lambda r: r["build"] + r["plan"] + r["exec"])[
            len(rows) // 2
        ]
        out[name] = {"median": med, "reps": rows}
        print(json.dumps({name: out[name]["median"]}))
        sys.stdout.flush()
    print(json.dumps({"probe": "phase", "sf_dir": SF_DIR, "detail": out}))


if __name__ == "__main__":
    main()
