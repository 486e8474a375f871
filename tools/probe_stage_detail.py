"""Per-stage spill/CPU attribution for one query run (r11 probe).

Runs a query once and prints one JSON line PER STAGE (id, name head,
task count, cpu, spill, shuffle read/write) so a query-level spill
total can be pinned to the stage that produced it. Probe only.

Usage:
  python tools/probe_stage_detail.py --sf-dir .testdata/sf100 \
      [--query jaccard] [--width 576]

(r12, ADVICE r11: the old --fix-agg-width flag is gone — the pair-agg
width fix is default engine behavior since r11, plans/q_text.py.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--query", default="jaccard")  # jaccard|minhash|any bench name
    ap.add_argument("--width", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(
        "probe_stage_detail",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )

    import nhl_data_pipeline_spark.catalog as catalog
    from nhl_data_pipeline_spark.plans import q_text

    if args.width:
        catalog.shuffle_width_for = lambda *a, **k: args.width

    if args.query == "jaccard":
        fn = q_text.dedup_ngram_jaccard
    elif args.query == "minhash":
        fn = q_text._minhash_lsh_pure
    else:  # any registered bench query, by name
        from nhl_data_pipeline_spark.plans.registry import all_queries

        spec = all_queries()[args.query]
        fn = spec.bench_fn or spec.fn

    t0 = time.perf_counter()
    fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    import urllib.request

    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    with urllib.request.urlopen(
        base + "/stages?status=complete", timeout=30
    ) as r:
        stages = json.loads(r.read())
    for s in sorted(stages, key=lambda x: x["stageId"]):
        print(
            json.dumps(
                {
                    "stage": s["stageId"],
                    "tasks": s.get("numCompleteTasks"),
                    "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 1),
                    "run_sec": round(s.get("executorRunTime", 0) / 1e3, 1),
                    "spill_mem_gb": round(
                        s.get("memoryBytesSpilled", 0) / 2**30, 2
                    ),
                    "spill_disk_gb": round(
                        s.get("diskBytesSpilled", 0) / 2**30, 2
                    ),
                    "shuffle_read_gb": round(
                        s.get("shuffleReadBytes", 0) / 2**30, 2
                    ),
                    "shuffle_write_gb": round(
                        s.get("shuffleWriteBytes", 0) / 2**30, 2
                    ),
                    "input_gb": round(s.get("inputBytes", 0) / 2**30, 2),
                    "output_rows": s.get("outputRecords", 0),
                    "name": s.get("name", "")[:80],
                }
            )
        )
    print(json.dumps({"wall_sec": round(wall, 3)}))


if __name__ == "__main__":
    main()
