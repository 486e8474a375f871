"""Width-policy probe for the text (shingle-exploding) shuffles.

r11, VERDICT r10 ask #1: at the fifth decade (sf100, 575 MB documents
parquet / ~5.6 GB raw text) the 512 KiB/task budget derives a width of
~1100, every one of the plan's ~10 shuffle/scan stages runs ~1100 tasks
of ~220 ms, and jaccard's occupancy fell 0.89 -> 0.74 while its wall
exponent read 1.16. Before changing `catalog.shuffle_width_for`, this
probe measures the ACTUAL wall / executor-CPU / spill / task-count
response of dedup_ngram_jaccard to explicit widths, so the quantized
policy is set from data, not theory (the bench-protocol rule: explicit
widths only where spill is measured).

Usage:
  python tools/probe_text_width.py --sf-dir .testdata/sf100 \
      --widths 1098 576 288 160 [--reps 2] [--query jaccard|minhash]

Prints one JSON line per (width, rep) with wall_sec, cpu_sec, run_sec,
occupancy, spill bytes (memory+disk), task count, and stage count —
and a final summary line. Not part of the benched protocol; a probe.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402


def _stage_rows(spark) -> list[dict]:
    import urllib.request

    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:  # noqa: BLE001
        time.sleep(0.5)
    with urllib.request.urlopen(
        base + "/stages?status=complete", timeout=30
    ) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--widths", nargs="+", type=int, required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--query", choices=("jaccard", "minhash"), default="jaccard")
    args = ap.parse_args()

    spark = get_spark(
        "probe_text_width",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    ncpu = spark.sparkContext.defaultParallelism

    import nhl_data_pipeline_spark.catalog as catalog
    from nhl_data_pipeline_spark.plans import q_text

    fn = (
        q_text.dedup_ngram_jaccard
        if args.query == "jaccard"
        else q_text._minhash_lsh_pure
    )

    real = catalog.shuffle_width_for
    results: dict[int, list[dict]] = {}
    # Warmup at the smallest probed width (JIT + parquet footers).
    catalog.shuffle_width_for = lambda *a, **k: min(args.widths)
    fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    for width in args.widths:
        catalog.shuffle_width_for = lambda *a, w=width, **k: w
        for rep in range(args.reps):
            spark.catalog.clearCache()
            mark = max((s["stageId"] for s in _stage_rows(spark)), default=-1)
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            new = [s for s in _stage_rows(spark) if s["stageId"] > mark]
            row = {
                "probe": "text_width",
                "query": args.query,
                "width": width,
                "rep": rep,
                "wall_sec": round(wall, 3),
                "cpu_sec": round(
                    sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 3
                ),
                "run_sec": round(
                    sum(s.get("executorRunTime", 0) for s in new) / 1e3, 3
                ),
                "occupancy": round(
                    sum(s.get("executorRunTime", 0) for s in new)
                    / 1e3
                    / (wall * ncpu),
                    3,
                ),
                "spill_mem_bytes": sum(
                    s.get("memoryBytesSpilled", 0) for s in new
                ),
                "spill_disk_bytes": sum(
                    s.get("diskBytesSpilled", 0) for s in new
                ),
                "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
                "stages": len(new),
                "gc_sec": round(
                    sum(s.get("jvmGcTime", 0) for s in new) / 1e3, 3
                ),
            }
            results.setdefault(width, []).append(row)
            print(json.dumps(row))
            sys.stdout.flush()
    catalog.shuffle_width_for = real

    summary = {
        w: {
            "wall_min": min(r["wall_sec"] for r in rows),
            "cpu_min": min(r["cpu_sec"] for r in rows),
            "occ_max": max(r["occupancy"] for r in rows),
            "spill_disk_max": max(r["spill_disk_bytes"] for r in rows),
            "tasks": rows[0]["tasks"],
        }
        for w, rows in results.items()
    }
    print(json.dumps({"probe": "text_width_summary", "summary": summary}))


if __name__ == "__main__":
    main()
