"""Bucketed-lineitem counterfactual probe (r12, VERDICT r11 ask #1).

r11 attributed join_chain_revenue's sf100 wall norm 1.25 (cpu_exp 1.01)
and topk's 1.12 to ONE stage: the lineitem repartition exchange — 128 map
tasks, ~9.7 GB shuffle write, 21.6 GB mem / 9.0 GB disk sorter spill,
459 s blocked on single-disk writeback (bench_logs/r11/
probe_stage_{join_chain,topk}_sf100.out). "A cluster answers with
spindles" was only half the 100 TB answer; this probe runs the other
half — DON'T SHUFFLE LINEITEM AT ALL. It materializes the lake's
lineitem bucketed by l_orderkey (and orders by o_orderkey) once, then
runs the SAME registered query functions over the bucketed layout via
catalog.BUCKETED_LAYOUT, and dumps per-stage attribution so the two
plans can be compared exchange-by-exchange.

Modes:
  build    — pay the one-time ingest shuffle: write {table}_bkt under
             --bucket-dir (idempotent; skips tables already on disk).
  lake     — run --query over the plain lake with stage metering
             (the baseline side, same code path as the bucketed side).
  bucketed — re-register the bucketed tables in a fresh session, point
             catalog.BUCKETED_LAYOUT at them, run --query.
  check    — run BOTH layouts in one session and require row-exact
             equality (sums are decimal-exact, so equality is bitwise).

Usage:
  python tools/probe_bucketed_join.py --sf-dir .testdata/sf100 \
      --bucket-dir .testdata/bucketed_sf100 --buckets 128 --mode build
  python tools/probe_bucketed_join.py --sf-dir .testdata/sf100 \
      --bucket-dir .testdata/bucketed_sf100 --buckets 128 \
      --mode bucketed --query join_chain_revenue
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

# The layout under test: bucket the two fact tables by their join/agg
# key. lineitem sorted within buckets (SMJ reads it sort-free when each
# bucket is a single file; multi-file buckets re-sort locally — still no
# exchange). 128 buckets at sf100 ≈ 129 MiB compressed per bucket = 4
# whole waves of the 32-core box; at 100 TB the same rule is
# buckets ≈ table_bytes / 128 MiB rounded to a wave multiple.
SPECS = [
    ("lineitem", ["l_orderkey"], ["l_orderkey"]),
    ("orders", ["o_orderkey"], ["o_orderkey"]),
]


def _get_spark():
    return get_spark(
        "probe_bucketed_join",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )


def _register(
    spark, sf_dir: str, bucket_dir: str, buckets: int, single_file: bool
) -> None:
    import nhl_data_pipeline_spark.catalog as catalog
    from nhl_data_pipeline_spark.sources.bucketed import ensure_bucketed_lake

    specs = [(n, bc, buckets, sc) for n, bc, sc in SPECS]
    mapping = ensure_bucketed_lake(
        spark, sf_dir, bucket_dir, specs, single_file=single_file
    )
    for name, bc, _sc in SPECS:
        catalog.register_bucketed_layout(name, mapping[name], bc)


def _query_fn(name: str):
    from nhl_data_pipeline_spark.plans.registry import all_queries

    spec = all_queries()[name]
    return spec.bench_fn or spec.fn


def _run_metered(spark, fn, sf_dir: str) -> None:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exch = sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    )
    scans = [
        ln.strip()[:160]
        for ln in plan.splitlines()
        if "FileScan" in ln or "Scan parquet" in ln
    ]
    print(json.dumps({"exchange_hashpartitioning": n_exch, "scans": scans}))

    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
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
                    "name": s.get("name", "")[:80],
                }
            )
        )
    print(json.dumps({"wall_sec": round(wall, 3)}))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--bucket-dir", default=None)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument(
        "--mode",
        required=True,
        choices=("build", "lake", "bucketed", "check"),
    )
    ap.add_argument("--query", default="join_chain_revenue")
    ap.add_argument(
        "--single-file",
        action="store_true",
        help="one file per bucket (pre-repartitioned write): sequential "
        "cold reads + trustable write-time sort order",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra runtime conf for the probe arm (repeatable) — e.g. "
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m "
        "for the r12 lake-path SMJ->SHJ counterfactual",
    )
    args = ap.parse_args()
    if args.mode != "lake" and not args.bucket_dir:
        ap.error(f"--bucket-dir required for mode {args.mode}")

    spark = _get_spark()
    import nhl_data_pipeline_spark.catalog as catalog

    if args.mode == "build":
        t0 = time.perf_counter()
        _register(spark, args.sf_dir, args.bucket_dir, args.buckets, args.single_file)
        print(
            json.dumps(
                {
                    "built": [n for n, _b, _s in SPECS],
                    "buckets": args.buckets,
                    "build_sec": round(time.perf_counter() - t0, 1),
                }
            )
        )
        return

    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)

    fn = _query_fn(args.query)
    if args.mode == "lake":
        _run_metered(spark, fn, args.sf_dir)
        return
    if args.mode == "bucketed":
        _register(spark, args.sf_dir, args.bucket_dir, args.buckets, args.single_file)
        _run_metered(spark, fn, args.sf_dir)
        return

    # check: row-exact parity between the two layouts, one session.
    base = sorted(map(tuple, fn(spark, args.sf_dir).collect()))
    _register(spark, args.sf_dir, args.bucket_dir, args.buckets, args.single_file)
    bkt = sorted(map(tuple, fn(spark, args.sf_dir).collect()))
    catalog.clear_bucketed_layout()
    print(
        json.dumps(
            {
                "query": args.query,
                "rows": len(base),
                "exact_match": base == bkt,
            }
        )
    )
    if base != bkt:
        raise SystemExit("layout changed query results — investigate")


if __name__ == "__main__":
    main()
