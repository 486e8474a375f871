"""Why is the columnar cache build so expensive? (r12 session 2)

probe_lm_decomp2: lm WITH persists = 13-19 executor-CPU-s per run, without
= 1.5. This probe A/Bs the cache knobs on the identical persisted shape to
attribute the cost: compression on/off, batch size, storage level.

Usage: PYTHONPATH=. python tools/probe_cache_cost.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        "probe_cache_cost",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    from bench import _StageMeter  # noqa: E402

    from nhl_data_pipeline_spark.catalog import load_table
    from nhl_data_pipeline_spark.operators.lm import _ngrams

    meter = _StageMeter(spark)
    d = load_table(spark, SF_DIR, "documents")

    def run_case(tag: str, conf: dict[str, str], level=None):
        for k, v in conf.items():
            spark.conf.set(k, v)
        walls, cpus = [], []
        for i in range(5):
            spark.catalog.clearCache()
            tri = _ngrams(d, 3, id_col="doc_id", text_col="text")
            tri = tri.persist(level) if level else tri.persist()
            mark = meter.snap()
            t0 = time.perf_counter()
            # two consumers, like the real query
            tri.groupBy("gram").agg(F.expr("count(1)").alias("c")).write.format(
                "noop"
            ).mode("overwrite").save()
            tri.selectExpr("doc_id", "xxhash64(gram) AS gk").write.format(
                "noop"
            ).mode("overwrite").save()
            w = time.perf_counter() - t0
            delta = meter.since(mark)
            if i >= 2:
                walls.append(round(w, 3))
                cpus.append(round(delta["cpu_sec"], 3) if delta else -1)
        for k in conf:
            spark.conf.unset(k)
        print(
            json.dumps(
                {
                    "case": tag,
                    "wall_med": sorted(walls)[1],
                    "cpu_min": min(cpus),
                    "cpus": cpus,
                }
            )
        )
        sys.stdout.flush()

    run_case("persist_default", {})
    run_case(
        "compressed_off",
        {"spark.sql.inMemoryColumnarStorage.compressed": "false"},
    )
    run_case(
        "batch_100k",
        {"spark.sql.inMemoryColumnarStorage.batchSize": "100000"},
    )
    run_case(
        "comp_off_batch_100k",
        {
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.sql.inMemoryColumnarStorage.batchSize": "100000",
        },
    )
    run_case("memory_only", {}, level=StorageLevel.MEMORY_ONLY)
    # no persist at all, for the floor
    walls, cpus = [], []
    for i in range(5):
        spark.catalog.clearCache()
        tri = _ngrams(d, 3, id_col="doc_id", text_col="text")
        mark = meter.snap()
        t0 = time.perf_counter()
        tri.groupBy("gram").agg(F.expr("count(1)").alias("c")).write.format(
            "noop"
        ).mode("overwrite").save()
        tri.selectExpr("doc_id", "xxhash64(gram) AS gk").write.format(
            "noop"
        ).mode("overwrite").save()
        w = time.perf_counter() - t0
        delta = meter.since(mark)
        if i >= 2:
            walls.append(round(w, 3))
            cpus.append(round(delta["cpu_sec"], 3) if delta else -1)
    print(
        json.dumps(
            {
                "case": "no_persist",
                "wall_med": sorted(walls)[1],
                "cpu_min": min(cpus),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
