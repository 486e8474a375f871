"""Decompose curation_pipeline's executor CPU at sf0.1 (r12 session 2).

After the persist removal, curation still reads ~40+ executor-CPU-s per
run at sf0.1 while its jaccard sub-plan alone is ~12. This probe times
each composed stage through the noop sink with the stage-level CPU meter:

- strip       — strip_frequent_lines(dirty, 50) alone;
- scored      — the lang/quality scoring over the stripped text;
- jaccard     — the embedded dedup_ngram_jaccard drop-list;
- full        — the composed query (= the benched plan).

Usage: PYTHONPATH=. python tools/probe_curation_decomp.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        "probe_curation_decomp",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    from bench import _StageMeter  # noqa: E402

    from nhl_data_pipeline_spark.catalog import load_table
    from nhl_data_pipeline_spark.operators import lines as L
    from nhl_data_pipeline_spark.plans import q_text as Q

    meter = _StageMeter(spark)

    def dirty():
        d0 = load_table(spark, SF_DIR, "documents").repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
        return d0.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat_ws("\n", "text", F.lit(Q._CURATION_BOILER)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )

    def strip():
        return L.strip_frequent_lines(dirty(), 50)

    def scored():
        return Q._lang_quality_scored(strip(), passthrough=("n_removed",))

    def jaccard():
        return Q.dedup_ngram_jaccard(spark, SF_DIR)

    def full():
        return Q.curation_pipeline(spark, SF_DIR)

    for name, build in (
        ("dirty", dirty),
        ("strip", strip),
        ("scored", scored),
        ("jaccard", jaccard),
        ("full", full),
    ):
        walls, cpus = [], []
        for i in range(5):
            spark.catalog.clearCache()
            mark = meter.snap()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            delta = meter.since(mark)
            if i >= 2:
                walls.append(round(w, 3))
                cpus.append(round(delta["cpu_sec"], 3) if delta else -1)
        print(
            json.dumps(
                {
                    "step": name,
                    "wall_med": sorted(walls)[1],
                    "cpu_min": min(cpus),
                    "walls": walls,
                    "cpus": cpus,
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
