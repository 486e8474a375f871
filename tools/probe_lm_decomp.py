"""Decompose ngram_lm_quality's executor CPU at sf0.1 (r12 session 2).

The bench CPU meter reads 21+ CPU-s per steady-state run for a 5K-doc
corpus — this probe times each sub-plan through the noop sink with the
stage-level CPU meter to find which operator owns it. Steady state:
2 warmups then min CPU / median wall over 3 reps per sub-plan.

Usage: PYTHONPATH=. python tools/probe_lm_decomp.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        "probe_lm_decomp",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import _StageMeter  # noqa: E402

    from nhl_data_pipeline_spark.catalog import load_table
    from nhl_data_pipeline_spark.operators import lm as LM
    from nhl_data_pipeline_spark.operators.text import tokens

    meter = _StageMeter(spark)
    d = load_table(spark, SF_DIR, "documents")

    def scan():
        return d.select("doc_id", F.length("text").alias("n"))

    def tokenized():
        return d.select("doc_id", F.size(tokens(F.col("text"))).alias("n"))

    def exploded():
        return d.select(
            "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
        )

    def ngrams_win():
        return LM._ngrams(d, 3, id_col="doc_id", text_col="text")

    def gram_counts():
        return (
            LM._ngrams(d, 3, id_col="doc_id", text_col="text")
            .groupBy("gram")
            .agg(F.expr("count(1)").alias("c_tri"))
        )

    def full():
        return LM.ngram_lm_score(d, model_rows=5000)

    for name, build in (
        ("scan", scan),
        ("tokenized", tokenized),
        ("exploded", exploded),
        ("ngrams_win", ngrams_win),
        ("gram_counts", gram_counts),
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
