"""One-session A/B of curation_pipeline's scored-branch shape (r12 probe).

The r12 restructure drops the dead lang join and rides n_removed through
the scoring projection (plans/q_text.py::curation_pipeline). Wall-clock
A/B across JVMs at sf0.1 sits inside box noise, so this probe runs BOTH
shapes alternately in ONE session and reports per-run wall plus the
deterministic discriminators — total input bytes (the duplicate-scan
branches) and executor CPU — summed over each run's new stages.

Usage: python tools/probe_curation_ab.py [--sf-dir DIR] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402
from nhl_data_pipeline_spark.catalog import load_table  # noqa: E402
from nhl_data_pipeline_spark.operators import lines as L  # noqa: E402
from nhl_data_pipeline_spark.plans import q_text as QT  # noqa: E402


def old_shape(spark, sf_dir):
    """The pre-r12 composition: lang join + separate n_removed join."""
    d0 = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    dirty = d0.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat_ws("\n", "text", F.lit(QT._CURATION_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    stripped = L.strip_frequent_lines(dirty, 50)
    d = stripped.join(d0.select("doc_id", "lang"), "doc_id")
    scored = QT._lang_quality_scored(d).join(
        stripped.select("doc_id", "n_removed"), "doc_id"
    )
    drop_docs = (
        QT.dedup_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        scored.filter((F.col("lang_hat") == "en") & (F.col("quality") >= 0.75))
        .join(drop_docs, "doc_id", "left_anti")
        .select("doc_id", "lang_hat", "quality", "n_removed")
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(
        "probe_curation_ab",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )

    def stages():
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        with urllib.request.urlopen(
            base + "/stages?status=complete", timeout=30
        ) as r:
            return {s["stageId"]: s for s in json.loads(r.read())}

    shapes = {
        "old": lambda: old_shape(spark, args.sf_dir),
        "new": lambda: QT.curation_pipeline(spark, args.sf_dir),
    }
    # warm both shapes once (JIT, file listing, shuffle dirs)
    for tag, build in shapes.items():
        build().write.format("noop").mode("overwrite").save()

    for rep in range(args.reps):
        for tag, build in shapes.items():
            before = stages()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            after = stages()
            new = [s for sid, s in after.items() if sid not in before]
            print(
                json.dumps(
                    {
                        "rep": rep,
                        "shape": tag,
                        "wall_sec": round(wall, 3),
                        "cpu_sec": round(
                            sum(s.get("executorCpuTime", 0) for s in new)
                            / 1e9,
                            2,
                        ),
                        "input_mb": round(
                            sum(s.get("inputBytes", 0) for s in new) / 2**20,
                            1,
                        ),
                        "shuffle_write_mb": round(
                            sum(s.get("shuffleWriteBytes", 0) for s in new)
                            / 2**20,
                            1,
                        ),
                        "stages": len(new),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
