"""Controlled timing probe for the r2 dedup bench regression.

Hypothesis under test: the 4.44 s dedup_ngram_jaccard reading in BENCH_r02's
timed loop (vs 1.74 s for the SAME query at the SAME sf in the scale probe
later in the SAME session) is an ordering artifact — it runs immediately
after the allocation-heavy text_profile — not a plan regression.

Protocol: warm everything (2 passes), then time each headline dedup-family
query 5x back-to-back, then 3x interleaved after text_profile, and print
per-run timings.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark.catalog import TABLES, load_table
from nhl_data_pipeline_spark.plans.registry import all_queries
from nhl_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["dedup_ngram_jaccard", "dedup_minhash_lsh", "curation_pipeline",
           "text_profile"]


def main() -> None:
    spark = get_spark("bench-probe")
    qs = all_queries()

    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
    for _ in range(2):
        for name in QUERIES:
            spark.catalog.clearCache()
            qs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, list[float]] = {}
    # Phase A: 5x back-to-back per query (steady-state, no noisy neighbor)
    for name in QUERIES:
        out[f"solo_{name}"] = [run(name) for _ in range(5)]
    # Phase B: jaccard immediately after text_profile, 3x (the r2 loop order)
    seq: list[float] = []
    for _ in range(3):
        run("text_profile")
        seq.append(run("dedup_ngram_jaccard"))
    out["jaccard_after_text_profile"] = seq
    print(json.dumps(out))


if __name__ == "__main__":
    main()
