"""Second-stage bisect of ngram_lm_quality's CPU blow-up (r12 session 2).

probe_lm_decomp found: ngrams 0.36 CPU-s, gram_counts 0.51 — but the full
query 14+. This probe rebuilds the full query piecewise, toggling the
persists and isolating the model/scoring/agg joins, to find the 14 CPU-s.

Usage: PYTHONPATH=. python tools/probe_lm_decomp2.py
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
        "probe_lm_decomp2",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        },
    )
    from bench import _StageMeter  # noqa: E402

    from nhl_data_pipeline_spark.catalog import load_table
    from nhl_data_pipeline_spark.operators import lm as LM
    from nhl_data_pipeline_spark.operators.lm import _ngrams, _p_fixed_expr

    meter = _StageMeter(spark)
    d = load_table(spark, SF_DIR, "documents")

    def assemble(persist_tri: bool, persist_counts: bool, stop: str):
        tri_ref = _ngrams(d, 3, id_col="doc_id", text_col="text")
        if persist_tri:
            tri_ref = tri_ref.persist()
        tri_counts = tri_ref.groupBy("gram").agg(
            F.expr("count(1)").alias("c_tri")
        )
        if persist_counts:
            tri_counts = tri_counts.persist()
        if stop == "tri_counts":
            return tri_counts
        ctx_counts = (
            tri_counts.selectExpr(
                "substring_index(gram, ' ', 2) AS ctx", "c_tri"
            )
            .groupBy("ctx")
            .agg(F.sum("c_tri").alias("c_ctx"))
        )
        v = tri_counts.selectExpr("count(1) AS v")
        model = (
            tri_counts.withColumn(
                "ctx", F.expr("substring_index(gram, ' ', 2)")
            )
            .join(ctx_counts, "ctx")
            .crossJoin(F.broadcast(v))
            .select(
                F.expr("xxhash64(gram)").alias("gk"),
                _p_fixed_expr().alias("p_fixed"),
            )
        )
        if stop == "model":
            return model
        scored = tri_ref.selectExpr("doc_id", "xxhash64(gram) AS gk").join(
            model, "gk"
        )
        if stop == "scored":
            return scored
        return scored.groupBy("doc_id").agg(
            F.expr("count(1)").alias("n_trigrams"),
            F.expr(
                "CAST(sum(p_fixed) AS DOUBLE) / CAST(count(1) AS DOUBLE)"
                f" / {float(LM.FIXED_POINT)!r}D"
            ).alias("mean_tri_prob"),
        )

    cases = [
        ("tri_counts_P", dict(persist_tri=True, persist_counts=True, stop="tri_counts")),
        ("model_P", dict(persist_tri=True, persist_counts=True, stop="model")),
        ("model_noP", dict(persist_tri=False, persist_counts=False, stop="model")),
        ("scored_P", dict(persist_tri=True, persist_counts=True, stop="scored")),
        ("scored_noP", dict(persist_tri=False, persist_counts=False, stop="scored")),
        ("full_P", dict(persist_tri=True, persist_counts=True, stop="full")),
        ("full_noP", dict(persist_tri=False, persist_counts=False, stop="full")),
        ("full_triP_only", dict(persist_tri=True, persist_counts=False, stop="full")),
        ("full_cntP_only", dict(persist_tri=False, persist_counts=True, stop="full")),
    ]
    for name, kw in cases:
        walls, cpus = [], []
        for i in range(5):
            spark.catalog.clearCache()
            mark = meter.snap()
            t0 = time.perf_counter()
            assemble(**kw).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            delta = meter.since(mark)
            if i >= 2:
                walls.append(round(w, 3))
                cpus.append(round(delta["cpu_sec"], 3) if delta else -1)
        print(
            json.dumps(
                {
                    "case": name,
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
