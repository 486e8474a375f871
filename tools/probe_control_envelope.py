"""What does the stateless control's own exponent measure? (r12, VERDICT
r11 ask #3.)

The sweep artifacts judge stateful queries' cpu_exponents against the
stateless controls (text_profile, pricing_summary) — but the controls'
own readings move with decade and protocol (cold r11: cpu_exp 1.16-1.19
at sf10→sf30 yet 0.93-1.01 at sf30→sf100; warm r10: 1.33). Before the
controls can acquit anyone, their own exponent needs an explanation.

Hypothesis under test: the inflation is per-row ON-CPU MEMORY-STALL
cycles (32 threads contending for DRAM as the per-wave working set
outgrows cache reuse), not per-row work growth. Discriminator: run the
same control query at the same decade with 4 threads vs 32 threads in
separate JVMs and compare executor-CPU-per-input-byte:

  - contention  → per-byte CPU flat at 4 threads across decades, inflated
                  at 32 threads on the decade step where the envelope moves;
  - work growth → per-byte CPU inflates at BOTH widths (the rows
                  themselves got more expensive);
  - harness     → neither inflates (the sweep accounting, e.g. warmup
                  reps, owns the delta).

One JSON line per (sf, threads) leg; each leg is a fresh subprocess JVM
(SPARK_GRAFT_CPUS is honored only at JVM launch). Page cache is NOT
dropped here — every bench rep after warmup runs page-cached anyway, so
the per-rep regime this reproduces is the measured-rep regime of the
sweeps. Probe only; not a timed artifact.

Usage:
  python tools/probe_control_envelope.py --query text_profile \
      --sf-dirs .testdata/sf10 .testdata/sf30 .testdata/sf100 \
      --threads 4 32
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from nhl_data_pipeline_spark.session import get_spark
spark = get_spark("probe_control_envelope", extra_conf={{
    "spark.ui.enabled": "true", "spark.ui.retainedStages": "50000"}})
from nhl_data_pipeline_spark.plans.registry import all_queries
spec = all_queries()[{query!r}]
fn = spec.bench_fn or spec.fn
# one warmup (codegen/JIT), then the measured run
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
base = (f"{{spark.sparkContext.uiWebUrl}}/api/v1/applications/"
        f"{{spark.sparkContext.applicationId}}")
def stage_totals():
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    with urllib.request.urlopen(base + "/stages?status=complete",
                                timeout=30) as r:
        ss = json.loads(r.read())
    return (sum(s.get("executorCpuTime", 0) for s in ss) / 1e9,
            sum(s.get("executorRunTime", 0) for s in ss) / 1e3,
            sum(s.get("inputBytes", 0) for s in ss))
c0, r0, i0 = stage_totals()
t0 = time.perf_counter()
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
c1, r1, i1 = stage_totals()
print("RESULT " + json.dumps({{
    "query": {query!r}, "sf_dir": {sf_dir!r}, "threads": {threads},
    "wall_sec": round(wall, 3), "cpu_sec": round(c1 - c0, 2),
    "run_sec": round(r1 - r0, 2), "input_gb": round((i1 - i0) / 2**30, 3),
    "cpu_us_per_mb": round((c1 - c0) * 1e6 / max((i1 - i0) / 2**20, 1), 1),
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", default="text_profile")
    ap.add_argument("--sf-dirs", nargs="+", required=True)
    ap.add_argument("--threads", nargs="+", type=int, default=[4, 32])
    args = ap.parse_args()

    for sf_dir in args.sf_dirs:
        for th in args.threads:
            code = _CHILD.format(
                repo=str(REPO),
                query=args.query,
                sf_dir=sf_dir,
                threads=th,
            )
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(th))
            out = subprocess.run(
                [sys.executable, "-c", code],
                env=env,
                cwd=REPO,
                capture_output=True,
                text=True,
                check=False,
            )
            for ln in out.stdout.splitlines():
                if ln.startswith("RESULT "):
                    print(ln[len("RESULT "):], flush=True)
                    break
            else:
                print(
                    json.dumps(
                        {
                            "sf_dir": sf_dir,
                            "threads": th,
                            "error": out.stderr.strip()[-400:],
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
