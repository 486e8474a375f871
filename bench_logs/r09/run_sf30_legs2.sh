#!/bin/bash
# Fourth-decade legs 3/4 (r9): re-run after the whole-wave scan-split +
# spill-gated width fixes (commit fefebed). Same quiet-window protocol;
# legs 1/2 (pre-fix engine) stay committed as the defect evidence.
set -euo pipefail
cd "$(dirname "$0")/../.."
LOG=bench_logs/r09
run() {
  sync; sleep 45
  echo ">>> $(date -u +%H:%M:%S) $2"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_SKIP_PROBES=1 SPARK_GRAFT_COUNTS=1 \
    python bench.py 2>"$LOG/$2.err" | tr '\r' '\n' > "$LOG/$2.out"
  tail -1 "$LOG/$2.out" | python -c 'import json,sys; d=json.loads(sys.stdin.read()); print("    total=%ss anchor=%s" % (d["value"], d["anchor_sec"]))'
}
run .testdata/sf30 bench_r09_sf30_leg3
run .testdata/sf30 bench_r09_sf30_leg4
# Base side: the committed sf10 legs. They predate commit fefebed, which
# is a plan NO-OP at sf10 by construction: fact_shuffle_width returns
# None below the spill gate (1.4 GB lineitem / 64 partitions << 128 MiB
# per task) and tune_scan_splits computes Spark's own bytes-per-core
# split there (at most a one-task ceil-vs-floor difference).
python tools/sf1_sweep.py \
  --base $LOG/bench_r09_sf10_leg1.out $LOG/bench_r09_sf10_leg2.out \
  --big $LOG/bench_r09_sf30_leg3.out $LOG/bench_r09_sf30_leg4.out \
  -o BENCH_r09_sf30_sweep.json
echo "DONE sf30 sweep v2"
