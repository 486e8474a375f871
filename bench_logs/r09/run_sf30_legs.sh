#!/bin/bash
# Fourth-decade legs (r9): 2 × sf30 under the quiet-window protocol
# (settle sleep before each leg, min-of-5 anchors, per-rep times,
# candidate counts). Base side = the committed sf10 legs from the same
# boot's earlier quiet window; normalization is per-leg-anchor, so the
# pairing is disclosed in the method string rather than re-measured.
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
run .testdata/sf30 bench_r09_sf30_leg1
run .testdata/sf30 bench_r09_sf30_leg2
python tools/sf1_sweep.py \
  --base $LOG/bench_r09_sf10_leg1.out $LOG/bench_r09_sf10_leg2.out \
  --big $LOG/bench_r09_sf30_leg1.out $LOG/bench_r09_sf30_leg2.out \
  -o BENCH_r09_sf30_sweep.json
echo "DONE sf30 sweep"
