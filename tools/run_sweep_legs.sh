#!/bin/bash
# Quiet-window scaling-sweep protocol (r9, VERDICT r8 ask #1).
#
# Runs N back-to-back bench legs per scale factor — each leg a fresh
# bench.py process (fresh JVM, its own calibration anchors, per-rep
# times in the headline) — then builds the sweep artifacts with
# tools/sf1_sweep.py, which aggregates per-query minima WITH each leg's
# own anchor and refuses legs whose anchors spread >15%.
#
# MUST run alone: no concurrent Spark/pytest/duckdb (memory: concurrent
# load reads as a phantom exponent). Logs land in bench_logs/r09/ and
# are committed verbatim; every artifact value traces to them.
#
# Usage: bash tools/run_sweep_legs.sh [round_tag] [legs_per_sf] [sf_list]
#   sf_list: space-separated, default "sf0.1 sf1 sf3 sf10"; artifacts are
#   built for each adjacent pair in the list (e.g. "sf10 sf30" runs the
#   fourth-decade legs and builds BENCH_<tag>_sf30_sweep.json only).
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-r09}"
LEGS="${2:-2}"
SF_LIST="${3:-sf0.1 sf1 sf3 sf10}"
LOGDIR="bench_logs/${TAG}"
mkdir -p "$LOGDIR"

run_leg() { # sf_label sf_dir leg_idx
  local out="${LOGDIR}/bench_${TAG}_${1}_leg${3}.out"
  # Settle before each leg: the previous leg's JVM deletes GBs of
  # shuffle files on exit, and the resulting writeback burst landed
  # squarely on the next leg's anchor phase (measured r9: a 2.0×
  # anchor with NORMAL query times on the leg after a big-SF leg).
  sync; sleep 45
  echo ">>> $(date -u +%H:%M:%S) leg ${3} @ ${1} -> ${out}"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_SKIP_PROBES=1 SPARK_GRAFT_COUNTS=1 \
    python bench.py 2>"${out}.err" | tr '\r' '\n' >"$out"
  tail -1 "$out" | python -c 'import json,sys; d=json.loads(sys.stdin.read()); print("    total=%ss anchor=%s" % (d["value"], d["anchor_sec"]))'
}

for sf in $SF_LIST; do
  dir=".testdata/${sf}"; [ "$sf" = "sf0.1" ] && dir="/root/testdata/sf0.1"
  [ -d "$dir" ] || { echo "missing $dir (tools/gen_sf1.py first)"; exit 1; }
done

# All legs of one SF back-to-back, SFs ascending — anchors within a side
# come from maximally-adjacent environments.
for sf in $SF_LIST; do
  dir=".testdata/${sf}"; [ "$sf" = "sf0.1" ] && dir="/root/testdata/sf0.1"
  for leg in $(seq 1 "$LEGS"); do run_leg "${sf/./}" "$dir" "$leg"; done
done

legs_of() { ls "${LOGDIR}"/bench_"${TAG}"_"$1"_leg*.out; }

prev=""
for sf in $SF_LIST; do
  if [ -n "$prev" ]; then
    python tools/sf1_sweep.py --base $(legs_of "${prev/./}") \
      --big $(legs_of "${sf/./}") -o "BENCH_${TAG}_${sf/./}_sweep.json"
  fi
  prev="$sf"
done
echo "DONE: sweep artifacts written"
