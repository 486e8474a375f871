#!/bin/bash
# Quiet-window scaling-sweep protocol (r9, VERDICT r8 ask #1; r10 asks
# #3/#8 + ADVICE).
#
# Runs N back-to-back bench legs per scale factor — each leg a fresh
# bench.py process (fresh JVM, its own calibration anchors, per-rep
# times AND per-query executor-CPU totals in the capture) — then builds
# the sweep artifacts with tools/sf1_sweep.py, which aggregates
# per-query minima WITH each leg's own anchor, refuses legs whose
# anchors spread >15%, refuses mixed engine commits within a side, and
# emits cpu_exponent/occupancy beside the wall exponents.
#
# MUST run alone: no concurrent Spark/pytest/duckdb (memory: concurrent
# load reads as a phantom exponent). Logs land in bench_logs/${TAG}/ and
# are committed verbatim; every artifact value traces to them.
#
# r10 changes:
# - the sweep is built from the EXACT leg files this run produced
#   (TAG × sf × 1..LEGS), never a glob — a stale leg from an aborted
#   earlier run with the same tag can no longer leak into an artifact;
# - the settle between legs is WRITEBACK-DRAINING, not fixed-time: the
#   prior JVM deletes GBs of shuffle files on exit and the r9 fixed
#   45 s was calibrated on 2.2 GB lakes — at 6.5 GB (sf30) one leg
#   still caught the transient (kmeans spread 2.04x). Now we sync and
#   poll /proc/meminfo Dirty until the page cache has actually drained
#   (< 64 MB) before starting the next leg, with a 300 s ceiling.
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-r10}"
LEGS="${2:-2}"
SF_LIST="${3:-sf0.1 sf1 sf3 sf10}"
LOGDIR="bench_logs/${TAG}"
mkdir -p "$LOGDIR"

settle() {
  # Drain dirty pages until writeback is quiescent: a time-fixed sleep
  # under-settles exactly when the previous leg was big (the r9 sf30
  # kmeans outlier). Dirty < 64 MB or 300 s, whichever first; then a
  # short fixed tail for the deleted-file flush that sync can't see.
  #
  # r11 (VERDICT r10 ask #3): then DROP THE PAGE CACHE so every leg —
  # small-sf and big-sf alike — starts in the same cold-cache regime.
  # r10's sf100 artifact measured a ~30% cross-side anchor gap (base
  # legs ran with the cache warm, big legs with 22 GB of lake displacing
  # it), which left ±0.08 of exponent uncertainty after leg-matched
  # normalization. Cold-for-cold removes the regime variable; each
  # leg's own warmup re-reads its lake (the cluster-honest posture).
  sync
  for _ in $(seq 1 60); do
    dirty_kb=$(awk '/^Dirty:/ {print $2}' /proc/meminfo)
    [ "${dirty_kb:-0}" -lt 65536 ] && break
    sleep 5
  done
  # r12 (ADVICE r11): HARD failure, not a WARN — the artifact's method
  # string claims "page cache dropped before EVERY leg", so a leg that
  # ran cache-warm would make the method string lie (the exact defect
  # class sf1_sweep's r9 rewrite exists to prevent).
  echo 3 > /proc/sys/vm/drop_caches 2>/dev/null || {
    echo "ERROR: drop_caches unavailable mid-run — aborting (the"
    echo "cold-for-cold method string must not outlive the protocol)"
    exit 1
  }
  sleep 15
}

# Probe drop_caches ONCE up front (r12, ADVICE r11): in an unprivileged
# container the cold-cache protocol is impossible — fail before burning
# hours of legs whose artifact would carry a false method string.
echo 3 > /proc/sys/vm/drop_caches 2>/dev/null || {
  echo "ERROR: echo 3 > /proc/sys/vm/drop_caches failed (unprivileged?)."
  echo "The cold-for-cold protocol cannot run here; refusing to produce"
  echo "legs whose method string would claim a cache drop that never ran."
  exit 1
}

run_leg() { # sf_label sf_dir leg_idx
  local out="${LOGDIR}/bench_${TAG}_${1}_leg${3}.out"
  settle
  echo ">>> $(date -u +%H:%M:%S) leg ${3} @ ${1} -> ${out}"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_SKIP_PROBES=1 SPARK_GRAFT_COUNTS=1 \
    python bench.py 2>"${out}.err" | tr '\r' '\n' >"$out"
  tail -1 "$out" | python -c 'import json,sys; d=json.loads(sys.stdin.read()); print("    total=%ss anchor=%s commit=%s" % (d["value"], d["anchor_sec"], d.get("engine_commit")))'
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

# Build each adjacent-pair artifact from the EXACT filenames this run
# wrote (no globs): TAG, sf label, legs 1..LEGS.
legs_of() { # sf_label
  local files=""
  for leg in $(seq 1 "$LEGS"); do
    files="$files ${LOGDIR}/bench_${TAG}_$1_leg${leg}.out"
  done
  echo "$files"
}

NOTE="cold-for-cold protocol: page cache dropped (echo 3 > drop_caches) after Dirty-drain settle before EVERY leg on both sides, so anchors and queries measure one memory regime"
prev=""
for sf in $SF_LIST; do
  if [ -n "$prev" ]; then
    python tools/sf1_sweep.py --base $(legs_of "${prev/./}") \
      --big $(legs_of "${sf/./}") --protocol-note "$NOTE" \
      -o "BENCH_${TAG}_${sf/./}_sweep.json"
  fi
  prev="$sf"
done
echo "DONE: sweep artifacts written"
