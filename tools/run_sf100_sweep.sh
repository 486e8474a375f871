#!/bin/bash
# Fifth-decade targeted sweep (r10, VERDICT r9 ask #6): sf30 → sf100
# (~22 GB lineitem, 600M rows) for the five scale-critical queries
# — join_chain, topk, jaccard, minhash, kmeans×LSH — at N legs per side
# with the standard protocol (fresh JVM per leg, cold-cache settle,
# leg-matched anchors, per-query executor-CPU totals).
#
# r11 changes (VERDICT r10 asks #2/#3):
# - the subset now INCLUDES the stateless CPU controls (text_profile +
#   pricing_summary), so the memory-stall envelope that cpu_exponent
#   readings are judged against is measured in the SAME artifact and
#   the SAME memory regime it is applied to — r10 borrowed the sf30
#   control for sf100 judgments;
# - settle() now DROPS THE PAGE CACHE (echo 3 > drop_caches) before
#   every leg on BOTH sides: r10's base/big anchors sat ~30% apart
#   because the 22 GB lake displaced the cache during big legs while
#   base legs ran warm — cold-for-cold makes the anchors measure one
#   regime (the r10 artifact carried a ±0.08 exponent uncertainty from
#   that gap). Every leg's warmup re-reads its lake from disk, which is
#   also the honest 1000-executor posture: a real cluster scan is
#   storage-cold.
#
# Both sides run the SAME SPARK_GRAFT_ONLY subset so leg counts and
# query sets match exactly; the artifact is built from the exact
# filenames this run writes. The sf100 lake comes from
#   SF1_REPLICAS=1000 python tools/gen_sf1.py /root/testdata/sf0.1 .testdata/sf100
# (fourth letter-transform family; (sign, shift) embedding transforms
# are injective to 2176 replicas at dim 64).
#
# Usage: bash tools/run_sf100_sweep.sh [round_tag] [legs_per_sf]
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-r11}"
LEGS="${2:-2}"
ONLY="join_chain_revenue,topk_customers_by_revenue,dedup_ngram_jaccard,dedup_minhash_lsh,kmeans_semantic_dedup,text_profile,pricing_summary"
LOGDIR="bench_logs/${TAG}"
mkdir -p "$LOGDIR"

settle() { # same cold-cache settle as run_sweep_legs.sh
  sync
  for _ in $(seq 1 60); do
    dirty_kb=$(awk '/^Dirty:/ {print $2}' /proc/meminfo)
    [ "${dirty_kb:-0}" -lt 65536 ] && break
    sleep 5
  done
  # r12 (ADVICE r11): hard failure — a cache-warm leg under a method
  # string claiming cold-for-cold is a protocol lie; see run_sweep_legs.sh.
  echo 3 > /proc/sys/vm/drop_caches 2>/dev/null || {
    echo "ERROR: drop_caches unavailable mid-run — aborting"
    exit 1
  }
  sleep 15
}

# Probe drop_caches up front (r12, ADVICE r11): refuse to run the campaign
# at all if the cold protocol is impossible in this container.
echo 3 > /proc/sys/vm/drop_caches 2>/dev/null || {
  echo "ERROR: echo 3 > /proc/sys/vm/drop_caches failed (unprivileged?)."
  echo "Cold-for-cold cannot run here; refusing to emit legs whose method"
  echo "string would claim a cache drop that never happened."
  exit 1
}

run_leg() { # sf_label sf_dir leg_idx
  local out="${LOGDIR}/bench_${TAG}_${1}sub_leg${3}.out"
  settle
  echo ">>> $(date -u +%H:%M:%S) subset leg ${3} @ ${1} -> ${out}"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_SKIP_PROBES=1 SPARK_GRAFT_COUNTS=1 \
    SPARK_GRAFT_ONLY="$ONLY" \
    python bench.py 2>"${out}.err" | tr '\r' '\n' >"$out"
  tail -1 "$out" | python -c 'import json,sys; d=json.loads(sys.stdin.read()); print("    total=%ss anchor=%s commit=%s" % (d["value"], d["anchor_sec"], d.get("engine_commit")))'
}

# r11: sf10 joins the subset campaign so the "sf10→sf30 norms unchanged"
# check (VERDICT ask #1 acceptance) is measured by the same protocol and
# engine commit as the fifth decade, in one quiet window.
for sf in sf10 sf30 sf100; do
  [ -d ".testdata/${sf}" ] || { echo "missing .testdata/${sf}"; exit 1; }
done

for sf in sf10 sf30 sf100; do
  for leg in $(seq 1 "$LEGS"); do run_leg "$sf" ".testdata/${sf}" "$leg"; done
done

legs_of() {
  local files=""
  for leg in $(seq 1 "$LEGS"); do
    files="$files ${LOGDIR}/bench_${TAG}_$1sub_leg${leg}.out"
  done
  echo "$files"
}

NOTE="cold-for-cold protocol: page cache dropped (echo 3 > drop_caches) after Dirty-drain settle before EVERY leg on both sides, so anchors and queries measure one memory regime"
python tools/sf1_sweep.py --base $(legs_of sf10) --big $(legs_of sf30) \
  --protocol-note "$NOTE" -o "BENCH_${TAG}_sf30_sweep.json"
python tools/sf1_sweep.py --base $(legs_of sf30) --big $(legs_of sf100) \
  --protocol-note "$NOTE" -o "BENCH_${TAG}_sf100_sweep.json"
echo "DONE: BENCH_${TAG}_sf30_sweep.json BENCH_${TAG}_sf100_sweep.json"
