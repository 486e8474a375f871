#!/bin/bash
# Fifth-decade targeted sweep (r10, VERDICT r9 ask #6): sf30 → sf100
# (~22 GB lineitem, 600M rows) for the five scale-critical queries only
# — join_chain, topk, jaccard, minhash, kmeans×LSH — at N legs per side
# with the standard protocol (fresh JVM per leg, writeback-draining
# settle, leg-matched anchors, per-query executor-CPU totals).
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

TAG="${1:-r10}"
LEGS="${2:-2}"
ONLY="join_chain_revenue,topk_customers_by_revenue,dedup_ngram_jaccard,dedup_minhash_lsh,kmeans_semantic_dedup"
LOGDIR="bench_logs/${TAG}"
mkdir -p "$LOGDIR"

settle() { # same dirty-draining settle as run_sweep_legs.sh
  sync
  for _ in $(seq 1 60); do
    dirty_kb=$(awk '/^Dirty:/ {print $2}' /proc/meminfo)
    [ "${dirty_kb:-0}" -lt 65536 ] && break
    sleep 5
  done
  sleep 15
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

for sf in sf30 sf100; do
  [ -d ".testdata/${sf}" ] || { echo "missing .testdata/${sf}"; exit 1; }
done

for sf in sf30 sf100; do
  for leg in $(seq 1 "$LEGS"); do run_leg "$sf" ".testdata/${sf}" "$leg"; done
done

legs_of() {
  local files=""
  for leg in $(seq 1 "$LEGS"); do
    files="$files ${LOGDIR}/bench_${TAG}_$1sub_leg${leg}.out"
  done
  echo "$files"
}

python tools/sf1_sweep.py --base $(legs_of sf30) --big $(legs_of sf100) \
  -o "BENCH_${TAG}_sf100_sweep.json"
echo "DONE: BENCH_${TAG}_sf100_sweep.json"
