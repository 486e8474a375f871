#!/bin/bash
set -euo pipefail
cd /root/repo
# wait for sf100 generation to finish
while ! grep -q "^EXIT=" /tmp/gen_sf100b.log 2>/dev/null; do sleep 30; done
grep -q "^EXIT=0" /tmp/gen_sf100b.log || { echo "GENERATION FAILED"; exit 1; }
echo "=== generation done $(date -u +%H:%M:%S) ==="
# Block B: fourth decade, 3 legs per side, full query set
bash tools/run_sweep_legs.sh r10 3 "sf10 sf30"
echo "=== block B done $(date -u +%H:%M:%S) ==="
# Block C: fifth decade, 2 subset legs per side
bash tools/run_sf100_sweep.sh r10 2
echo "=== block C done $(date -u +%H:%M:%S) ==="
