#!/bin/bash
# Round-5 chip-window work: runs the queued measurements the moment the
# flash A/B arms free the chip (watches for AB_BOTH_ARMS_DONE).  Keep
# each item timeout-bounded and SIGTERM-clean (chip-lease wedge rules).
#
#   nohup bash scripts/r5_chip_window.sh > /tmp/r5_window.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while ! grep -q AB_BOTH_ARMS_DONE /tmp/flash_ab_r5/driver_status.log 2>/dev/null; do
  sleep 60
done
echo "chip window open: $(date -u)"

# 1. flash-kernel tuning sweep (bq x dropout) — feeds the MFU sprint
timeout 1800 python scripts/flash_tune_bench.py \
  > benchlogs/flash_tune_r5.log 2>&1
echo "== flash_tune rc=$?"

# 2. bf16 serving parity on the non-degenerate golden model (VERDICT #5)
timeout 1800 python scripts/bf16_parity_r5.py \
  > benchlogs/bf16_serving_parity_r5.log 2>&1
echo "== bf16_parity rc=$?"

# 3. fresh conformer per-op attribution at round-5 defaults (VERDICT #2)
timeout 1800 python scripts/prof_step.py --encoder resnet-conformer \
  --dtype bfloat16 --top 60 > benchlogs/prof_conformer_r5.log 2>&1
echo "== prof_step rc=$?"

# 4. all BASELINE.json configs in committed provenance (VERDICT #3):
#    judged group + baseline group + A/B lines
ADYOLO_BENCH_BUDGET=3600 timeout 3900 python bench.py --all \
  > benchlogs/bench_r5_all.log 2>&1
echo "== bench_all rc=$?"

echo R5_WINDOW_DONE | tee -a /tmp/flash_ab_r5/driver_status.log
