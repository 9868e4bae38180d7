#!/bin/bash
# Round-4 close-out benches: waits for the conformer quality run to
# release the single-tenant chip (QUALITY_RUN_DONE in its log), then
# measures the four judged default lines fresh plus the headline-bf16
# serving A/B (bench.py's ADYOLO_SERVE_DTYPE worker line).  Logs land in
# benchlogs/ for in-repo provenance (ADVICE r3).
set -x
cd "$(dirname "$0")/.."
QLOG=${QLOG:-/tmp/learnrun4.log}
LOG=benchlogs/bench_r4_close.log
while ! grep -q QUALITY_RUN_DONE "$QLOG"; do sleep 60; done
sleep 30   # let the exporting python exit fully (chip lease)
: > $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "== defaults rc=$?" >> $LOG
timeout 900 python bench.py --config headline-bf16 >> $LOG 2>&1
echo "== headline-bf16 rc=$?" >> $LOG
echo R4_CLOSE_DONE >> $LOG
