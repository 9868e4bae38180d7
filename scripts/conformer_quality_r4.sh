#!/bin/bash
# Round-4 full-length (200-epoch) conformer quality run on the learnable
# synthetic set.  Differences from conformer_quality_fresh.sh (r3):
#   * results live under the REPO (experiments/) — the r3 run's /tmp
#     checkpoints were lost to a machine restart (VERDICT r3 weak #3);
#   * runs on the post-A/B conformer defaults (whatever bench.py decided
#     at round-4 start — see PLAN.md "Round 4 — A/B decisions");
#   * exports the best checkpoint as a serving artifact at the end.
#
#   nohup bash scripts/conformer_quality_r4.sh &
#
# End at an epoch boundary: `timeout` sends SIGTERM, which the preemption
# guard turns into a clean rolling checkpoint; never SIGKILL (chip-lease
# wedge, see PLAN.md).  The retry loop resumes from the rolling ckpt.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/learnrun4.log
RES=experiments
EXP=learn-conf4

if [ ! -f /tmp/learn4/classes.txt ]; then
  python - <<'EOF'
from tests.synth_seld import make_learnable_dataset
make_learnable_dataset('/tmp/learn4', n_train=96)
print('learnable dataset written')
EOF
fi

if [ ! -d /tmp/learncfg4 ]; then
  mkdir -p /tmp/learncfg4
  cp configs/*.yaml /tmp/learncfg4/
  sed -i "s|data_pth:.*|data_pth: '/tmp/learn4/'|; s|name_pth:.*|name_pth: '/tmp/learn4/classes.txt'|" \
      /tmp/learncfg4/hyp_data_DCASE2022.yaml
  sed -i "s|nb_iters:.*|nb_iters: 6|; s|compute_dtype:.*|compute_dtype: 'bfloat16'|" \
      /tmp/learncfg4/hyp_train.yaml
fi

if [ ! -f /tmp/learn4/scaler_wts.pkl ]; then
  python -m adyolo_tpu.cli preprocess scaler --dataset DCASE2022 \
    --config_dir /tmp/learncfg4 >> $LOG 2>&1
fi

mkdir -p $RES
# per-attempt budget: 3 x 5400 s = 4.5 h cap for the whole run
for i in 1 2 3; do
  RESUME=""
  [ -d $RES/$EXP ] && RESUME="--resume_pth $EXP"
  timeout 5400 python -m adyolo_tpu.cli train \
    --dataset DCASE2022 --encoder resnet-conformer --loss adyolo \
    --augment --seed 7 --exp_id $EXP \
    --config_dir /tmp/learncfg4 --results_dir $RES \
    $RESUME >> $LOG 2>&1
  rc=$?
  echo "== attempt $i rc=$rc" >> $LOG
  [ $rc -eq 0 ] && break
  sleep 10
done

# serving export of the trained best checkpoint (VERDICT r3 next #3)
if [ -f $RES/$EXP/model_best.ckpt ]; then
  timeout 1800 python -m adyolo_tpu.cli export \
    --eval_pth $EXP --results_dir $RES --config_dir /tmp/learncfg4 \
    >> $LOG 2>&1
  echo "== export rc=$?" >> $LOG
fi
grep -E "best|epoch result|export" $LOG | tail -25
# the done marker must land in $LOG — that's the file waiters
# (scripts/r4_close_bench.sh) grep for, not this script's stdout
echo QUALITY_RUN_DONE | tee -a $LOG
