#!/bin/bash
# Round-5 controlled A/B for VERDICT r4 next #1: does training through the
# flash-MHSA Pallas kernel (round-4 default, ADYOLO_FLASH_MHSA=auto -> ON
# on TPU) systematically change conformer training trajectories vs plain
# XLA attention, or was the r4 200-epoch plateau (best 0.9564 @ epoch 57)
# run-to-run variance on the tiny synthetic set?
#
# Protocol: identical config/seed/dataset to the r4 quality run
# (learnable synthetic, 96 chunks x 6 iters x B=16, bf16, --augment,
# seed 7) but 80 epochs per arm — the r3/r4 trajectories already diverge
# well before epoch 57, and r4's best epoch was 57, so 80 epochs bounds
# the question at ~1/2.5 the chip time of a 200-epoch run.
#
#   nohup bash scripts/flash_ab_r5.sh > /tmp/flash_ab_r5/driver.log 2>&1 &
#
# Budgets END at epoch boundaries via the SIGTERM preemption guard
# (timeout => clean rolling ckpt => resume); never SIGKILL (chip-lease
# wedge, PLAN.md).  Extra seeds on the decided winner run separately
# (scripts are cheap; chip time is not).
set -x
cd "$(dirname "$0")/.."
OUT=/tmp/flash_ab_r5
RES=experiments/flashab
mkdir -p $OUT $RES

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
    --config_dir /tmp/learncfg4 >> $OUT/setup.log 2>&1
fi

run_arm () {  # run_arm <exp_id> <flash_env> <seed>
  local EXP=$1 FLASH=$2 SEED=$3
  local LOG=$OUT/$EXP.log
  if grep -q "ARM_DONE" $LOG 2>/dev/null; then return; fi
  for i in 1 2 3; do
    RESUME=""
    [ -d $RES/$EXP ] && RESUME="--resume_pth $EXP"
    ADYOLO_FLASH_MHSA=$FLASH timeout 5400 python -m adyolo_tpu.cli train \
      --dataset DCASE2022 --encoder resnet-conformer --loss adyolo \
      --augment --seed $SEED --nb_epochs 80 --exp_id $EXP \
      --config_dir /tmp/learncfg4 --results_dir $RES \
      $RESUME >> $LOG 2>&1
    rc=$?
    echo "== attempt $i rc=$rc" >> $LOG
    [ $rc -eq 0 ] && break
    sleep 10
  done
  echo "ARM_DONE rc=$rc" >> $LOG
}

run_arm flash-on-s7  1 7
run_arm flash-off-s7 0 7
echo AB_BOTH_ARMS_DONE | tee -a $OUT/driver_status.log
