#!/bin/bash
# Round-5 follow-up to scripts/flash_ab_r5.sh: extra seeds on the decided
# winner (VERDICT r4 next #1 asks for >=2 extra seeds), to separate
# run-to-run variance from a systematic flash-dropout trajectory effect.
#
#   nohup bash scripts/flash_seeds_r5.sh <flash_env 0|1> [epochs] &
#
# Reuses the dataset/config the A/B arms used.
set -x
cd "$(dirname "$0")/.."
FLASH=${1:?flash env (0|1) required}
EPOCHS=${2:-80}
OUT=/tmp/flash_ab_r5
RES=experiments/flashab

run_arm () {  # run_arm <exp_id> <seed>
  local EXP=$1 SEED=$2
  local LOG=$OUT/$EXP.log
  if grep -q "ARM_DONE" $LOG 2>/dev/null; then return; fi
  for i in 1 2 3; do
    RESUME=""
    [ -d $RES/$EXP ] && RESUME="--resume_pth $EXP"
    ADYOLO_FLASH_MHSA=$FLASH timeout 5400 python -m adyolo_tpu.cli train \
      --dataset DCASE2022 --encoder resnet-conformer --loss adyolo \
      --augment --seed $SEED --nb_epochs $EPOCHS --exp_id $EXP \
      --config_dir /tmp/learncfg4 --results_dir $RES \
      $RESUME >> $LOG 2>&1
    rc=$?
    echo "== attempt $i rc=$rc" >> $LOG
    [ $rc -eq 0 ] && break
    sleep 10
  done
  echo "ARM_DONE rc=$rc" >> $LOG
}

run_arm flash-$FLASH-s11 11
run_arm flash-$FLASH-s23 23
echo SEEDS_DONE_flash$FLASH | tee -a $OUT/driver_status.log
