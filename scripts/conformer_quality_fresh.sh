#!/bin/bash
# Fresh full-length (200-epoch) conformer quality run on the learnable
# synthetic set — the round-3 run reached val SELD 0.9304 @ epoch 134 and
# was still improving at its 4-h cutoff; its /tmp checkpoints did not
# survive the machine restart, so this regenerates everything and runs
# the complete protocol from scratch (now on the faster post-sprint step).
#
#   nohup bash scripts/conformer_quality_fresh.sh &
#
# End at an epoch boundary: `timeout` sends SIGTERM, which the preemption
# guard turns into a clean rolling checkpoint; never SIGKILL (chip-lease
# wedge, see PLAN.md).  The retry loop resumes from the rolling ckpt.
set -x
cd "$(dirname "$0")/.."

if [ ! -f /tmp/learn3/classes.txt ]; then
  python - <<'EOF'
from tests.synth_seld import make_learnable_dataset
make_learnable_dataset('/tmp/learn3', n_train=96)
print('learnable dataset written')
EOF
fi

if [ ! -d /tmp/learncfg3 ]; then
  mkdir -p /tmp/learncfg3
  cp configs/*.yaml /tmp/learncfg3/
  sed -i "s|data_pth:.*|data_pth: '/tmp/learn3/'|; s|name_pth:.*|name_pth: '/tmp/learn3/classes.txt'|" \
      /tmp/learncfg3/hyp_data_DCASE2022.yaml
  sed -i "s|nb_iters:.*|nb_iters: 6|; s|compute_dtype:.*|compute_dtype: 'bfloat16'|" \
      /tmp/learncfg3/hyp_train.yaml
fi

if [ ! -f /tmp/learn3/scaler_wts.pkl ]; then
  python -m adyolo_tpu.cli preprocess scaler --dataset DCASE2022 \
    --config_dir /tmp/learncfg3 >> /tmp/learnrun3_fresh.log 2>&1
fi

mkdir -p /tmp/learnres3
for i in 1 2 3; do
  RESUME=""
  [ -d /tmp/learnres3/learn-conf3 ] && RESUME="--resume_pth learn-conf3"
  timeout 16200 python -m adyolo_tpu.cli train \
    --dataset DCASE2022 --encoder resnet-conformer --loss adyolo \
    --augment --seed 7 --exp_id learn-conf3 \
    --config_dir /tmp/learncfg3 --results_dir /tmp/learnres3 \
    $RESUME >> /tmp/learnrun3_fresh.log 2>&1
  rc=$?
  echo "== attempt $i rc=$rc" >> /tmp/learnrun3_fresh.log
  [ $rc -eq 0 ] && break
  sleep 10
done
grep -E "best|epoch result" /tmp/learnrun3_fresh.log | tail -20
