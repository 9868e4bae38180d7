#!/bin/bash
# Continue the round-3 conformer quality run (val SELD 0.9304 @ epoch 134,
# still improving at its 4-h cutoff) from its rolling checkpoint toward
# the full 200-epoch protocol.  Run from the repo root on a healthy chip,
# AFTER scripts/tpu_recovery_run.sh.
#
#   nohup sh scripts/conformer_quality_resume.sh &
#
# Budget: ~2 h for the remaining ~65 epochs (epoch ~1.8 min; the fused
# MHSA kernel should shorten it).  End at an epoch boundary: deliver
# SIGTERM from a shell to trigger the preemption checkpoint, do NOT
# SIGKILL (chip-lease wedge).  Needs /tmp/learnres3 + /tmp/learncfg3 +
# /tmp/learn3 from the original run (regenerate with tests/synth_seld.py
# make_learnable_dataset('/tmp/learn3', n_train=96) + config sed if gone).
set -x
cd "$(dirname "$0")/.."
for i in 1 2 3; do
  timeout 9000 python -m adyolo_tpu.cli train \
    --dataset DCASE2022 --encoder resnet-conformer --loss adyolo \
    --augment --seed 7 --exp_id learn-conf3 \
    --config_dir /tmp/learncfg3 --results_dir /tmp/learnres3 \
    --resume_pth learn-conf3 >> /tmp/learnrun3_resume.log 2>&1
  rc=$?
  echo "== attempt $i rc=$rc" >> /tmp/learnrun3_resume.log
  [ $rc -eq 0 ] && break
  sleep 10
done
grep -E "best|epoch result" /tmp/learnrun3_resume.log | tail -20
