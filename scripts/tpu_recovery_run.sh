#!/bin/sh
# One-shot TPU measurement pass for the changes that landed while the
# chip lease was wedged (run from the repo root as soon as
# `timeout 60 python -c "import jax; print(jax.devices())"` succeeds):
#
#   1. bench.py           — validates the packed-resident SE-ResNet stages
#                           (commit 699dcc1, expected ~+6 ms/step) and the
#                           time-packed conformer stem convs in the
#                           headline/train/conformer lines
#   2. conv_bench --strided — per-conv plain vs time-packed numbers for
#                           the stem 7x7 and layer-1 entry (decides the
#                           ResNetConformer time_pack default)
#   3. prof_step          — per-op attribution of the bf16 train step
#
# Each step appends to its own log; the script survives individual
# failures so a mid-run wedge still leaves the earlier numbers on disk.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_recovery
# --all now includes the A/B variant configs (train-bf16-nopack,
# train-conformer-bf16-noflash, train-conformer-bf16-timepack) in
# their own worker subprocesses — no separate env'd runs needed
timeout 5400 python bench.py --all   > /tmp/tpu_recovery/bench.log 2>&1
timeout 1800 python scripts/conv_bench.py --strided \
                                     > /tmp/tpu_recovery/conv_strided.log 2>&1
timeout 1800 python scripts/prof_step.py \
                                     > /tmp/tpu_recovery/prof_step.log 2>&1
# fused MHSA kernel: exactness + PRNG stats + microbench
timeout 1800 python scripts/flash_check.py \
                                     > /tmp/tpu_recovery/flash_check.log 2>&1
# packed-resident conformer layer1 interior (default OFF until this run)
ADYOLO_CONF_PACKED=1 timeout 1800 python bench.py --config train-conformer-bf16 \
                                     > /tmp/tpu_recovery/ab_confpacked.log 2>&1
tail -n 40 /tmp/tpu_recovery/*.log
