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
timeout 3600 python bench.py --all   > /tmp/tpu_recovery/bench.log 2>&1
# A/B the two unmeasured defaults (env read at import; bench workers are
# fresh processes, so the toggle reaches them)
ADYOLO_PACKED_STAGES=0 timeout 1800 python bench.py --config train-bf16 \
                                     > /tmp/tpu_recovery/ab_nopack.log 2>&1
ADYOLO_TIME_PACK=0 timeout 1800 python bench.py --config train-conformer-bf16 \
                                     > /tmp/tpu_recovery/ab_notimepack.log 2>&1
timeout 1800 python scripts/conv_bench.py --strided \
                                     > /tmp/tpu_recovery/conv_strided.log 2>&1
timeout 1800 python scripts/prof_step.py \
                                     > /tmp/tpu_recovery/prof_step.log 2>&1
# fused MHSA kernel: exactness + PRNG stats + microbench, then an A/B of
# the conformer train line with the kernel disabled
timeout 1800 python scripts/flash_check.py \
                                     > /tmp/tpu_recovery/flash_check.log 2>&1
ADYOLO_FLASH_MHSA=0 timeout 1800 python bench.py --config train-conformer-bf16 \
                                     > /tmp/tpu_recovery/ab_noflash.log 2>&1
tail -n 40 /tmp/tpu_recovery/*.log
