#!/bin/sh
# Experiment shell (reference: run.sh:1-4): train the flagship
# SE-ResNet34 + AD-YOLO configuration on all three DCASE datasets with
# augmentation and structured logging.
python -m adyolo_tpu.cli train --dataset DCASE2020 --encoder se-resnet34 --loss adyolo --logger --augment
python -m adyolo_tpu.cli train --dataset DCASE2021 --encoder se-resnet34 --loss adyolo --logger --augment
python -m adyolo_tpu.cli train --dataset DCASE2022 --encoder se-resnet34 --loss adyolo --logger --augment
