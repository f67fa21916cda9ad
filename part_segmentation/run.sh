#!/usr/bin/env bash
# ShapeNetPart training from a pretrained student (reference part_segmentation/run.sh)
set -e
cd "$(dirname "$0")/.."
python part_segmentation/main.py --ckpts "${1:?usage: run.sh <pretrain ckpt>}" "${@:2}"
