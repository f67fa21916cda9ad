#!/usr/bin/env bash
# S3DIS training from a pretrained student (reference semantic_segmentation/run.sh)
set -e
cd "$(dirname "$0")/.."
python semantic_segmentation/main.py --ckpts "${1:?usage: run.sh <pretrain ckpt>}" "${@:2}"
