#!/usr/bin/env bash
# dVAE reconstruction evaluation (reference test_dvae.sh pointed at a stale
# config path; this one works)
set -e
python main_autoencoder.py --config cfgs/autoencoder/act_dvae_with_pretrained_transformer.yaml --test --ckpts "${1:?usage: test_dvae.sh <ckpt>}" --exp_name test_dvae "${@:2}"
