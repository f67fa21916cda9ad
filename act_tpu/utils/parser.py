"""CLI argument parser + experiment-dir layout (reference utils/parser.py:5-117).

Flags and the ./work_dirs/<cfg-stem>/<parent>/<exp_name> convention match the
reference so existing launch scripts carry over. TPU-specific additions: --smoke
(tiny 2-step run for CI) and --mesh_model_parallel.
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True, help="yaml config file")
    parser.add_argument("--launcher", choices=["none", "pytorch", "jax"],
                        default="none", help="job launcher (kept for CLI parity)")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--deterministic", action="store_true",
                        help="fixed PRNG keys everywhere")
    parser.add_argument("--sync_bn", action="store_true",
                        help="cross-replica BatchNorm stats (no-op: GSPMD "
                             "batch sharding already computes global-batch "
                             "statistics under jit)")
    parser.add_argument("--exp_name", type=str, default="default")
    parser.add_argument("--start_ckpts", type=str, default=None)
    parser.add_argument("--ckpts", type=str, default=None)
    parser.add_argument("--val_freq", type=int, default=1)
    parser.add_argument("--loss", type=str, default="cd1",
                        help="loss name (kept for CLI parity; unused by the "
                             "shipped pipelines, like the reference)")
    parser.add_argument("--vote", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--val", action="store_true")
    parser.add_argument("--finetune_model", action="store_true")
    parser.add_argument("--scratch_model", action="store_true")
    parser.add_argument("--mode", choices=["easy", "median", "hard", None],
                        default=None)
    parser.add_argument("--way", type=int, default=-1)
    parser.add_argument("--shot", type=int, default=-1)
    parser.add_argument("--fold", type=int, default=-1)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny 2-step run (CI / verification)")
    parser.add_argument("--mesh_model_parallel", type=int, default=1)
    parser.add_argument("--scan_steps", type=int, default=1,
                        help="train K steps per host dispatch (lax.scan)")
    parser.add_argument("--h2d_dtype", choices=["f32", "i16"], default="f32",
                        help="train-batch transfer dtype (pretrain + "
                        "finetune). i16 ships clouds quantized to int16 "
                        "(half the host->device bytes, dequantized on "
                        "device; error <= max|x|/32767 via a per-batch "
                        "scale, 3.1e-5 for unit-sphere pretrain data) — for "
                        "bandwidth-starved links where the H2D transfer "
                        "bounds sustained throughput")
    parser.add_argument("--ckpt_every", type=int, default=1,
                        help="save ckpt-last every N epochs (default 1 = "
                        "reference parity; the final epoch always saves). On "
                        "a tunneled chip each save is a ~250MB D2H that can "
                        "shadow a whole short epoch")
    parser.add_argument("--allow_random_tokenizer", action="store_true",
                        help="pretrain with a randomly initialized dVAE "
                        "tokenizer when dvae_config.ckpt is unset/missing "
                        "(otherwise a set-but-unloadable path is an error)")
    args = parser.parse_args(argv)

    if args.test and args.resume:
        raise ValueError("--test and --resume cannot be both activated")
    if args.resume and args.start_ckpts is not None:
        raise ValueError("--resume and --start_ckpts cannot be both activated")
    if args.test and args.ckpts is None:
        print("testing: ckpts is None — evaluating a randomly initialized model")
    if args.finetune_model and args.ckpts is None:
        print("training from scratch (finetune_model without ckpts)")

    stem = Path(args.config).stem
    parent = Path(args.config).parent.name
    if args.test:
        args.exp_name = "test_" + args.exp_name
    if args.mode is not None:
        args.exp_name = args.exp_name + "_" + args.mode
    args.experiment_path = os.path.join("./work_dirs", stem, parent, args.exp_name)
    args.tfboard_path = os.path.join("./work_dirs", stem, parent, "TFBoard",
                                     args.exp_name)
    args.log_name = stem
    args.distributed = False  # set by the entry point after jax init
    args.use_gpu = False
    create_experiment_dir(args)
    return args


def create_experiment_dir(args):
    os.makedirs(args.experiment_path, exist_ok=True)
    os.makedirs(args.tfboard_path, exist_ok=True)
