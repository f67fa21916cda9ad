"""Turnkey released-checkpoint parity protocol (MODEL_ZOO comparison).

One command per MODEL_ZOO row: converts the released torch ``.pth`` through
the production converter rules, evaluates with the reference protocol
(``--test`` [+300-round ``--vote``] for classification checkpoints, or a full
finetune from a converted pretrain checkpoint), and prints the comparison
table against the MODEL_ZOO accuracy (reference model_zoo/MODEL_ZOO.md:10-19).

Usage (datasets at the standard ./data layout, or pass --data_root):

    # released finetuned classifier -> test-protocol OA vs the zoo number
    python tools/parity_protocol.py --ckpt ckpt_scan_hardest.pth \
        --task scan_hardest --vote

    # released Stage-II pretrain ckpt -> full finetune -> OA
    python tools/parity_protocol.py --ckpt ckpt_pretrain.pth \
        --task modelnet --from_pretrain

    # released S3DIS semantic-seg ckpt -> whole-scene vote mIoU
    python tools/parity_protocol.py --ckpt s3dis_best.pth --task s3dis

    # released pretrain ckpt -> 10-fold few-shot -> mean±std acc
    python tools/parity_protocol.py --ckpt ckpt_pretrain.pth \
        --task fewshot_modelnet_5w10s

    # released Stage-I autoencoder ckpt -> CDL1/CDL2/F-score table
    python tools/parity_protocol.py --ckpt ckpt_dvae.pth --task dvae

The end-to-end pipeline (fabricated full-size released-layout state dict ->
converter -> orbax -> test protocol) is rehearsed by
``tests/test_torch_fullgraph.py::TestParityRehearsal`` so this command needs
zero debugging the day the archives are available.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# MODEL_ZOO.md rows: task -> (finetune config, released OA %)
TASKS = {
    "scan_hardest": ("cfgs/finetune_classification/full/finetune_scan_hardest.yaml", 88.21),
    "scan_objbg": ("cfgs/finetune_classification/full/finetune_scan_objbg.yaml", 93.29),
    "scan_objonly": ("cfgs/finetune_classification/full/finetune_scan_objonly.yaml", 91.91),
    "modelnet": ("cfgs/finetune_classification/full/finetune_modelnet.yaml", 93.70),
}

# MODEL_ZOO.md:16 — released S3DIS semantic-seg ckpt, whole-scene vote mIoU %
SEG_TASKS = {"s3dis": 61.2}

# MODEL_ZOO.md:8 — released Stage-I autoencoder ckpt. The zoo publishes no
# accuracy (N/A); the eval protocol is the per-taxonomy CDL1/CDL2/F-score
# table (reference tools/runner_autoencoder.py:219-323), reported as-is.
DVAE_TASKS = {"dvae": "cfgs/autoencoder/act_dvae_with_pretrained_transformer.yaml"}

# MODEL_ZOO.md:21-23 few-shot rows: task -> (way, shot, zoo mean acc %).
# Input is the released Stage-II PRETRAIN ckpt; the protocol finetunes all
# 10 folds and reports mean±std like the reference (datasets/ModelNetFewShot).
FEWSHOT_TASKS = {
    "fewshot_modelnet_5w10s": (5, 10, 96.8),
    "fewshot_modelnet_5w20s": (5, 20, 98.0),
    "fewshot_modelnet_10w10s": (10, 10, 93.3),
    "fewshot_modelnet_10w20s": (10, 20, 95.6),
}
FEWSHOT_CFG = "cfgs/finetune_classification/few_shot/fewshot_modelnet.yaml"


def convert_pth(src: str, dst: str, model: str, head: str = "mlp-3",
                state_key: str = "base_model",
                teacher_arch: str = "vit") -> None:
    """.pth -> orbax through the ONE production pipeline
    (tools/convert_checkpoint.convert — incl. BERT qkv fusion and
    teacher_arch selection, so the two tools cannot drift)."""
    from tools.convert_checkpoint import RULES, convert
    if model not in RULES:
        raise SystemExit(f"unsupported model {model} (have {sorted(RULES)})")
    convert(src, dst, model, state_key=state_key,
            teacher_arch=teacher_arch, head=head)


def _rewrite_data_root(config, data_root: str) -> None:
    """Point every dataset path key at ``data_root`` instead of ./data."""
    def walk(node):
        if not hasattr(node, "items"):
            return
        for k, v in list(node.items()):
            if k in ("ROOT", "DATA_PATH", "PC_PATH") and isinstance(v, str):
                node[k] = os.path.join(data_root,
                                       os.path.relpath(v, "data"))
            elif hasattr(v, "items"):
                walk(v)
    walk(config.dataset)


def run_protocol(task: str, ckpt_pth: str, vote: bool = False,
                 from_pretrain: bool = False, data_root: str = None,
                 exp_name: str = None, smoke: bool = False,
                 teacher_arch: str = "vit"):
    """Convert + evaluate one MODEL_ZOO row. Returns the result dict."""
    from act_tpu.utils.parser import get_args
    from act_tpu.utils.config import get_config
    from act_tpu.engine import runner_finetune

    exp_name = exp_name or f"parity_{task}"
    if task in DVAE_TASKS:
        return _run_dvae_protocol(task, ckpt_pth, data_root=data_root,
                                  exp_name=exp_name, smoke=smoke,
                                  teacher_arch=teacher_arch)
    if task in SEG_TASKS:
        return _run_seg_protocol(task, ckpt_pth, data_root=data_root,
                                 exp_name=exp_name, smoke=smoke)
    if task in FEWSHOT_TASKS:
        return _run_fewshot_protocol(task, ckpt_pth, data_root=data_root,
                                     exp_name=exp_name, smoke=smoke,
                                     teacher_arch=teacher_arch)
    cfg_path, zoo_acc = TASKS[task]

    model = "ACT_PointDistillation" if from_pretrain else "PointTransformer"
    orbax_dir = os.path.join("./work_dirs", "parity", exp_name,
                             "converted.orbax")
    os.makedirs(os.path.dirname(orbax_dir), exist_ok=True)
    convert_pth(ckpt_pth, orbax_dir, model, teacher_arch=teacher_arch)

    argv = ["--config", cfg_path, "--exp_name", exp_name,
            "--ckpts", orbax_dir]
    if from_pretrain:
        argv += ["--finetune_model"]
    else:
        argv += ["--test"]
    if vote:
        argv += ["--vote"]
    if smoke:
        argv += ["--smoke"]
    args = get_args(argv)
    config = get_config(args)
    if data_root:
        _rewrite_data_root(config, data_root)
    if not from_pretrain:
        # pure-eval leg of a released torch-f32 ckpt: evaluate in f32 so the
        # 0.2-point tolerance measures converter parity, not bf16 rounding
        # (from_pretrain legs keep the shipped training dtype)
        config.model.dtype = "f32"

    if from_pretrain:
        # full finetune from the converted pretrain weights, then report the
        # best validation OA (the reference's finetune recipe end-to-end)
        runner_finetune.run_net(args, config)
        argv_t = ["--config", cfg_path, "--exp_name", exp_name + "_eval",
                  "--ckpts", os.path.join(args.experiment_path, "ckpt-best"),
                  "--test"] + (["--vote"] if vote else []) \
                 + (["--smoke"] if smoke else [])
        args_t = get_args(argv_t)
        config_t = get_config(args_t)
        if data_root:
            _rewrite_data_root(config_t, data_root)
        acc = runner_finetune.test_net(args_t, config_t)
    else:
        acc = runner_finetune.test_net(args, config)

    ours = float(getattr(acc, "vote", 0.0) or acc.acc)
    delta = ours - zoo_acc
    result = {"task": task, "config": cfg_path, "zoo_acc": zoo_acc,
              "ours": ours, "delta": delta,
              "within_0.2": abs(delta) <= 0.2, "vote": vote,
              "from_pretrain": from_pretrain}
    return result


def _run_dvae_protocol(task: str, ckpt_pth: str, data_root: str = None,
                       exp_name: str = None, smoke: bool = False,
                       teacher_arch: str = "vit"):
    """Released Stage-I autoencoder ckpt -> ``main_autoencoder.py --val``
    protocol: per-taxonomy CDL1/CDL2/F-score table (reference
    tools/runner_autoencoder.py:219-323, zoo row MODEL_ZOO.md:8). The zoo
    publishes no accuracy for this row (Acc N/A), so the result carries the
    metric table itself — compare it against the released training log."""
    from act_tpu.utils.parser import get_args
    from act_tpu.utils.config import get_config
    from act_tpu.engine import runner_autoencoder

    cfg_path = DVAE_TASKS[task]

    # NO --smoke flag: that would shrink the model under the full-scale
    # converted ckpt. Smoke here bounds the eval length only (seg-leg pattern).
    argv = ["--config", cfg_path, "--exp_name", exp_name, "--val"]
    args = get_args(argv)
    config = get_config(args)
    # The converter layout must match the model the config builds -- derive
    # it from the config NAME instead of trusting --teacher_arch (a bert/clip
    # flag against the ViT config would write a mismatched tree).
    model = str(config.model.NAME)
    expected_arch = {"ACTPromptedDiscreteVAEwithVIT": "vit",
                     "ACTPromptedDiscreteVAEwithBERT": "bert"}.get(model)
    if expected_arch is not None and teacher_arch != expected_arch:
        raise SystemExit(
            f"--task {task} evaluates {model} ({cfg_path}); "
            f"--teacher_arch {teacher_arch} does not match (expected "
            f"{expected_arch}). The released Stage-I ckpt is the prompted-"
            f"ViT autoencoder (MODEL_ZOO.md:8).")
    orbax_dir = os.path.join("./work_dirs", "parity", exp_name,
                             "converted.orbax")
    os.makedirs(os.path.dirname(orbax_dir), exist_ok=True)
    convert_pth(ckpt_pth, orbax_dir, model, teacher_arch=teacher_arch)
    args.ckpts = orbax_dir
    # parity evals run f32 like the torch reference (same policy as the
    # classification/seg legs): the CDL table measures converter drift,
    # not bf16 rounding
    config.model.dtype = "f32"
    if data_root:
        _rewrite_data_root(config, data_root)
    metrics = runner_autoencoder.validate_net(
        args, config, max_batches=4 if smoke else None)
    table = metrics.state_dict()
    return {"task": task, "config": cfg_path, "zoo_acc": None,
            "ours": float(table.get("CDL2", float("nan"))),
            "metrics": {k: float(v) for k, v in table.items()},
            "delta": None, "within_0.2": None, "vote": False,
            "from_pretrain": False}


def _run_seg_protocol(task: str, ckpt_pth: str, data_root: str = None,
                      exp_name: str = None, smoke: bool = False):
    """Released S3DIS semantic-seg ckpt -> whole-scene vote mIoU vs zoo
    (reference semantic_segmentation/main_test.py + MODEL_ZOO.md:16). The
    released key layout (pre-*_cls rename, {'model_state_dict': ...}) is
    handled by seg_rules/load_torch_state_dict."""
    from act_tpu.engine.runner_segmentation import whole_scene_eval
    from act_tpu.utils.logger import get_root_logger

    zoo = SEG_TASKS[task]
    orbax_dir = os.path.join("./work_dirs", "parity", exp_name,
                             "converted.orbax")
    os.makedirs(os.path.dirname(orbax_dir), exist_ok=True)
    convert_pth(ckpt_pth, orbax_dir, "SemSegTransformer")

    args = argparse.Namespace(
        npoint=256 if smoke else 2048, test_area=5, ckpts=orbax_dir,
        root=(os.path.join(data_root, "stanford_indoor3d") if data_root
              else "data/stanford_indoor3d"),
        smoke=smoke, dtype="f32",  # parity evals in f32 like the torch ref
        experiment_path=os.path.join("./work_dirs", "parity", exp_name))
    logger = get_root_logger(
        log_file=os.path.join(args.experiment_path, "parity.log"),
        name="SemSeg")
    metrics = whole_scene_eval(args, logger=logger,
                               vote_num=1 if smoke else 3)
    ours = metrics["mIoU"] * 100.0
    delta = ours - zoo
    return {"task": task, "config": "semantic_segmentation/main_test.py",
            "zoo_acc": zoo, "ours": ours, "delta": delta,
            "within_0.2": abs(delta) <= 0.2, "vote": True,
            "from_pretrain": False}


def _run_fewshot_protocol(task: str, ckpt_pth: str, data_root: str = None,
                          exp_name: str = None, smoke: bool = False,
                          teacher_arch: str = "vit"):
    """Released pretrain ckpt -> 10-fold few-shot finetune -> mean±std acc vs
    the MODEL_ZOO row (reference few-shot recipe: main.py --way/--shot/--fold
    over folds 0-9, best validation OA per fold)."""
    import numpy as np
    from act_tpu.utils.parser import get_args
    from act_tpu.utils.config import get_config
    from act_tpu.engine import runner_finetune, checkpoint as ckpt_lib

    way, shot, zoo = FEWSHOT_TASKS[task]
    orbax_dir = os.path.join("./work_dirs", "parity", exp_name,
                             "converted.orbax")
    os.makedirs(os.path.dirname(orbax_dir), exist_ok=True)
    convert_pth(ckpt_pth, orbax_dir, "ACT_PointDistillation",
                teacher_arch=teacher_arch)

    folds = [0] if smoke else range(10)
    accs = []
    for fold in folds:
        argv = ["--config", FEWSHOT_CFG, "--exp_name", f"{exp_name}_f{fold}",
                "--ckpts", orbax_dir, "--finetune_model",
                "--way", str(way), "--shot", str(shot), "--fold", str(fold)]
        if smoke:
            argv += ["--smoke"]
        args = get_args(argv)
        config = get_config(args)
        # way/shot/fold dataset overrides exactly like main.py:48-54
        for split in (config.dataset.train, config.dataset.val):
            split.others.way = way
            split.others.shot = shot
            split.others.fold = fold
        if data_root:
            _rewrite_data_root(config, data_root)
        runner_finetune.run_net(args, config)
        best_path = os.path.join(args.experiment_path, "ckpt-best")
        if not os.path.exists(best_path):
            # a degenerate fold that never beat OA 0 must not abort the
            # other folds' hours of finetuning — report and move on
            print(f"[PARITY] fold {fold}: no ckpt-best written (degenerate "
                  f"run?) — skipping this fold")
            continue
        payload = ckpt_lib.load_checkpoint(best_path)
        accs.append(float(payload["best_metrics"]["acc"]))
        print(f"[PARITY] fold {fold}: best OA {accs[-1]:.2f}")

    if not accs:
        raise SystemExit("[PARITY] every fold failed to produce a ckpt-best")
    ours, std = float(np.mean(accs)), float(np.std(accs))
    delta = ours - zoo
    return {"task": task, "config": FEWSHOT_CFG, "zoo_acc": zoo,
            "ours": ours, "std": std, "delta": delta,
            "within_0.2": abs(delta) <= 0.2, "vote": False,
            "from_pretrain": True}


def print_table(results) -> None:
    print("\n| task | config | zoo OA | ours | delta | within 0.2% |")
    print("|---|---|---|---|---|---|")
    for r in results:
        if r["zoo_acc"] is None:  # dvae: table-only row (zoo Acc is N/A)
            metric = " ".join(f"{k}={v:.4f}"
                              for k, v in r.get("metrics", {}).items())
            print(f"| {r['task']} | {os.path.basename(r['config'])} "
                  f"| N/A | {metric} | n/a | n/a |")
            continue
        print(f"| {r['task']} | {os.path.basename(r['config'])} "
              f"| {r['zoo_acc']:.2f} | {r['ours']:.2f} | {r['delta']:+.2f} "
              f"| {'YES' if r['within_0.2'] else 'NO'} |")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="released .pth")
    parser.add_argument("--task", required=True,
                        choices=(sorted(TASKS) + sorted(SEG_TASKS)
                                 + sorted(FEWSHOT_TASKS) + sorted(DVAE_TASKS)))
    parser.add_argument("--vote", action="store_true",
                        help="300-round vote protocol (reference test :425)")
    parser.add_argument("--from_pretrain", action="store_true",
                        help="ckpt is a Stage-II pretrain .pth: finetune "
                             "first, then test")
    parser.add_argument("--data_root", default=None,
                        help="dataset root replacing ./data")
    parser.add_argument("--exp_name", default=None)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny 2-step pipeline check")
    parser.add_argument("--teacher_arch", default="vit",
                        choices=["vit", "clip", "bert"],
                        help="teacher layout inside a --from_pretrain ckpt")
    args = parser.parse_args()

    result = run_protocol(args.task, args.ckpt, vote=args.vote,
                          from_pretrain=args.from_pretrain,
                          data_root=args.data_root, exp_name=args.exp_name,
                          smoke=args.smoke, teacher_arch=args.teacher_arch)
    print_table([result])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
