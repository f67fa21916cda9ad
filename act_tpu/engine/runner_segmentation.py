"""Segmentation runners: ShapeNetPart + S3DIS train/eval on the shared library.

Replaces the two forked subproject loops (part_segmentation/main.py,
semantic_segmentation/main.py + main_test.py) with one implementation. Protocol
parity: per-category part-IoU with the absent-part=1.0 rule
(part_segmentation/main.py:273-299), best-instance-mIoU checkpointing; S3DIS
class-weighted NLL, mIoU/OA/mAcc (semantic_segmentation/main.py:248-302) and the
sliding-window whole-scene vote evaluation (main_test.py:54-139).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from act_tpu.datasets.loader import DataLoader
from act_tpu.datasets.segmentation_datasets import (
    PartNormalDataset, S3DISDataset, WholeSceneDataset, SEG_CLASSES,
    NUM_PART_CLASSES, NUM_SHAPE_CATEGORIES, S3DIS_NUM_CLASSES)
from act_tpu.engine import checkpoint as ckpt_lib
from act_tpu.engine.builder import build_schedule
from act_tpu.engine.train_state import (TrainState, make_multi_step,
                                        step_rngs, _with_kernel_mesh)
from act_tpu.ops._backend import set_default_kernel_mesh
from act_tpu.parallel import (DATA_AXIS, make_mesh, replicate, shard_batch,
                              shard_stacked)
from jax.sharding import NamedSharding, PartitionSpec as P
from act_tpu.models import MODELS
from act_tpu.models.segmentation import nll_seg_loss
from act_tpu.utils.config import ConfigDict
from act_tpu.utils.logger import print_log
from act_tpu.utils.misc import set_random_seed

LABEL_TO_CAT = {}
for cat, labels in SEG_CLASSES.items():
    for l in labels:
        LABEL_TO_CAT[l] = cat


def _np_augment(rng, pts):
    """provider.random_scale_point_cloud + shift_point_cloud
    (part_segmentation/main.py:197-199)."""
    s = rng.uniform(0.8, 1.25, (pts.shape[0], 1, 1)).astype(np.float32)
    t = rng.uniform(-0.1, 0.1, (pts.shape[0], 1, 3)).astype(np.float32)
    return pts * s + t


def part_iou_per_shape(pred: np.ndarray, target: np.ndarray, cat: str):
    """Part IoUs for one shape with the absent-part=1.0 rule."""
    part_ious = []
    for l in SEG_CLASSES[cat]:
        gt_l = target == l
        pred_l = pred == l
        if (not gt_l.any()) and (not pred_l.any()):
            part_ious.append(1.0)
        else:
            inter = np.sum(gt_l & pred_l)
            union = np.sum(gt_l | pred_l)
            part_ious.append(inter / union if union else 1.0)
    return part_ious


def evaluate_partseg(infer_fn, variables, loader, logger=None) -> Dict[str, float]:
    shape_ious = {cat: [] for cat in SEG_CLASSES}
    correct, seen = 0, 0
    for pts, cls, seg in loader:
        one_hot = np.eye(NUM_SHAPE_CATEGORIES, dtype=np.float32)[cls]
        logits = infer_fn(variables, jnp.asarray(np.asarray(pts)[..., :3]),
                          jnp.asarray(one_hot))
        cats = [sorted(SEG_CLASSES)[c] for c in np.asarray(cls)]
        logits = np.asarray(logits)
        for b, cat in enumerate(cats):
            # restrict argmax to the category's own parts (reference :262-268)
            part_range = SEG_CLASSES[cat]
            sub = logits[b][:, part_range]
            pred = np.asarray(part_range)[sub.argmax(-1)]
            shape_ious[cat].append(float(np.mean(
                part_iou_per_shape(pred, np.asarray(seg[b]), cat))))
            correct += int((pred == np.asarray(seg[b])).sum())
            seen += pred.size
    all_shape_ious = [i for v in shape_ious.values() for i in v]
    cat_ious = {c: float(np.mean(v)) for c, v in shape_ious.items() if v}
    metrics = {
        "accuracy": correct / max(seen, 1),
        "class_avg_iou": float(np.mean(list(cat_ious.values()))) if cat_ious else 0.0,
        "instance_avg_iou": float(np.mean(all_shape_ious)) if all_shape_ious else 0.0,
    }
    for c, v in sorted(cat_ious.items()):
        print_log(f"  eval mIoU of {c:<14s} {v:.4f}", logger=logger)
    print_log(f"[SEG EVAL] acc={metrics['accuracy']:.4f} "
              f"cls-mIoU={metrics['class_avg_iou']:.4f} "
              f"ins-mIoU={metrics['instance_avg_iou']:.4f}", logger=logger)
    return metrics


def evaluate_semseg(infer_fn, variables, loader, num_classes=S3DIS_NUM_CLASSES,
                    logger=None) -> Dict[str, float]:
    total_seen = np.zeros(num_classes)
    total_correct = np.zeros(num_classes)
    total_union = np.zeros(num_classes)
    correct, seen = 0, 0
    for pts, seg in loader:
        logits = infer_fn(variables, jnp.asarray(pts))
        pred = np.asarray(jnp.argmax(logits, -1))
        seg = np.asarray(seg)
        correct += int((pred == seg).sum())
        seen += seg.size
        for l in range(num_classes):
            total_seen[l] += np.sum(seg == l)
            total_correct[l] += np.sum((pred == l) & (seg == l))
            total_union[l] += np.sum((pred == l) | (seg == l))
    iou = total_correct / np.maximum(total_union, 1)
    macc = float(np.mean(total_correct / np.maximum(total_seen, 1)))
    metrics = {"OA": correct / max(seen, 1), "mAcc": macc,
               "mIoU": float(np.mean(iou))}
    print_log(f"[SEMSEG EVAL] OA={metrics['OA']:.4f} mAcc={macc:.4f} "
              f"mIoU={metrics['mIoU']:.4f}", logger=logger)
    return metrics


def _make_state(model, variables, args, steps_per_epoch):
    schedule = build_schedule(
        ConfigDict(dict(type="CosLR",
                        kwargs=dict(epochs=int(args.epoch),
                                    initial_epochs=min(10, int(args.epoch))))),
        ConfigDict(dict(lr=float(args.learning_rate))), steps_per_epoch)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(schedule, weight_decay=float(args.weight_decay)))
    return TrainState.create(variables, tx), schedule


def run_partseg(args, logger=None):
    """Train + eval ShapeNetPart (reference part_segmentation/main.py:70-340)."""
    root = getattr(args, "root",
                   "data/shapenetcore_partanno_segmentation_benchmark_v0_normal")
    npoints = int(args.npoint)
    # --normal selects the dataset's 6-channel (xyz+normal) output like the
    # reference (part_segmentation/main.py:109-111). The backbone's grouping
    # consumes xyz only — the reference model views neighborhoods as (..,3)
    # (models/pt.py:46) so its normals were never consumable either; we take
    # the working interpretation and feed the geometric channels.
    use_normal = bool(getattr(args, "normal", False))
    train_ds = PartNormalDataset(root, npoints, split="trainval",
                                 normal_channel=use_normal)
    test_ds = PartNormalDataset(root, npoints, split="test",
                                normal_channel=use_normal)
    # prefetch covers a full --scan_steps window so loader assembly hides
    # inside the previous window's H2D transfer (see builder.py loader note)
    scan_pf = max(2, 2 * max(int(getattr(args, "scan_steps", 1) or 1), 1))
    train_loader = DataLoader(train_ds, int(args.batch_size), shuffle=True,
                              drop_last=True, seed=0, prefetch=scan_pf)
    test_loader = DataLoader(test_ds, int(args.batch_size), shuffle=False)

    # same multi-chip story as every other runner (runner_finetune.py:99-100):
    # batch sharded on 'data', params replicated, Pallas kernels shard_map'd
    # (the reference seg CLIs are single-GPU, part_segmentation/main.py:124)
    mesh = make_mesh(model_parallel=getattr(args, "mesh_model_parallel", 1))
    set_default_kernel_mesh(mesh)
    cfg = ConfigDict(dict(NAME="PartSegTransformer", cls_dim=NUM_PART_CLASSES,
                          num_group=int(getattr(args, "num_group", 128)),
                          group_size=32,
                          dtype=getattr(args, "dtype", "bf16")))
    model = MODELS.build(cfg)
    root_key = set_random_seed(0)
    sample_pts = jnp.zeros((2, npoints, 3), jnp.float32)
    sample_lab = jnp.zeros((2, NUM_SHAPE_CATEGORIES), jnp.float32)
    rngs = dict(params=root_key, dropout=root_key, droppath=root_key)
    variables = jax.jit(lambda: model.init(rngs, sample_pts, sample_lab))()

    if getattr(args, "ckpts", None):
        loaded = ckpt_lib.load_checkpoint(args.ckpts)
        src = loaded.get("params", loaded)
        # pretrain student keys live under ACT_encoder/backbone naming
        merged = ckpt_lib.merge_pretrained(
            jax.device_get(variables["params"]), _remap_backbone(src),
            logger=logger)
        variables = {**variables, "params": merged}

    steps_per_epoch = max(len(train_loader), 1)
    state, schedule = _make_state(model, variables, args, steps_per_epoch)
    state = replicate(mesh, state)
    # TP weight shardings over the 'model' axis (plain replication at
    # --mesh_model_parallel 1; optimizer moments reshard lazily via GSPMD)
    from act_tpu.parallel.tp import shard_params_tp
    state = state.replace(params=shard_params_tp(state.params, mesh))

    def train_step(state, pts, one_hot, seg, key):
        sh = NamedSharding(mesh, P(DATA_AXIS))
        pts, one_hot, seg = (jax.lax.with_sharding_constraint(x, sh)
                             for x in (pts, one_hot, seg))
        rngs = step_rngs(key, state.step)
        rngs.pop("augment")

        def loss_fn(params):
            log_probs, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, one_hot, train=True, rngs=rngs, mutable=["batch_stats"])
            return nll_seg_loss(log_probs, seg), new_vars
        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        return state.replace(batch_stats=new_vars["batch_stats"]), loss

    train_step = jax.jit(_with_kernel_mesh(train_step, mesh))
    # --scan_steps K: one host dispatch trains K steps (pretrain-runner
    # pattern); batches are (pts, one_hot, seg) tuples
    scan_steps = max(int(getattr(args, "scan_steps", 1) or 1), 1)
    if getattr(args, "smoke", False):
        # smoke still runs exactly max_steps (=2) batches; an explicit
        # --scan_steps >1 exercises the scan path as ONE 2-step dispatch
        scan_steps = min(scan_steps, 2)
    multi_step = (make_multi_step(train_step, scan_steps)
                  if scan_steps > 1 else None)

    @jax.jit
    def infer_fn(variables, pts, one_hot):
        return model.apply(variables, pts, one_hot)

    np_rng = np.random.default_rng(0)
    best_ins_miou = 0.0
    max_steps = 2 if getattr(args, "smoke", False) else None
    epochs = 1 if getattr(args, "smoke", False) else int(args.epoch)
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        losses = []  # device scalars; fetched once at epoch end
        pending = []
        for idx, (pts, cls, seg) in enumerate(train_loader):
            pts = _np_augment(np_rng, np.asarray(pts)[..., :3])
            one_hot = np.eye(NUM_SHAPE_CATEGORIES, dtype=np.float32)[cls]
            if multi_step is not None:
                pending.append((pts, one_hot, np.asarray(seg)))
                if len(pending) < scan_steps:
                    continue
                stacked = tuple(
                    shard_stacked(mesh, np.stack(col))
                    for col in zip(*pending))
                pending = []
                state, loss = multi_step(state, stacked, root_key)
            else:
                state, loss = train_step(
                    state, shard_batch(mesh, jnp.asarray(pts)),
                    shard_batch(mesh, jnp.asarray(one_hot)),
                    shard_batch(mesh, jnp.asarray(seg)), root_key)
            losses.append(loss)
            if max_steps and idx + 1 >= max_steps:
                break
        for pts, one_hot, seg in pending:  # sub-scan remainder flush
            state, loss = train_step(
                state, shard_batch(mesh, jnp.asarray(pts)),
                shard_batch(mesh, jnp.asarray(one_hot)),
                shard_batch(mesh, jnp.asarray(seg)), root_key)
            losses.append(loss)
        pending = []
        losses = [float(l) for l in losses]
        print_log(f"[PartSeg][Epoch {epoch}] loss={np.mean(losses):.4f} "
                  f"time={time.time() - t0:.1f}s", logger=logger)
        metrics = evaluate_partseg(infer_fn, state.variables(),
                                   _limit(test_loader, max_steps), logger)
        if metrics["instance_avg_iou"] > best_ins_miou:
            best_ins_miou = metrics["instance_avg_iou"]
            ckpt_lib.save_checkpoint(state, epoch, metrics,
                                     {"ins_miou": best_ins_miou},
                                     "ckpt-best", args, logger)
    ckpt_lib.wait_for_pending_saves()  # async writes durable before return
    print_log(f"[PartSeg] best instance mIoU = {best_ins_miou:.4f}",
              logger=logger)
    return best_ins_miou


def run_semseg(args, logger=None):
    """Train + eval S3DIS (reference semantic_segmentation/main.py)."""
    root = getattr(args, "root", "data/stanford_indoor3d")
    npoints = int(args.npoint)
    train_ds = S3DISDataset("train", root, npoints,
                            test_area=int(getattr(args, "test_area", 5)))
    test_ds = S3DISDataset("test", root, npoints,
                           test_area=int(getattr(args, "test_area", 5)))
    scan_pf = max(2, 2 * max(int(getattr(args, "scan_steps", 1) or 1), 1))
    train_loader = DataLoader(train_ds, int(args.batch_size), shuffle=True,
                              drop_last=True, seed=0, prefetch=scan_pf)
    test_loader = DataLoader(test_ds, int(args.batch_size), shuffle=False)
    weights = jnp.asarray(train_ds.labelweights)

    # multi-chip like run_partseg: batch on 'data', params replicated
    mesh = make_mesh(model_parallel=getattr(args, "mesh_model_parallel", 1))
    set_default_kernel_mesh(mesh)
    cfg = ConfigDict(dict(NAME="SemSegTransformer", cls_dim=S3DIS_NUM_CLASSES,
                          num_group=int(getattr(args, "num_group", 128)),
                          group_size=32,
                          dtype=getattr(args, "dtype", "bf16")))
    model = MODELS.build(cfg)
    root_key = set_random_seed(0)
    sample_pts = jnp.zeros((2, npoints, 3), jnp.float32)
    rngs = dict(params=root_key, dropout=root_key, droppath=root_key)
    variables = jax.jit(lambda: model.init(rngs, sample_pts))()
    if getattr(args, "ckpts", None):
        loaded = ckpt_lib.load_checkpoint(args.ckpts)
        src = loaded.get("params", loaded)
        merged = ckpt_lib.merge_pretrained(
            jax.device_get(variables["params"]), _remap_backbone(src),
            logger=logger)
        variables = {**variables, "params": merged}

    steps_per_epoch = max(len(train_loader), 1)
    state, schedule = _make_state(model, variables, args, steps_per_epoch)
    state = replicate(mesh, state)
    # TP weight shardings over the 'model' axis (plain replication at
    # --mesh_model_parallel 1; optimizer moments reshard lazily via GSPMD)
    from act_tpu.parallel.tp import shard_params_tp
    state = state.replace(params=shard_params_tp(state.params, mesh))

    def train_step(state, pts, seg, key):
        sh = NamedSharding(mesh, P(DATA_AXIS))
        pts, seg = (jax.lax.with_sharding_constraint(x, sh)
                    for x in (pts, seg))
        rngs = step_rngs(key, state.step)
        rngs.pop("augment")

        def loss_fn(params):
            log_probs, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, train=True, rngs=rngs, mutable=["batch_stats"])
            return nll_seg_loss(log_probs, seg, weights), new_vars
        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        return state.replace(batch_stats=new_vars["batch_stats"]), loss

    train_step = jax.jit(_with_kernel_mesh(train_step, mesh))
    # --scan_steps K: one host dispatch trains K steps (pretrain-runner
    # pattern); batches are (pts, seg) tuples
    scan_steps = max(int(getattr(args, "scan_steps", 1) or 1), 1)
    if getattr(args, "smoke", False):
        # smoke still runs exactly max_steps (=2) batches; an explicit
        # --scan_steps >1 exercises the scan path as ONE 2-step dispatch
        scan_steps = min(scan_steps, 2)
    multi_step = (make_multi_step(train_step, scan_steps)
                  if scan_steps > 1 else None)

    @jax.jit
    def infer_fn(variables, pts):
        return model.apply(variables, pts)

    np_rng = np.random.default_rng(0)
    best_miou = 0.0
    max_steps = 2 if getattr(args, "smoke", False) else None
    epochs = 1 if getattr(args, "smoke", False) else int(args.epoch)
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        losses = []  # device scalars; fetched once at epoch end
        pending = []
        for idx, (pts, seg) in enumerate(train_loader):
            pts = _np_augment(np_rng, np.asarray(pts))
            if multi_step is not None:
                pending.append((pts, np.asarray(seg)))
                if len(pending) < scan_steps:
                    continue
                stacked = tuple(
                    shard_stacked(mesh, np.stack(col))
                    for col in zip(*pending))
                pending = []
                state, loss = multi_step(state, stacked, root_key)
            else:
                state, loss = train_step(
                    state, shard_batch(mesh, jnp.asarray(pts)),
                    shard_batch(mesh, jnp.asarray(seg)), root_key)
            losses.append(loss)
            if max_steps and idx + 1 >= max_steps:
                break
        for pts, seg in pending:  # sub-scan remainder flush
            state, loss = train_step(
                state, shard_batch(mesh, jnp.asarray(pts)),
                shard_batch(mesh, jnp.asarray(seg)), root_key)
            losses.append(loss)
        pending = []
        losses = [float(l) for l in losses]
        print_log(f"[SemSeg][Epoch {epoch}] loss={np.mean(losses):.4f}",
                  logger=logger)
        metrics = evaluate_semseg(infer_fn, state.variables(),
                                  _limit(test_loader, max_steps), logger=logger)
        if metrics["mIoU"] > best_miou:
            best_miou = metrics["mIoU"]
            ckpt_lib.save_checkpoint(state, epoch, metrics,
                                     {"mIoU": best_miou}, "ckpt-best",
                                     args, logger)
    ckpt_lib.wait_for_pending_saves()  # async writes durable before return
    print_log(f"[SemSeg] best mIoU = {best_miou:.4f}", logger=logger)
    return best_miou, state, model


def whole_scene_eval(args, state=None, model=None, logger=None,
                     vote_num: int = 3):
    """Sliding-window whole-scene vote eval (reference main_test.py:54-139)."""
    root = getattr(args, "root", "data/stanford_indoor3d")
    npoints = int(args.npoint)
    ds = WholeSceneDataset(root, npoints,
                           test_area=int(getattr(args, "test_area", 5)))
    if model is None:
        cfg = ConfigDict(dict(NAME="SemSegTransformer",
                              cls_dim=S3DIS_NUM_CLASSES,
                              dtype=getattr(args, "dtype", "bf16")))
        model = MODELS.build(cfg)
        root_key = set_random_seed(0)
        rngs = dict(params=root_key, dropout=root_key, droppath=root_key)
        variables = jax.jit(lambda: model.init(
            rngs, jnp.zeros((1, npoints, 3), jnp.float32)))()
        if getattr(args, "ckpts", None):
            payload = ckpt_lib.load_checkpoint(args.ckpts)
            # converted/legacy ckpts may carry the other stack layout
            params = ckpt_lib.adapt_block_layout(
                payload["params"], jax.device_get(variables["params"]))
            variables = {"params": params,
                         "batch_stats": payload.get("batch_stats", {})}
    else:
        variables = state.variables()

    @jax.jit
    def infer_fn(variables, pts):
        return model.apply(variables, pts)

    # The reference evaluates one block per forward (main_test.py:99-124);
    # eval-mode forwards are batch-independent (BN running stats), so the
    # sliding-window blocks batch losslessly. At B=1 every block costs a
    # full dispatch (~25ms over a tunneled chip, and the device runs at
    # 1/eval_bs occupancy); batching is a pure win with identical votes.
    eval_bs = int(getattr(args, "eval_batch_size", 0) or 16)

    def batched_blocks(scene_idx):
        """Yield (stacked blocks (eval_bs, N, 3), sels, n_real): fixed-size
        chunks, the last one padded with its final block to keep the jit
        shape static (padded rows are skipped on the host side)."""
        buf = []
        for block, _labels, sel in ds.blocks_for_scene(scene_idx):
            buf.append((block, sel))
            if len(buf) == eval_bs:
                yield (np.stack([b for b, _ in buf]),
                       [s for _, s in buf], eval_bs)
                buf = []
        if buf:
            n = len(buf)
            buf += [buf[-1]] * (eval_bs - n)
            yield (np.stack([b for b, _ in buf]),
                   [s for _, s in buf], n)

    total_correct = np.zeros(S3DIS_NUM_CLASSES)
    total_seen = np.zeros(S3DIS_NUM_CLASSES)
    total_union = np.zeros(S3DIS_NUM_CLASSES)
    for scene_idx in range(len(ds)):
        n_pts = len(ds.semantic_labels[scene_idx])
        vote_pool = np.zeros((n_pts, S3DIS_NUM_CLASSES))
        for _ in range(vote_num):
            for stacked, sels, n_real in batched_blocks(scene_idx):
                probs = np.asarray(jnp.exp(infer_fn(
                    variables, jnp.asarray(stacked))))
                for i in range(n_real):
                    np.add.at(vote_pool, sels[i], probs[i])
        pred = vote_pool.argmax(-1)
        gt = np.asarray(ds.semantic_labels[scene_idx])
        for l in range(S3DIS_NUM_CLASSES):
            total_seen[l] += np.sum(gt == l)
            total_correct[l] += np.sum((pred == l) & (gt == l))
            total_union[l] += np.sum((pred == l) | (gt == l))
    iou = total_correct / np.maximum(total_union, 1)
    metrics = {"OA": total_correct.sum() / max(total_seen.sum(), 1),
               "mAcc": float(np.mean(
                   total_correct / np.maximum(total_seen, 1))),
               "mIoU": float(np.mean(iou))}
    print_log(f"[WHOLE-SCENE] OA={metrics['OA']:.4f} "
              f"mAcc={metrics['mAcc']:.4f} mIoU={metrics['mIoU']:.4f}",
              logger=logger)
    return metrics


def _remap_backbone(params: dict) -> dict:
    """Map pretrain-checkpoint student keys (ACT_encoder.*) onto the seg
    backbone namespace (reference load_model_from_ckpt, pt.py:250-276)."""
    src = params.get("ACT_encoder", params)
    return {"backbone": src}


def _limit(loader, max_batches):
    if not max_batches:
        return loader
    def gen():
        for i, b in enumerate(loader):
            if i >= max_batches:
                break
            yield b
    return gen()
