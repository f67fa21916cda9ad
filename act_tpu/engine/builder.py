"""Optimizer / LR-schedule / dataset builders (reference tools/builder.py).

Optax chain design:
- weight decay mask: no decay for 1-D params, biases, or any param whose path
  contains 'token' (reference add_weight_decay, tools/builder.py:38-51);
- freezing: optax.masked zeroes updates for frozen subtrees (the JAX analog of
  requires_grad=False — frozen teacher/tokenizer, transfer_type heads);
- CosLR: linear warmup from 1e-6 over `initial_epochs` then cosine to 1e-7 over
  the remaining epochs (reference timm CosineLRScheduler args, builder.py:71-81),
  evaluated per *step* with steps_per_epoch resolution;
- grad-accum (`step_per_update`) via optax.MultiSteps;
- grad clip via optax.clip_by_global_norm when `grad_norm_clip` is set.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import optax

from act_tpu.datasets import DataLoader, build_dataset_from_cfg
from act_tpu.utils.logger import print_log


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def weight_decay_mask(params):
    """True = apply decay. No decay for 1-D params, biases, norm scales, or
    'token' params. The 'scale' rule covers scanned transformer stacks, whose
    per-layer LayerNorm scales are stacked to 2-D (depth, C) — without it the
    stacked layout would silently start decaying them (the reference's rule
    is ndim <= 1, tools/builder.py:38-51)."""
    def decay(path, leaf):
        p = jtu.keystr(path).lower()
        return not (leaf.ndim <= 1 or "bias" in p or "token" in p
                    or "'scale'" in p)
    return jtu.tree_map_with_path(decay, params)


def freeze_mask_from_paths(params, frozen_predicates) -> Any:
    """True = trainable. ``frozen_predicates``: list of substrings; a param whose
    path contains any of them is frozen."""
    def trainable(path, _):
        p = jtu.keystr(path)
        return not any(s in p for s in frozen_predicates)
    return jtu.tree_map_with_path(trainable, params)


def cast_frozen_bf16(params, subtrees) -> Any:
    """Store a frozen subtree's matmul weights in bf16.

    The frozen teacher/tokenizer never updates, but flax's dtype promotion
    casts its f32 weights to bf16 on every use (~1.7ms/step profiled for the
    ViT-B teacher) and reads 2x the bytes from HBM. Norm parameters and all
    1-D tensors stay f32 (norm statistics precision)."""
    def cast(path, leaf):
        p = jtu.keystr(path).lower()
        if not any(s in p for s in subtrees):
            return leaf
        if leaf.ndim < 2 or any(s in p for s in ("norm", "ln_", "bn", "gn")):
            return leaf
        return jnp.asarray(leaf, jnp.bfloat16)
    return jtu.tree_map_with_path(cast, params)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

def build_schedule(sche_cfg, optimizer_kwargs, steps_per_epoch: int) -> Callable:
    base_lr = float(optimizer_kwargs.lr)
    stype = sche_cfg.type
    if stype == "CosLR":
        warmup_epochs = int(sche_cfg.kwargs.get("initial_epochs", 0))
        total_epochs = int(sche_cfg.kwargs.epochs)
        warmup_steps = max(warmup_epochs * steps_per_epoch, 1)
        # decay must strictly exceed warmup (optax requires a positive cosine
        # leg; epochs == initial_epochs is legal in smoke/one-epoch runs)
        return optax.warmup_cosine_decay_schedule(
            init_value=1e-6, peak_value=base_lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_epochs * steps_per_epoch, warmup_steps + 1),
            end_value=1e-7)
    if stype == "LambdaLR":
        # reference build_lambda_sche (utils/misc.py:52-60): lr decays
        # lr_decay**(epoch/decay_step), floored at lowest_decay
        k = sche_cfg.kwargs
        decay, step_e, lowest = (float(k.lr_decay), int(k.decay_step),
                                 float(k.lowest_decay))

        def fn(step):
            epoch = step // steps_per_epoch
            return base_lr * jnp.maximum(decay ** (epoch / step_e), lowest)
        return fn
    if stype == "StepLR":
        k = sche_cfg.kwargs
        gamma, step_e = float(k.get("gamma", 0.1)), int(k.step_size)

        def fn(step):
            epoch = step // steps_per_epoch
            return base_lr * gamma ** (epoch // step_e)
        return fn
    if stype == "function":
        return lambda step: base_lr
    raise NotImplementedError(stype)


def build_bnm_schedule(config):
    """Optional BatchNorm-momentum scheduler (reference tools/builder.py:89-93).

    Returns ``epoch -> torch-convention BN momentum`` built from the config's
    ``bnmscheduler`` node, or None when absent (no shipped ACT config sets one;
    surface parity with ``build_lambda_bnsche``). Runners convert the value to
    a traced rescale ratio via :func:`act_tpu.utils.misc.bn_update_ratio` and
    pass it to the step — flax bakes BN momentum into the module, so the
    schedule is applied as an exact affine retarget of the running-stat update
    instead of a per-epoch retrace.
    """
    node = config.get("bnmscheduler", None)
    if node is None:
        return None
    if node["type"] != "Lambda":
        raise NotImplementedError(node["type"])
    from functools import partial
    from act_tpu.utils.misc import bn_momentum_schedule
    k = node["kwargs"]
    if k.get("decay_step", None) is None:
        raise NotImplementedError("bnmscheduler requires decay_step")
    return partial(bn_momentum_schedule, bn_momentum=float(k["bn_momentum"]),
                   bn_decay=float(k["bn_decay"]),
                   decay_step=int(k["decay_step"]),
                   lowest_decay=float(k["lowest_decay"]))


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------

def build_optimizer(config, params, steps_per_epoch: int,
                    trainable: Optional[Any] = None):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    opti_cfg = config.optimizer
    kwargs = opti_cfg.kwargs
    schedule = build_schedule(config.scheduler, kwargs, steps_per_epoch)
    wd = float(kwargs.get("weight_decay", 0.0))

    if opti_cfg.type in ("AdamW", "RAdam"):
        # RAdam ~ AdamW with rectified warmup; warmup in the schedule covers it
        tx = optax.adamw(schedule, weight_decay=wd,
                         mask=weight_decay_mask(params))
    elif opti_cfg.type == "Adam":
        tx = optax.adam(schedule)
    elif opti_cfg.type == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(schedule, momentum=0.9, nesterov=True))
    else:
        raise NotImplementedError(opti_cfg.type)

    chain = []
    clip = config.get("grad_norm_clip", None)
    if clip:
        chain.append(optax.clip_by_global_norm(float(clip)))
    chain.append(tx)
    trainable_tx = optax.chain(*chain)

    if trainable is not None:
        # frozen leaves get set_to_zero — no update AND no optimizer moments
        # (requires_grad=False analog; saves the teacher's AdamW state memory)
        labels = jtu.tree_map(lambda t: "train" if t else "frozen", trainable)
        tx_final = optax.multi_transform(
            {"train": trainable_tx, "frozen": optax.set_to_zero()}, labels)
    else:
        tx_final = trainable_tx

    step_per_update = int(config.get("step_per_update", 1))
    if step_per_update > 1:
        tx_final = optax.MultiSteps(tx_final, every_k_schedule=step_per_update)
    return tx_final, schedule


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

def dataset_builder(args, dataset_cfg):
    """cfg node -> (dataset, DataLoader). Mirrors tools/builder.py:14-31: shuffle +
    drop_last for train subsets, per-process sharding when distributed."""
    import jax as _jax
    dataset = build_dataset_from_cfg(dataset_cfg)
    subset = dataset_cfg.others.subset if "others" in dataset_cfg else dataset_cfg.subset
    shuffle = subset == "train"
    bs = int(dataset_cfg.others.bs if "others" in dataset_cfg else dataset_cfg.bs)
    # config batch sizes are GLOBAL; each process loads its share (the
    # reference divides per rank at main.py:44-51)
    bs = max(bs // _jax.process_count(), 1)
    # real on-disk datasets get a worker pool (--num_workers, default 8 like
    # the reference); synthetic fallbacks stay in-process (no IO to hide)
    workers = int(getattr(args, "num_workers", 0) or 0)
    if getattr(dataset, "synthetic", False) or getattr(args, "smoke", False):
        workers = 0
    # Prefetch must cover a full --scan_steps dispatch window: the runner's
    # host thread blocks ~0.3s in device_put per window (tunnel H2D), during
    # which the loader thread can only assemble `prefetch` batches before the
    # queue fills. A 2-deep queue under scan_steps=8 caps the overlap at 1/4
    # window and serializes assembly with transfer (measured: 1,600 vs 2,900
    # clouds/sec sustained); 2 windows deep lets assembly fully hide inside
    # the transfer+execute of the previous window.
    scan = max(int(getattr(args, "scan_steps", 1) or 1), 1)
    loader = DataLoader(
        dataset, batch_size=bs, shuffle=shuffle, drop_last=shuffle,
        seed=int(getattr(args, "seed", 0) or 0),
        num_replicas=_jax.process_count(), rank=_jax.process_index(),
        num_workers=workers, prefetch=max(2, 2 * scan) if shuffle else 2)
    return dataset, loader
