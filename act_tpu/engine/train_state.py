"""Functional train state + jitted train/eval step factories.

The reference's imperative epoch loops (tools/runner_*.py) become pure functions
``(state, batch, rng) -> (state, metrics)`` compiled once with jax.jit over the
device mesh: batch sharded on the data axis, params/optimizer state replicated —
XLA inserts the gradient all-reduce (the DDP bucket analog) on ICI. Everything the
reference did per-iteration in python (augments, grouping, masking, the frozen
teacher forward, loss, optimizer, EMA/queue updates) runs inside the one program.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from act_tpu.parallel import (DATA_AXIS, batch_sharding, replicated)
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   buffers=variables.get("buffers", {}),
                   opt_state=tx.init(params), tx=tx)

    def variables(self) -> Dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.buffers:
            v["buffers"] = self.buffers
        return v

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def step_rngs(base_key: jax.Array, step: jax.Array) -> Dict[str, jax.Array]:
    """Derive the per-step named RNG streams from one root key."""
    k = jax.random.fold_in(base_key, step)
    names = ("gumbel", "mask", "dropout", "droppath", "augment")
    keys = jax.random.split(k, len(names))
    return dict(zip(names, keys))


def stop_frozen(params, trainable_mask):
    """stop_gradient on frozen leaves — the JAX analog of torch
    ``requires_grad=False``. Loss values and trainable gradients are
    bit-identical (TestStopFrozen). Perf note: inside the whole-step jit this
    is belt-and-suspenders — the frozen grads feed optax ``set_to_zero``,
    which ignores its input, so XLA already dead-code-eliminates their wgrad
    matmuls (measured: Stage-I step 59.2ms both ways). It matters for any
    caller that materializes gradients outside the optimizer jit (probes,
    grad logging) and documents intent at the graph level."""
    if trainable_mask is None:
        return params
    return jax.tree_util.tree_map(
        lambda p, t: p if t else jax.lax.stop_gradient(p),
        params, trainable_mask)


def apply_bn_ratio(old_stats, new_stats, ratio):
    """Retarget a flax BN running-stat update to a scheduled momentum.

    ``old + r*(new-old)`` with ``r = (1-m_t)/(1-m0)`` turns an update computed
    with the module's static momentum ``m0`` into one computed with ``m_t``
    exactly (see utils.misc.bn_update_ratio) — the functional analog of the
    reference ``BNMomentumScheduler`` mutating ``bn.momentum`` per epoch
    (utils/misc.py:123-147). The literal default 1.0 skips the arithmetic so
    the unscheduled path stays bit-identical.
    """
    if isinstance(ratio, (int, float)) and ratio == 1.0:
        return new_stats
    return jax.tree_util.tree_map(lambda o, n: o + ratio * (n - o),
                                  old_stats, new_stats)


def _with_kernel_mesh(fn: Callable, mesh) -> Callable:
    """Activate the Pallas kernel-sharding mesh while the step body traces,
    so the grouping/kNN/gather kernels run under shard_map over 'data'
    instead of being all-gathered by GSPMD (ops/_backend.py)."""
    from act_tpu.ops._backend import kernel_mesh

    def wrapped(*args, **kwargs):
        with kernel_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def make_pretrain_step(model, transform_fn: Optional[Callable] = None,
                       mesh=None, loss_is_tuple: bool = False,
                       ema_momentum: Optional[float] = None,
                       trainable_mask=None) -> Callable:
    """Train step for ACT_PointDistillation / ACT_PointBERT.

    transform_fn(key, pts) applies the batch augmentation inside the program.
    When ``ema_momentum`` is set, transformer_k params are EMA-updated from
    transformer_q after the optimizer step (MoCo momentum encoder,
    reference models/act.py:973-979).
    """

    def train_step(state: TrainState, pts: jax.Array, base_key: jax.Array,
                   bn_ratio=1.0) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if mesh is not None:
            pts = jax.lax.with_sharding_constraint(
                pts, NamedSharding(mesh, P(DATA_AXIS)))
        rngs = step_rngs(base_key, state.step)
        if transform_fn is not None:
            pts = transform_fn(rngs.pop("augment"), pts)
        else:
            rngs.pop("augment")

        def loss_fn(params):
            variables = {"params": stop_frozen(params, trainable_mask)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if state.buffers:
                variables["buffers"] = state.buffers
            mutable = [c for c in ("batch_stats", "buffers")
                       if variables.get(c)]
            out, new_vars = model.apply(variables, pts, train=True,
                                        rngs=rngs, mutable=mutable)
            if loss_is_tuple:
                losses = out
                loss = sum(losses)
            else:
                losses = (out,)
                loss = out
            return loss, (losses, new_vars)

        (loss, (losses, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        old_stats = state.batch_stats
        state = state.apply_gradients(grads)
        state = state.replace(
            batch_stats=apply_bn_ratio(
                old_stats, new_vars.get("batch_stats", old_stats), bn_ratio),
            buffers=new_vars.get("buffers", state.buffers))

        if ema_momentum is not None:
            m = ema_momentum
            new_k = jax.tree_util.tree_map(
                lambda pk, pq: pk * m + pq * (1.0 - m),
                state.params["transformer_k"], state.params["transformer_q"])
            state = state.replace(
                params={**state.params, "transformer_k": new_k})

        metrics = {"loss": loss}
        for i, l in enumerate(losses):
            metrics[f"loss_{i + 1}"] = l
        return state, metrics

    return jax.jit(_with_kernel_mesh(train_step, mesh), donate_argnums=(0,))


def make_multi_step(train_step: Callable, num_steps: int,
                    call: Optional[Callable] = None) -> Callable:
    """Wrap a jitted train step in a lax.scan over ``num_steps`` stacked batches,
    so one host dispatch trains K steps.

    The reference dispatches (at least) one CUDA launch per op per step; even a
    jitted TPU step pays one host round trip per step — ruinous over a tunneled
    chip (~100ms) and still wasteful (~100us) in production. With scan, host
    involvement is 1/K per step. Batches: pytree with leading (K, ...) axes.

    The default body calls ``train_step(state, *batch, base_key, *extra)``
    (tuple batches unpack positionally before the key — fits the pretrain,
    finetune, and segmentation step signatures). Steps whose per-step scanned
    inputs come AFTER the key (e.g. the autoencoder's annealed temp/kld
    scalars) pass ``call(state, batch, base_key, extra)`` to reorder.
    """

    def default_call(st, batch, base_key, extra):
        if isinstance(batch, (tuple, list)):
            return train_step(st, *batch, base_key, *extra)
        return train_step(st, batch, base_key, *extra)

    body_call = call or default_call

    def multi_step(state, stacked_batches, base_key, *extra):
        def body(carry, batch):
            st, metrics = body_call(carry, batch, base_key, extra)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, stacked_batches)
        # return the mean of each metric across the K steps
        return state, jax.tree_util.tree_map(lambda m: m.mean(axis=0), metrics)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_autoencoder_step(model, transform_fn: Optional[Callable] = None,
                          mesh=None, trainable_mask=None) -> Callable:
    """Stage-I dVAE step. temperature/kld_weight enter as traced scalars so the
    cosine anneals (tools/runner_autoencoder.py:18-53) don't retrigger compiles."""

    def train_step(state: TrainState, pts: jax.Array, base_key: jax.Array,
                   temperature: jax.Array, kld_weight: jax.Array,
                   bn_ratio=1.0) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if mesh is not None:
            pts = jax.lax.with_sharding_constraint(
                pts, NamedSharding(mesh, P(DATA_AXIS)))
        rngs = step_rngs(base_key, state.step)
        if transform_fn is not None:
            pts = transform_fn(rngs.pop("augment"), pts)
        else:
            rngs.pop("augment")

        def loss_fn(params):
            variables = {"params": stop_frozen(params, trainable_mask),
                         "batch_stats": state.batch_stats}
            ret, new_vars = model.apply(
                variables, pts, temperature, False, train=True,
                rngs=rngs, mutable=["batch_stats"])
            recon, kld = model.apply(variables, ret, pts,
                                     method=model.get_loss)
            loss = recon + kld_weight * kld
            return loss, (recon, kld, new_vars)

        (loss, (recon, kld, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        old_stats = state.batch_stats
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=apply_bn_ratio(
            old_stats, new_vars["batch_stats"], bn_ratio))
        return state, {"loss": loss, "recon": recon, "kld": kld}

    return jax.jit(_with_kernel_mesh(train_step, mesh), donate_argnums=(0,))


def make_finetune_step(model, transform_fn: Optional[Callable] = None,
                       mesh=None, num_classes: int = 0,
                       trainable_mask=None) -> Callable:
    """Classification step (reference tools/runner_finetune.py:117-245)."""
    from act_tpu.models.point_transformer import get_loss_acc

    def train_step(state: TrainState, pts: jax.Array, labels: jax.Array,
                   base_key: jax.Array, bn_ratio=1.0) -> Tuple[TrainState, Dict]:
        if mesh is not None:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            pts = jax.lax.with_sharding_constraint(pts, sh)
            labels = jax.lax.with_sharding_constraint(labels, sh)
        rngs = step_rngs(base_key, state.step)
        if transform_fn is not None:
            pts = transform_fn(rngs.pop("augment"), pts)
        else:
            rngs.pop("augment")

        def loss_fn(params):
            variables = {"params": stop_frozen(params, trainable_mask),
                         "batch_stats": state.batch_stats}
            logits, new_vars = model.apply(variables, pts, train=True,
                                           rngs=rngs, mutable=["batch_stats"])
            loss, acc = get_loss_acc(logits, labels)
            return loss, (acc, new_vars)

        (loss, (acc, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        old_stats = state.batch_stats
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=apply_bn_ratio(
            old_stats, new_vars["batch_stats"], bn_ratio))
        return state, {"loss": loss, "acc": acc}

    return jax.jit(_with_kernel_mesh(train_step, mesh), donate_argnums=(0,))


def make_eval_step(model, method=None) -> Callable:
    def eval_step(variables, pts):
        return model.apply(variables, pts, **({} if method is None else {}),
                           method=method)
    return jax.jit(eval_step)
