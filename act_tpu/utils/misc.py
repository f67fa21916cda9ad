"""Misc utilities: seeding, schedules, point-cloud helpers, parameter summaries.

Reference parity: ``utils/misc.py`` — ``fps`` wrapper (here :mod:`act_tpu.ops`),
``set_random_seed`` (:39-92), ``seprate_point_cloud`` crop (:157), ``random_dropping``
(:262), ``summary_parameters`` (:277). RNG is explicit: everything that consumed torch
global RNG takes a ``jax.random`` key here.
"""
from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def set_random_seed(seed: int, rank_shift: bool = True) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key for this process.

    The reference seeds ``seed + local_rank`` per process (``main.py:67``,
    ``utils/misc.py:68-92``); we shift by ``jax.process_index()``.
    """
    if rank_shift:
        seed = seed + jax.process_index()
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.PRNGKey(seed)


def worker_seed_fn(worker_id: int, base_seed: int) -> np.random.Generator:
    """Per-worker numpy RNG for data loading (reference ``worker_init_fn``, misc.py:49)."""
    return np.random.default_rng(base_seed + worker_id)


# ---------------------------------------------------------------------------
# schedules (host-side scalars; jit-friendly closed forms)
# ---------------------------------------------------------------------------

def cosine_anneal(step: int, start: float, target: float, ntime: int) -> float:
    """Cosine interpolation start -> target over ``ntime`` steps, then flat.

    Matches the reference's Gumbel-temperature anneal (``tools/runner_autoencoder.py:
    42-53``) and KLD-weight ramp (:18-40) shape.
    """
    t = min(max(step, 0), ntime) / max(ntime, 1)
    return float(target + 0.5 * (start - target) * (1.0 + np.cos(np.pi * t)))


# flax BatchNorm momentum weighting the OLD running average; = 1 - torch
# momentum. All BN modules in act_tpu.models use this value so a single
# scalar retarget (rescale_bn_update) implements the BN-momentum schedule.
FLAX_BN_MOMENTUM = 0.9


def bn_momentum_schedule(epoch, bn_momentum: float = 0.1, bn_decay: float = 0.5,
                         decay_step: int = 20, lowest_decay: float = 0.01):
    """BN-momentum decay (reference ``build_lambda_bnsche``, utils/misc.py:60-66).

    Returns the *torch-convention* momentum (weight of the new batch statistic):
    ``max(bn_momentum * bn_decay ** (epoch / decay_step), lowest_decay)``.
    """
    return max(bn_momentum * bn_decay ** (epoch / decay_step), lowest_decay)


def bn_update_ratio(torch_momentum) -> float:
    """Rescale factor turning a flax BN running-stat update computed with the
    static ``FLAX_BN_MOMENTUM`` into one computed with a scheduled momentum.

    flax updates ``new = m0*old + (1-m0)*batch`` with ``m0`` baked into the
    module; ``old + r*(new-old)`` with ``r=(1-m_t)/(1-m0)`` equals
    ``m_t*old + (1-m_t)*batch`` exactly, so the per-epoch momentum becomes a
    traced scalar instead of a retrace (the ``BNMomentumScheduler`` analog,
    reference utils/misc.py:123-147). ``torch_momentum`` is ``1 - m_t``.
    """
    return float(torch_momentum) / (1.0 - FLAX_BN_MOMENTUM)


# ---------------------------------------------------------------------------
# point-cloud helpers
# ---------------------------------------------------------------------------

def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center to centroid and scale to the unit sphere (``datasets/ModelNetDataset.py:20``).

    sqrt(max(|p|²)) == max(|p|) bit-for-bit (sqrt is monotone, same winning
    element) — one sqrt instead of N on the hot loader path (~20µs/cloud)."""
    centroid = pc.mean(axis=0)
    pc = pc - centroid
    m = np.sqrt(np.einsum("ij,ij->i", pc, pc).max())
    return pc / max(m, 1e-12)


def random_subsample(key: jax.Array, points: jax.Array, n: int) -> jax.Array:
    """Random permutation subsample of a (B, N, 3) batch to n points per cloud."""
    B, N = points.shape[0], points.shape[1]
    keys = jax.random.split(key, B)
    idx = jax.vmap(lambda k: jax.random.permutation(k, N)[:n])(keys)
    return jnp.take_along_axis(points, idx[:, :, None], axis=1)


def random_dropping(key: jax.Array, points: jax.Array, group_size: int = 32,
                    max_drop_groups: int = 45, num_group: int = 64) -> jax.Array:
    """Randomly crop out up to ``max_drop_groups`` FPS groups and pad by repetition.

    Static-shape analog of the reference augmentation (``utils/misc.py:262-274``):
    instead of a ragged crop + zero-pad, points in dropped groups are replaced by
    points from kept groups so the output stays (B, N, 3).
    """
    from act_tpu import ops
    B, N, _ = points.shape
    k1, k2 = jax.random.split(key)
    num_drop = jax.random.randint(k1, (), 0, max_drop_groups + 1)
    center_idx = ops.furthest_point_sample(points, num_group)
    _, group_idx = ops.knn(points, jnp.take_along_axis(
        points, center_idx[:, :, None], axis=1), k=group_size)
    # groups [0, num_drop) are dropped; remap their point indices onto group num_drop
    drop = (jnp.arange(num_group)[None, :, None] < num_drop)
    keep_src = group_idx[:, -1:, :]  # last group always kept (num_drop <= 45 < 64)
    new_idx = jnp.where(drop, jnp.broadcast_to(keep_src, group_idx.shape), group_idx)
    flat = new_idx.reshape(B, -1)[:, :N]
    return jnp.take_along_axis(points, flat[:, :, None], axis=1)


def separate_point_cloud(key: jax.Array, xyz: jax.Array, num_points: int,
                         crop: int) -> Tuple[jax.Array, jax.Array]:
    """Split each cloud into (input without a crop-neighborhood, the cropped part).

    Fixed-size version of the reference ``seprate_point_cloud`` (misc.py:157-210):
    pick a random unit direction, rank points by distance to it, the nearest ``crop``
    points become the 'cropped' set and the rest the input.
    """
    B, N, _ = xyz.shape
    k1, _ = jax.random.split(key)
    direction = jax.random.normal(k1, (B, 1, 3))
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-8)
    dist = jnp.sum((xyz - direction) ** 2, axis=-1)  # B N
    order = jnp.argsort(dist, axis=-1)
    crop_idx = order[:, :crop]
    keep_idx = order[:, crop:]
    crop_part = jnp.take_along_axis(xyz, crop_idx[:, :, None], axis=1)
    keep_part = jnp.take_along_axis(xyz, keep_idx[:, :, None], axis=1)
    return keep_part, crop_part


def get_ptcloud_img(ptcloud: np.ndarray) -> np.ndarray:
    """Render a point cloud to an RGB image array (reference utils/misc.py:212-240)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(4, 4))
    x, z, y = ptcloud[:, 0], ptcloud[:, 1], ptcloud[:, 2]
    ax = fig.add_subplot(111, projection="3d")
    ax.axis("off")
    ax.view_init(30, 45)
    lim = float(np.abs(ptcloud).max())
    ax.set_xbound(-lim, lim)
    ax.set_ybound(-lim, lim)
    ax.set_zbound(-lim, lim)
    ax.scatter(x, y, z, zdir="z", c=x, cmap="jet", s=2)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return img


# ---------------------------------------------------------------------------
# parameter summaries
# ---------------------------------------------------------------------------

def summary_parameters(params, trainable_mask=None, logger=None) -> Tuple[int, int]:
    """Log a per-leaf parameter table and the TuningRatio%.

    Reference ``utils/misc.py:277-307``. ``trainable_mask`` is a pytree of bools of
    the same structure (True = trained), as produced by the optax freezing masks.
    """
    from act_tpu.utils.logger import print_log
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    if trainable_mask is not None:
        mask_flat = [m for _, m in jax.tree_util.tree_flatten_with_path(trainable_mask)[0]]
    else:
        mask_flat = [True] * len(flat)
    total, trained = 0, 0
    for (path, leaf), trainable in zip(flat, mask_flat):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        if trainable:
            trained += n
        name = jax.tree_util.keystr(path)
        print_log(f"  {name:<70s} {str(getattr(leaf, 'shape', ()))!s:>18s} "
                  f"{n:>12,d} {'train' if trainable else 'frozen'}", logger=logger)
    ratio = 100.0 * trained / max(total, 1)
    print_log(f"Total parameters: {total:,d} | trainable: {trained:,d} "
              f"| TuningRatio: {ratio:.2f}%", logger=logger)
    return total, trained
