"""Batch point-cloud augmentations as vmapped, jittable functions.

Replaces the reference's per-sample python loops over CUDA tensors
(datasets/data_transforms.py) with vectorized ops keyed by per-sample PRNG —
they fuse into the train step's single XLA program instead of issuing B tiny
kernels per batch. Distribution parity: same ranges/stds as the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _split_per_sample(key: jax.Array, batch: int) -> jax.Array:
    return jax.random.split(key, batch)


@jax.jit
def scale_and_translate(key: jax.Array, pc: jax.Array,
                        scale_low: float = 2.0 / 3.0, scale_high: float = 3.0 / 2.0,
                        translate_range: float = 0.2) -> jax.Array:
    """Per-sample anisotropic scale + translate (PointcloudScaleAndTranslate,
    data_transforms.py:20-34 — the pretrain default)."""
    B = pc.shape[0]
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (B, 1, 3), minval=scale_low, maxval=scale_high)
    shift = jax.random.uniform(k2, (B, 1, 3), minval=-translate_range,
                               maxval=translate_range)
    return pc * scale + shift


@jax.jit
def rotate_y(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Per-sample random rotation about the up (y) axis (PointcloudRotate,
    data_transforms.py:6-18 — the finetune default)."""
    B = pc.shape[0]
    angle = jax.random.uniform(key, (B,)) * 2 * jnp.pi
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    # row-major R as in the reference: pc @ R
    R = jnp.stack([c, zeros, s,
                   zeros, ones, zeros,
                   -s, zeros, c], axis=-1).reshape(B, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", pc, R)


@jax.jit
def jitter(key: jax.Array, pc: jax.Array, std: float = 0.01,
           clip: float = 0.05) -> jax.Array:
    noise = jnp.clip(jax.random.normal(key, pc.shape) * std, -clip, clip)
    return pc + noise


@jax.jit
def scale(key: jax.Array, pc: jax.Array, scale_low: float = 2.0 / 3.0,
          scale_high: float = 3.0 / 2.0) -> jax.Array:
    B = pc.shape[0]
    s = jax.random.uniform(key, (B, 1, 3), minval=scale_low, maxval=scale_high)
    return pc * s


@jax.jit
def translate(key: jax.Array, pc: jax.Array,
              translate_range: float = 0.2) -> jax.Array:
    B = pc.shape[0]
    t = jax.random.uniform(key, (B, 1, 3), minval=-translate_range,
                           maxval=translate_range)
    return pc + t


@jax.jit
def random_input_dropout(key: jax.Array, pc: jax.Array,
                         max_dropout_ratio: float = 0.5) -> jax.Array:
    """Replace a random fraction of points with the sample's first point
    (PointcloudRandomInputDropout, data_transforms.py:80-95)."""
    B, N, _ = pc.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(k2, (B, N)) <= ratio
    first = pc[:, 0:1, :]
    return jnp.where(drop[:, :, None], first, pc)


@jax.jit
def random_horizontal_flip(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Flip non-up axes as max-coordinate reflection with prob 0.95*0.5
    (RandomHorizontalFlip, data_transforms.py:98-120, upright z)."""
    B = pc.shape[0]
    k0, kx, ky = jax.random.split(key, 3)
    do = jax.random.uniform(k0, (B, 1)) < 0.95
    out = pc
    for axis, k in ((0, kx), (1, ky)):
        flip = (jax.random.uniform(k, (B, 1)) < 0.5) & do
        cmax = jnp.max(out[:, :, axis], axis=1, keepdims=True)
        flipped = cmax - out[:, :, axis]
        out = out.at[:, :, axis].set(
            jnp.where(flip, flipped, out[:, :, axis]))
    return out


# numpy provider augments used by the segmentation CLIs
# (part_segmentation/provider.py — random_scale_point_cloud + shift_point_cloud)

def np_random_scale(rng, batch, scale_low=0.8, scale_high=1.25):
    import numpy as np
    s = rng.uniform(scale_low, scale_high, (batch.shape[0], 1, 1))
    return batch * s


def np_random_shift(rng, batch, shift_range=0.1):
    import numpy as np
    t = rng.uniform(-shift_range, shift_range, (batch.shape[0], 1, 3))
    return batch + t


TRANSFORMS = {
    "PointcloudScaleAndTranslate": scale_and_translate,
    "PointcloudRotate": rotate_y,
    "PointcloudJitter": jitter,
    "PointcloudScale": scale,
    "PointcloudTranslate": translate,
    "PointcloudRandomInputDropout": random_input_dropout,
    "RandomHorizontalFlip": random_horizontal_flip,
}
