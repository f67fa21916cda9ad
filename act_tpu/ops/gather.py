"""Point gather as a Pallas one-hot matmul kernel.

TPU-native equivalent of ``pointnet2_ops.gather_operation``-style index gathers
for the hot Group path (reference models/dvae.py:176-183). XLA's native gather
on (B, S, 3) point rows is DMA-bound at ~3 floats per descriptor (profiled
1.79ms for the B=128, S=2048 neighborhood gather); here the selection runs as
an MXU matmul against an on-the-fly one-hot matrix built in VMEM — never
materialized in HBM. ~0.3ms at the same shapes.

Used automatically by :func:`act_tpu.ops.reference.gather_points` on TPU for
large gathers of narrow rows (C <= 8, S >= 256).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from act_tpu.ops._backend import interpret_flag, round_up


def _gather_kernel(pts_ref, idx_ref, out_ref):
    """pts_ref: (1, 8, Npad) f32; idx_ref: (1, 1, Sc) int32; out_ref: (1, 8, Sc).

    out[:, s] = pts[:, idx[s]] via (8, Npad) @ onehot(Npad, Sc)."""
    npad = pts_ref.shape[2]
    sc = idx_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (npad, sc), 0)
    onehot = (rows == idx_ref[0]).astype(jnp.float32)
    # HIGHEST: the MXU's default single-pass bf16 multiply rounds the
    # gathered VALUES to bf16 (preferred_element_type only sets the
    # accumulator); with the f32-synthesis passes the 0/1 selection is exact
    out_ref[0] = jax.lax.dot(pts_ref[0], onehot,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("chunk",))
def gather_points_pallas(points: jax.Array, idx: jax.Array,
                         chunk: int = 0) -> jax.Array:
    """points: (B, N, C<=8) float, idx: (B, S) int32 -> (B, S, C).

    chunk=0 picks the output-column tile automatically: 1024 for small point
    tables (measured ~10% faster than 512 at the bench shapes), then halves
    so the (Npad, chunk) f32 one-hot working set stays within the ~8MB
    scoped-VMEM budget the fps/topk kernels use (a 4096x1024 one-hot alone
    is 16MB and OOMs Mosaic)."""
    B, N, C = points.shape
    S = idx.shape[1]
    npad = round_up(N, 8)
    if chunk == 0:
        chunk = 1024 if npad <= 2048 else 512
        while npad * chunk * 4 > 8 * 1024 * 1024 and chunk > 128:
            chunk //= 2
    spad = round_up(S, chunk)
    dtype = points.dtype

    pts_t = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))  # (B, C, N)
    pts_t = jnp.pad(pts_t, ((0, 0), (0, 8 - C), (0, npad - N)))
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, spad - S)))[:, None, :]

    out = pl.pallas_call(
        _gather_kernel,
        grid=(B, spad // chunk),
        in_specs=[
            pl.BlockSpec((1, 8, npad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, chunk), lambda b, s: (b, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, spad), jnp.float32),
        interpret=interpret_flag(),
    )(pts_t, idx_p)
    return jnp.transpose(out[:, :C, :S], (0, 2, 1)).astype(dtype)
