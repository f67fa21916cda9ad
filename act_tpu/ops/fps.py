"""Farthest-point sampling as a Pallas TPU kernel.

TPU-native equivalent of the reference's ``pointnet2_ops.furthest_point_sample`` CUDA
kernel (used at utils/misc.py:39-46, models/dvae.py Group, tools/runner_finetune.py
:141-157). The greedy max-min loop is inherently sequential over the S output samples,
so the kernel keeps the whole cloud and the running min-distance vector resident in
VMEM and runs the S-step loop on-chip — one HBM read of the points per batch row,
no per-step kernel launches.

Layout: points are passed transposed as (B, 3, N) so the large N axis lands on the
128-wide lane dimension (the natural (B, N, 3) layout would pad 3 -> 128 lanes and
waste 40x VMEM/bandwidth). Selected indices are accumulated in a lane-aligned int32
vector via masked selects (scalar stores to VMEM at dynamic offsets don't vectorize).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from act_tpu.ops.reference import furthest_point_sample_ref
from act_tpu.ops._backend import (current_kernel_mesh, interpret_flag,
                                  round_up, shard_over_batch, use_pallas)


def _fps_kernel(n_points: int, n_samples: int, pts_ref, out_ref, dist_ref):
    """One batch row per grid step.

    pts_ref: (1, 3, Npad) VMEM f32, out_ref: (1, 1, Spad) VMEM int32,
    dist_ref: (1, Npad) f32 VMEM scratch (running min squared distance).
    """
    npad = pts_ref.shape[2]
    spad = out_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    slane = jax.lax.broadcasted_iota(jnp.int32, (1, spad), 1)
    valid = lane < n_points

    x = pts_ref[0, 0:1, :]
    y = pts_ref[0, 1:2, :]
    z = pts_ref[0, 2:3, :]

    dist_ref[:] = jnp.where(valid, jnp.float32(3.4e38), jnp.float32(-1.0))

    def select_coords(idx):
        onehot = (lane == idx).astype(jnp.float32)
        return (jnp.sum(x * onehot), jnp.sum(y * onehot), jnp.sum(z * onehot))

    def body(i, carry):
        cx, cy, cz, idx_vec = carry
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        # padded lanes: initialized to -1 and d >= 0, so min keeps them there
        dmin = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dmin
        # first-argmax as max + min-index-of-max (vectorizes; lane argmax
        # lowers to a serial select chain on Mosaic)
        dmax = jnp.max(dmin)
        nxt = jnp.min(jnp.where(dmin == dmax, lane, jnp.int32(npad))).astype(
            jnp.int32)
        idx_vec = jnp.where(slane == i, nxt, idx_vec)
        cx, cy, cz = select_coords(nxt)
        return cx, cy, cz, idx_vec

    cx, cy, cz = select_coords(jnp.int32(0))
    init = (cx, cy, cz, jnp.zeros((1, spad), jnp.int32))
    _, _, _, idx_vec = jax.lax.fori_loop(1, n_samples, body, init, unroll=False)
    out_ref[0] = idx_vec


@partial(jax.jit, static_argnames=("n_samples",))
def _fps_pallas(points: jax.Array, n_samples: int) -> jax.Array:
    B, N, _ = points.shape
    npad = round_up(N, 128)
    spad = round_up(n_samples, 128)
    # indices are not differentiable; without the stop_gradient, jax tries (and
    # fails) to derive a JVP rule for the pallas_call when the cloud is a tracer
    points = jax.lax.stop_gradient(points)
    pts_t = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if npad != N:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, npad - N)))

    out = pl.pallas_call(
        partial(_fps_kernel, N, n_samples),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, npad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, spad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, spad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
        interpret=interpret_flag(),
    )(pts_t)
    return out[:, 0, :n_samples]


def _fps_kernel_batched(n_points: int, n_samples: int,
                        x_ref, y_ref, z_ref, s_ref, out_ref, dist_ref):
    """Batch-vectorized FPS: a chunk of rows lives in the sublane axis and every
    per-step operation (distance update, row-wise argmax, center extraction via
    one-hot reduction, index write) is a full-width VPU op. The S-step loop is
    the only sequential dependency — S iterations total per chunk, vs S*rows
    grid steps for the row-at-a-time kernel.

    x/y/z_ref: (Bc, Npad) f32; s_ref: (Bc, 128) int32 per-row start indices
    (lane 0 carries the value); out_ref: (Bc, Spad) int32;
    dist_ref: (Bc, Npad) f32 scratch.
    """
    bc, npad = x_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, npad), 1)
    blane = jax.lax.broadcasted_iota(jnp.int32, (bc, 128), 1)
    valid = lane < n_points

    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    dist_ref[:] = jnp.where(valid, jnp.float32(3.4e38), jnp.float32(-1.0))

    def select_coords(idx_col):
        # one compare pass + three where-masked reduces (the x*onehot form
        # pays an extra int->f32 convert pass; measured -4% on the S-loop)
        m = lane == idx_col  # (Bc, Npad)
        return (jnp.sum(jnp.where(m, x, 0.0), axis=1, keepdims=True),
                jnp.sum(jnp.where(m, y, 0.0), axis=1, keepdims=True),
                jnp.sum(jnp.where(m, z, 0.0), axis=1, keepdims=True))

    def body(s, carry):
        cx, cy, cz, buf = carry
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        # no per-iter lane masking: padded lanes were initialized to dist -1
        # and d >= 0, so the running min keeps them at -1 (one fewer VPU pass
        # over (Bc, Npad) in the S-step hot loop)
        dmin = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dmin
        # first-argmax via max + min-index-of-max: plain max/min reductions
        # vectorize on the VPU where a per-row lane argmax lowers to a slow
        # serial select chain
        dmax = jnp.max(dmin, axis=1, keepdims=True)  # (Bc, 1)
        nxt = jnp.min(jnp.where(dmin == dmax, lane, jnp.int32(npad)),
                      axis=1, keepdims=True)  # (Bc, 1) first max index
        # indices accumulate in a rolling (Bc, 128) buffer flushed to the
        # output block-at-a-time (lane-aligned dynamic store): a select over
        # 128 lanes per step instead of Spad (measured -17% at S=2400)
        buf = jnp.where(blane == (s & 127), nxt, buf)

        @pl.when((s & 127) == 127)
        def _flush():
            out_ref[:, pl.dslice((s >> 7) * 128, 128)] = buf

        cx, cy, cz = select_coords(nxt)
        return cx, cy, cz, buf

    start = s_ref[:, 0:1]  # (Bc, 1) per-row start index (default all-zero)
    cx, cy, cz = select_coords(start)
    init = (cx, cy, cz,
            jnp.where(blane == 0, start, jnp.zeros((bc, 128), jnp.int32)))
    *_, buf = jax.lax.fori_loop(1, n_samples, body, init, unroll=False)
    # tail flush: the last (possibly partial) 128-block; sample 0 (= index 0)
    # rides along in lane 0 of block 0 when n_samples <= 128
    last = ((n_samples - 1) // 128) * 128
    out_ref[:, last:last + 128] = buf


@partial(jax.jit, static_argnames=("n_samples",))
def _fps_pallas_batched(points: jax.Array, n_samples: int,
                        start_idx: jax.Array | None = None) -> jax.Array:
    B, N, _ = points.shape
    npad = round_up(N, 128)
    spad = round_up(n_samples, 128)
    # chunk rows by the TOTAL VMEM working set: 4 f32 (Bc, Npad) planes
    # (x/y/z + dist scratch) + the (Bc, Spad) index tile + input double
    # buffering — budgeting one plane at 4MB OOM'd scoped vmem (16MB) at the
    # SVM-probe shapes (B=256, N=8192)
    budget_elems = (10 * 1024 * 1024) // 4
    chunk = max(8, min(256, (budget_elems // (5 * npad)) // 8 * 8))
    chunk = min(chunk, round_up(B, 8))
    bpad = round_up(B, chunk)

    points = jax.lax.stop_gradient(points).astype(jnp.float32)
    planes = [jnp.pad(points[:, :, i], ((0, bpad - B), (0, npad - N)))
              for i in range(3)]
    if start_idx is None:
        start_idx = jnp.zeros((B,), jnp.int32)
    start_plane = jnp.pad(start_idx.astype(jnp.int32)[:, None],
                          ((0, bpad - B), (0, 127)))  # (bpad, 128), lane 0

    out = pl.pallas_call(
        partial(_fps_kernel_batched, N, n_samples),
        grid=(bpad // chunk,),
        in_specs=[pl.BlockSpec((chunk, npad), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)] * 3
                 + [pl.BlockSpec((chunk, 128), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, spad), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, spad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((chunk, npad), jnp.float32)],
        interpret=interpret_flag(),
    )(*planes, start_plane)
    return out[:B, :n_samples]


def furthest_point_sample(points: jax.Array, n_samples: int,
                          start_idx=None) -> jax.Array:
    """points: (B, N, 3) -> (B, n_samples) int32 indices.

    Batch-in-sublanes Pallas kernel on TPU; pure-XLA ``fori_loop`` reference
    elsewhere. ``start_idx``: None/0 (default) starts at index 0, matching the
    reference CUDA kernel's deterministic start; a scalar or per-cloud (B,)
    int32 array seeds the greedy walk — the reference's pure torch/numpy
    fallbacks use a random start
    (part_segmentation/models/pointnet2_utils.py:72), reproduced by passing
    ``jax.random.randint(key, (B,), 0, N)``. Index-exact vs the reference impl
    at every start, up to one-ulp distance ties: at large N the kernel's
    ``(x-cx)**2 + ...`` and the reference's ``sum((p-last)**2, -1)`` can round
    a farthest-distance tie differently and swap one adjacent pick pair (same
    selected SET; measured on-chip 2026-08-19: 3/256 rows at (256, 8192)->1024,
    each a 2-column swap with relative tie gap ~1e-7).

    Perf note: the batched kernel's per-step reductions are expressed as
    max + min-index-of-max (plain VPU reductions); with a per-row lane
    ``argmax`` Mosaic emitted a serial select chain that made it 8x *slower*
    than the row-grid kernel — with the rewrite it profiles ~87x faster
    (0.05ms vs 4.2ms at B=128, N=1024, S=64 on v5e).
    """
    if start_idx is not None:
        start_idx = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32),
                                     (points.shape[0],))
    if use_pallas():
        mesh = current_kernel_mesh()
        if mesh is not None:
            if start_idx is None:
                return shard_over_batch(
                    mesh, lambda p: _fps_pallas_batched(p, n_samples), points)
            return shard_over_batch(
                mesh, lambda p, s: _fps_pallas_batched(p, n_samples, s),
                points, start_idx)
        return _fps_pallas_batched(points, n_samples, start_idx)
    if start_idx is None:
        return furthest_point_sample_ref(points, n_samples)
    return furthest_point_sample_ref(points, n_samples, start_idx)
