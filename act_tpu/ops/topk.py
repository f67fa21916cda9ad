"""k-smallest extraction over the lane axis as a Pallas TPU kernel.

The kNN in ``Group`` (reference models/dvae.py:120-152 ``knn_point`` /
KNN_CUDA) reduces to "indices of the k smallest entries per row" of a
(rows, N) distance matrix.  ``jax.lax.approx_min_k`` at ``recall_target=1.0``
lowers to a full bitonic sort network over N lanes — ~2.1ms of the Stage-II
step for the (128·64, 1024) k=32 regime.  For k << N an iterative
extract-min is far cheaper: k passes of (row-min, first-index-of-min,
mask-out) over a VMEM-resident tile, each a plain full-width VPU reduction
(the same max+min-index-of-max trick as the FPS kernel — a per-row lane
``argmin`` would lower to a serial select chain on Mosaic).

Rows ride the sublane axis, N rides lanes; a (rows_chunk, Npad) tile is
read from HBM once and all k passes run from VMEM.  Ties break to the
smallest index, matching ``jax.lax.top_k`` determinism (ops/reference.py
``knn_ref``).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from act_tpu.ops._backend import interpret_flag, round_up

_BIG = 3.4e38  # python float: a jnp constant would be captured as a tracer


def _ksmallest_kernel(n: int, k: int, d_ref, val_ref, idx_ref, cur_ref):
    """d_ref: (Rc, Npad) f32; val_ref: (Rc, Kpad) f32; idx_ref: (Rc, Kpad)
    int32; cur_ref: (Rc, Npad) f32 scratch (working copy, mined entries
    overwritten with +inf)."""
    rc, npad = d_ref.shape
    kpad = idx_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rc, npad), 1)
    klane = jax.lax.broadcasted_iota(jnp.int32, (rc, kpad), 1)
    cur_ref[:] = jnp.where(lane < n, d_ref[:], jnp.float32(_BIG))

    def body(i, carry):
        vals, idxs = carry
        cur = cur_ref[:]
        m = jnp.min(cur, axis=1, keepdims=True)  # (Rc, 1)
        sel = jnp.min(jnp.where(cur == m, lane, jnp.int32(npad)),
                      axis=1, keepdims=True)  # first index of the min
        vals = jnp.where(klane == i, m, vals)
        idxs = jnp.where(klane == i, sel, idxs)
        cur_ref[:] = jnp.where(lane == sel, jnp.float32(_BIG), cur)
        return vals, idxs

    init = (jnp.zeros((rc, kpad), jnp.float32),
            jnp.zeros((rc, kpad), jnp.int32))
    vals, idxs = jax.lax.fori_loop(0, k, body, init, unroll=False)
    val_ref[:] = vals
    idx_ref[:] = idxs


@partial(jax.jit, static_argnames=("k",))
def k_smallest_pallas(d: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Per-row k smallest of ``d`` (..., N) -> (values, indices) (..., k),
    ascending, ties to the smallest index. Exact (recall 1.0)."""
    *lead, n = d.shape
    rows = 1
    for s in lead:
        rows *= s
    d2 = jax.lax.stop_gradient(d).astype(jnp.float32).reshape(rows, n)
    npad = round_up(n, 128)
    kpad = round_up(k, 128)
    # chunk rows by the TOTAL VMEM working set: input tile + scratch f32
    # planes + input double buffering (~3 planes); see the sizing note in
    # fps.py — a single-plane budget OOMs scoped vmem at large N. Cap at 256
    # rows: measured 1.49ms vs 1.98ms (chunk 512) per call at the (8192,
    # 1024) k=32 bench shape — taller tiles pipeline worse.
    budget_elems = (9 * 1024 * 1024) // 4
    chunk = max(8, min(256, (budget_elems // (3 * npad)) // 8 * 8))
    chunk = min(chunk, round_up(rows, 8))
    rpad = round_up(rows, chunk)
    if rpad != rows or npad != n:
        d2 = jnp.pad(d2, ((0, rpad - rows), (0, npad - n)))

    vals, idxs = pl.pallas_call(
        partial(_ksmallest_kernel, n, k),
        grid=(rpad // chunk,),
        in_specs=[pl.BlockSpec((chunk, npad), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((chunk, kpad), lambda r: (r, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rpad, kpad), jnp.float32),
                   jax.ShapeDtypeStruct((rpad, kpad), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((chunk, npad), jnp.float32)],
        interpret=interpret_flag(),
    )(d2)
    vals = vals[:rows, :k].reshape(*lead, k)
    idxs = idxs[:rows, :k].reshape(*lead, k)
    return vals, idxs.astype(jnp.int32)
