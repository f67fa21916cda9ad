"""The grouping front-end: FPS centers -> kNN neighborhoods -> center-normalized groups.

TPU-native equivalent of the reference ``Group`` module (models/dvae.py:154-183,
duplicated in both segmentation subprojects) built from ``pointnet2_ops`` FPS +
``KNN_CUDA``. This is the hot irregular op that runs in every forward of every model.

Design: FPS runs as the sequential Pallas kernel (:mod:`act_tpu.ops.fps`); the kNN is
a (S, N) squared-distance matrix via an MXU matmul + ``jax.lax.top_k`` — on TPU the
distance matrix for the ACT regime (64 x 1024 or 128 x 2048) is small and XLA fuses
the distance computation, top-k, gather and center-subtract into a few kernels.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from act_tpu.ops.fps import furthest_point_sample
from act_tpu.ops.topk import k_smallest_pallas
from act_tpu.ops._backend import (current_kernel_mesh, kernel_mesh,
                                  shard_over_batch, use_pallas)
from act_tpu.ops.reference import (gather_coords, gather_points, knn_ref,
                                   square_distance)


def _use_approx_knn() -> bool:
    # read OUTSIDE jit only (wrappers below): the env value is threaded into
    # the jitted functions as a static arg so flipping ACT_TPU_KNN
    # mid-process invalidates the jit cache instead of silently reusing the
    # previously compiled path (ADVICE r2).
    import os
    return os.environ.get("ACT_TPU_KNN", "").lower() == "approx"


@partial(jax.jit, static_argnames=("k", "mesh", "approx"))
def _knn_tpu(ref_points: jax.Array, query: jax.Array, k: int, mesh=None,
             approx: bool = False):
    """TPU kNN: exact k-smallest Pallas extraction over the MXU distance
    matrix (ops/topk.py). For k << N the iterative extract-min kernel avoids
    the full bitonic sort over N lanes that both ``lax.top_k`` and
    ``approx_min_k(recall=1.0)`` lower to. ``ACT_TPU_KNN=approx`` restores
    the approx_min_k path for A/B runs. Neighbor sets are exact; ties break
    to the smallest index like ``knn_ref``."""
    d = square_distance(query, ref_points)
    if approx:
        dist, idx = jax.lax.approx_min_k(d, k, recall_target=1.0)
        return dist, idx.astype(jnp.int32)
    if mesh is not None:
        return shard_over_batch(mesh, lambda dd: k_smallest_pallas(dd, k), d)
    return k_smallest_pallas(d, k)


def knn(ref_points: jax.Array, query: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors: (B,N,C) ref, (B,S,C) query -> (sq dists, idx) (B,S,k)."""
    if use_pallas():  # i.e. running on real TPU
        return _knn_tpu(ref_points, query, k, current_kernel_mesh(),
                        _use_approx_knn())
    return knn_ref(ref_points, query, k)


def group_points(xyz: jax.Array, num_group: int, group_size: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """xyz: (B, N, 3) -> (neighborhood (B, G, M, 3) center-normalized, center (B, G, 3)).

    Matches reference Group.forward (models/dvae.py:161-183): FPS to G centers, kNN of
    size M around each center, gather, subtract center.
    """
    # the active kernel mesh / knn flavor are part of the jit cache key (a
    # trace under a mesh bakes shard_maps into the program; the ACT_TPU_KNN
    # env read must not be latched by a cached trace)
    return _group_points(xyz, num_group, group_size, current_kernel_mesh(),
                         _use_approx_knn())


@partial(jax.jit, static_argnames=("num_group", "group_size", "mesh", "approx"))
def _group_points(xyz: jax.Array, num_group: int, group_size: int, mesh,
                  approx: bool = False) -> Tuple[jax.Array, jax.Array]:
    with kernel_mesh(mesh):
        center_idx = furthest_point_sample(xyz, num_group)  # (B, G)
        center = gather_points(xyz, center_idx)  # (B, G, 3)
        if use_pallas():
            _, idx = _knn_tpu(xyz, center, group_size, mesh, approx)
        else:
            _, idx = knn_ref(xyz, center, group_size)  # (B, G, M)
        neighborhood = gather_coords(xyz, idx)  # (B, G, M, 3), Pallas on TPU
    neighborhood = neighborhood - center[:, :, None, :]
    return neighborhood, center


def graph_feature_idx(coor_k: jax.Array, coor_q: jax.Array, k: int = 4) -> jax.Array:
    """DGCNN neighbor indices: for each query position, the k nearest key positions.

    coor_k/coor_q: (B, N, 3) coordinates. Returns (B, Nq, k) int32. Reference:
    DGCNN.get_graph_feature's KNN(k=4) call (models/dvae.py:59-79); neighbor features
    are then gathered and concatenated as (nbr - self, self) by the model code.
    """
    return _graph_feature_idx(coor_k, coor_q, k, current_kernel_mesh(),
                              _use_approx_knn())


@partial(jax.jit, static_argnames=("k", "mesh", "approx"))
def _graph_feature_idx(coor_k: jax.Array, coor_q: jax.Array, k: int,
                       mesh, approx: bool = False) -> jax.Array:
    d = square_distance(coor_q, coor_k)
    if use_pallas():
        if approx:
            _, idx = jax.lax.approx_min_k(d, k, recall_target=1.0)
        elif mesh is not None:
            _, idx = shard_over_batch(
                mesh, lambda dd: k_smallest_pallas(dd, k), d)
        else:
            _, idx = k_smallest_pallas(d, k)
        return idx.astype(jnp.int32)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def fps_subsample(xyz: jax.Array, n_fps: int, n_out: int, key: jax.Array) -> jax.Array:
    """FPS to ``n_fps`` points then a random ``n_out``-subset in random order —
    the reference's finetune-time resampling trick
    (tools/runner_finetune.py:141-157: ``fps_idx[:, np.random.choice(
    point_all, npoints, False)]`` — the choice both subsets AND shuffles).

    xyz: (B, N, 3) -> (B, n_out, 3). ``n_fps`` is capped at N like the
    reference's `if points.size(1) < point_all` guard (:151-152). When the cap
    hits (n_fps == N, e.g. real 2048-pt ScanObjectNN at npoints=2048), FPS
    over ALL N points is just a reordering, and composed with the uniform
    random choice the result is a uniformly random subset in uniformly random
    order — identical distribution without the O(S*N) kernel."""
    B, N = xyz.shape[:2]
    n_fps = min(n_fps, N)
    keys = jax.random.split(key, B)
    sub = jax.vmap(lambda kk: jax.random.permutation(kk, n_fps)[:n_out])(keys)
    if n_fps == N:
        return gather_coords(xyz, sub)
    idx = furthest_point_sample(xyz, n_fps)  # (B, n_fps)
    # compose the FPS selection with the random sub-permutation so the cloud
    # is gathered ONCE (profiled: the two-stage 8192->2400->2048 coordinate
    # gathers cost 1.4 + 1.3 ms/step on the finetune path; the composed
    # index gather is a single Pallas one-hot gather)
    # the index compose itself is a (B, n_fps) -> (B, n_out) int gather: XLA's
    # per-row dynamic gather is DMA-descriptor bound even at this size
    # (profiled 0.67 ms at 2.2 GB/s on the finetune path) — route it through
    # the one-hot gather kernel too (exact for indices < 2^24 at HIGHEST)
    final = gather_coords(idx.astype(jnp.float32)[:, :, None], sub)
    final = final[:, :, 0].astype(jnp.int32)
    return gather_coords(xyz, final)
