"""Pure-XLA reference implementations of the irregular point-cloud ops.

These are the semantic ground truth for the Pallas kernels (tests compare against
them) and the fallback path on non-TPU backends. Semantics match the reference
repo's own slow equivalents: ``knn_point``/``square_distance`` (models/dvae.py:120-152),
the O(N·S) torch FPS (part_segmentation/models/pointnet2_utils.py:60-81), and the
Chamfer extension (extensions/chamfer_dist/chamfer.cu).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distance.

    src: (..., N, C), dst: (..., M, C) -> (..., N, M).
    """
    # highest precision: the MXU's default bf16 accumulation is not accurate enough
    # for nearest-neighbor argmins on unit-sphere clouds
    d = -2.0 * jnp.einsum("...nc,...mc->...nm", src, dst,
                          precision=jax.lax.Precision.HIGHEST)
    d = d + jnp.sum(src ** 2, axis=-1)[..., :, None]
    d = d + jnp.sum(dst ** 2, axis=-1)[..., None, :]
    return d


@partial(jax.jit, static_argnames=("n_samples",))
def furthest_point_sample_ref(points: jax.Array, n_samples: int,
                              start_idx=0) -> jax.Array:
    """Greedy farthest-point sampling. points: (B, N, 3) -> (B, n_samples) int32.

    ``start_idx``: scalar or per-cloud (B,) start indices. The default 0
    matches the reference CUDA kernel's deterministic start; the reference's
    pure torch/numpy fallbacks use a random start
    (part_segmentation/models/pointnet2_utils.py:72) — pass
    ``jax.random.randint(key, (B,), 0, N)`` for that behavior.
    """
    B, N, _ = points.shape
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    def body(i, state):
        dists, idxs, last = state  # dists: (B,N), last: (B,3)
        d = jnp.sum((points - last[:, None, :]) ** 2, axis=-1)  # (B,N)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)  # (B,)
        idxs = idxs.at[:, i].set(nxt)
        last = jnp.take_along_axis(points, nxt[:, None, None], axis=1)[:, 0, :]
        return dists, idxs, last

    idxs0 = jnp.zeros((B, n_samples), jnp.int32).at[:, 0].set(start)
    last0 = jnp.take_along_axis(points, start[:, None, None], axis=1)[:, 0, :]
    dists0 = jnp.full((B, N), jnp.inf, points.dtype)
    _, idxs, _ = jax.lax.fori_loop(1, n_samples, body, (dists0, idxs0, last0))
    return idxs


@partial(jax.jit, static_argnames=("k",))
def knn_ref(ref_points: jax.Array, query: jax.Array, k: int
            ) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each query in ref_points.

    ref_points: (B, N, C), query: (B, S, C) -> (dists (B,S,k) squared, idx (B,S,k)).
    Ties broken by smallest index (matches jax.lax.top_k determinism).
    """
    d = square_distance(query, ref_points)  # (B, S, N)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points: (B, N, C), idx: (B, ...) int -> (B, ..., C) gathered along N."""
    B = points.shape[0]
    C = points.shape[-1]
    flat_idx = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return out.reshape(idx.shape + (C,))


def gather_coords(points: jax.Array, idx: jax.Array) -> jax.Array:
    """gather_points for non-differentiated point COORDINATES (xyz).

    On TPU, large coordinate gathers route to the Pallas one-hot-matmul
    kernel (ops/gather.py) — XLA's row gather at C=3 is ~6x slower
    (DMA-descriptor bound, profiled 1.79ms vs ~0.3ms at B=128, S=2048).
    Only for inputs that carry no gradient (raw clouds); feature gathers
    keep the differentiable take_along_axis path."""
    from act_tpu.ops._backend import (current_kernel_mesh, shard_over_batch,
                                      use_pallas)
    B, N, C = points.shape
    flat_idx = idx.reshape(B, -1)
    if use_pallas() and C <= 8 and flat_idx.shape[1] >= 256:
        from act_tpu.ops.gather import gather_points_pallas
        pts = jax.lax.stop_gradient(points)
        mesh = current_kernel_mesh()
        if mesh is not None:
            out = shard_over_batch(mesh, gather_points_pallas, pts, flat_idx)
        else:
            out = gather_points_pallas(pts, flat_idx)
        return out.reshape(idx.shape + (C,))
    return gather_points(points, idx)


@jax.jit
def chamfer_ref(x: jax.Array, y: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bidirectional nearest-neighbor squared distances.

    x: (B, N, 3), y: (B, M, 3) -> (dist1 (B,N), dist2 (B,M), idx1 (B,N), idx2 (B,M)).
    Same contract as the reference CUDA extension forward
    (extensions/chamfer_dist/chamfer.cu:15-145).
    """
    d = square_distance(x, y)  # (B, N, M)
    dist1 = jnp.min(d, axis=-1)
    idx1 = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist2 = jnp.min(d, axis=-2)
    idx2 = jnp.argmin(d, axis=-2).astype(jnp.int32)
    return dist1, dist2, idx1, idx2


@partial(jax.jit, static_argnames=("k",))
def three_nn_interpolate_ref(unknown_xyz: jax.Array, known_xyz: jax.Array,
                             known_feats: jax.Array, k: int = 3) -> jax.Array:
    """Inverse-distance-weighted k-NN feature interpolation.

    unknown_xyz: (B, N, 3), known_xyz: (B, S, 3), known_feats: (B, S, C) -> (B, N, C).
    Reference: part_segmentation/models/pointnet2_utils.py:262-312
    (PointNetFeaturePropagation with 3-NN 1/d weights).
    """
    d, idx = knn_ref(known_xyz, unknown_xyz, k)  # (B,N,k) squared dists
    w = 1.0 / (d + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighbor_feats = gather_points(known_feats, idx)  # (B,N,k,C)
    return jnp.sum(neighbor_feats * w[..., None], axis=2)


@partial(jax.jit, static_argnames=("n_sample",))
def ball_query_ref(radius: float, n_sample: int, xyz: jax.Array,
                   new_xyz: jax.Array) -> jax.Array:
    """Indices of up to n_sample points within radius of each query center.

    xyz: (B, N, 3), new_xyz: (B, S, 3) -> (B, S, n_sample) int32. Points beyond the
    radius are replaced by the first in-radius point, matching the reference
    (semantic_segmentation/pointnet_util.py query_ball_point semantics).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    d = square_distance(new_xyz, xyz)  # (B,S,N)
    in_range = d <= radius ** 2
    # sort point indices with out-of-range ones pushed to the end
    arange = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    keyed = jnp.where(in_range, arange, N)
    sorted_idx = jnp.sort(keyed, axis=-1)[..., :n_sample]
    first = sorted_idx[..., :1]
    group_idx = jnp.where(sorted_idx == N, first, sorted_idx)
    # degenerate case: no point in range -> use nearest point
    nearest = jnp.argmin(d, axis=-1).astype(jnp.int32)[..., None]
    group_idx = jnp.where(group_idx == N, nearest, group_idx)
    return group_idx.astype(jnp.int32)
