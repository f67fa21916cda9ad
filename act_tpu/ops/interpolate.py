"""TPU-native 3-NN inverse-distance feature interpolation.

Reference: PointNetFeaturePropagation
(part_segmentation/models/pointnet2_utils.py:262-312) — for every unknown
point, gather its k=3 nearest known features and blend with normalized 1/d
weights. The reference path (``three_nn_interpolate_ref``) materializes a
(B, N, k, C) dynamic gather whose VJP is a scatter-add; on TPU the scatter
lowered to a ~2 GB/s serialized fusion and the gather+mul+sum chain cost
~25ms/step of the S3DIS train step (49% of the whole step, profiled round 4).

The TPU formulation: the blend is a ROW-SPARSE matmul — interp = W @ feats
with W (B, N, S) holding the 3 normalized weights in each row. S is small
(64-128 group centers), so the dense W is cheap (one fused elementwise pass
over (B, N, k, S) compare/select) and both the forward and the entire VJP
(dW = g @ featsᵀ, dfeats = Wᵀ @ g) are MXU matmuls — no gather, no scatter
anywhere. The kNN itself reuses :func:`act_tpu.ops.group.knn` (MXU distance
+ exact tie-broken k-smallest).

Value parity with the reference path: each W row has exactly the k weights
at the kNN indices (distinct by construction), so the matmul computes the
same weighted sum, reassociated over S — pinned by tests/test_ops.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from act_tpu.ops.group import knn


@partial(jax.jit, static_argnames=("k",))
def three_nn_interpolate(unknown_xyz: jax.Array, known_xyz: jax.Array,
                         known_feats: jax.Array, k: int = 3) -> jax.Array:
    """unknown_xyz: (B, N, 3), known_xyz: (B, S, 3), known_feats: (B, S, C)
    -> (B, N, C) inverse-distance 3-NN blend (matmul formulation)."""
    _, idx = knn(known_xyz, unknown_xyz, k)  # (B, N, k) neighbor indices
    S = known_xyz.shape[1]
    onehot = (idx[..., None] == jnp.arange(S, dtype=idx.dtype))  # (B,N,k,S)
    oh = onehot.astype(jnp.float32)
    # Recompute the selected squared distances DIFFERENTIABLY from the
    # indices: the TPU kNN's dist output comes out of the Pallas k-smallest
    # kernel, which carries no VJP (the reference path's d is differentiable,
    # and torch autograd flows through the 1/d weights into both xyz args —
    # caught by the round-4 TPU grad-parity drive). The one-hot einsum keeps
    # the neighbor-coordinate fetch and its transpose on the MXU.
    nn_xyz = jnp.einsum("bnks,bsc->bnkc", oh, known_xyz,
                        precision=jax.lax.Precision.HIGHEST)  # (B, N, k, 3)
    d = jnp.sum((unknown_xyz[:, :, None, :] - nn_xyz) ** 2, axis=-1)
    w = 1.0 / (d + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)  # (B, N, k) f32
    # dense row weights: W[b, n, s] = sum_j w[b, n, j] * [idx[b, n, j] == s]
    # (one fused elementwise pass; idx rows are distinct so this is exact)
    W = jnp.sum(oh * w[..., None], axis=2)  # (B, N, S) f32
    # HIGHEST: weights/features may be f32 (the reference computes f32);
    # the blend is 2*N*S*C FLOPs — tiny even at 6-pass emulation
    return jnp.einsum("bns,bsc->bnc", W, known_feats.astype(W.dtype),
                      precision=jax.lax.Precision.HIGHEST
                      ).astype(known_feats.dtype)
