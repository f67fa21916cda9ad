"""Dense-prediction heads: ShapeNetPart part segmentation + S3DIS semantic seg.

One shared implementation replacing the reference's two copy-pasted subprojects
(part_segmentation/models/pt.py:178-355 and semantic_segmentation/models/pt.py:
150-300): frozen-format student backbone with multi-scale feature fetch at blocks
{3, 7, 11}, global max+avg pooling (+ 16-way object-label embedding for part seg),
PointNet 3-NN inverse-distance feature propagation back to all N points
(part_segmentation/models/pointnet2_utils.py:262-312), and a conv-bn-relu-dropout
scoring head with log-softmax outputs.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from act_tpu import ops
from act_tpu.models.build import MODELS
from act_tpu.utils.config import as_cfg
from act_tpu.models.common import (GroupEncoder, PosEmbedMLP,
                                   TransformerEncoder, dtype_from_cfg)
import numpy as np


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance-weighted upsampling + pointwise MLP.

    unknown_xyz (B,N,3), known_xyz (B,S,3), unknown_feats (B,N,D1) or None,
    known_feats (B,S,D2) -> (B, N, mlp[-1]).
    """
    mlp: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool = False):
        interp = ops.three_nn_interpolate(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            new = jnp.concatenate(
                [unknown_feats.astype(interp.dtype), interp], axis=-1)
        else:
            new = interp
        for i, ch in enumerate(self.mlp):
            new = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}")(new)
            # momentum 0.9 = torch BatchNorm default 0.1 (flax convention is
            # the running-average weight); BN stats f32, outputs in the
            # compute dtype (the GroupEncoder policy)
            new = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               dtype=self.dtype, name=f"bn{i}")(new)
            new = nn.relu(new)
        return new


class SegBackbone(nn.Module):
    """Group -> encoder -> 12 blocks with feature fetch at {3,7,11} (no cls token)."""
    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    drop_path_rate: float = 0.1
    encoder_dims: int = 384
    group_size: int = 32
    num_group: int = 128
    fetch_idx: Tuple[int, ...] = (3, 7, 11)
    dtype: Any = None

    @nn.compact
    def __call__(self, pts, train: bool = False):
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        tokens = GroupEncoder(self.encoder_dims, dtype=self.dtype,
                              name="encoder")(neighborhood, train=train)
        pos = PosEmbedMLP(self.trans_dim, dtype=self.dtype,
                          name="pos_embed")(center)
        # shared scanned stack (models/common.py); legacy flat blocks_i
        # checkpoints are re-nested + stacked on load (adapt_block_layout)
        _, feats = TransformerEncoder(
            embed_dim=self.trans_dim, depth=self.depth,
            num_heads=self.num_heads, drop_path_rate=self.drop_path_rate,
            dtype=self.dtype,
            name="blocks")(tokens, pos, deterministic=not train,
                           return_hidden=self.fetch_idx)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        feats = [norm(f) for f in feats]
        return jnp.concatenate(feats, axis=-1), center  # (B, G, 1152), (B, G, 3)


class _SegHead(nn.Module):
    """Shared scoring head: propagate to N points, concat globals, conv stack."""
    cls_dim: int
    with_label: bool  # 16-way object label conv (part seg only)
    trans_dim: int = 384
    dtype: Any = None

    @nn.compact
    def __call__(self, pts, seg_feats, center, cls_label_one_hot=None,
                 train: bool = False):
        B, N, _ = pts.shape
        x = seg_feats  # (B, G, 1152)
        x_max = jnp.max(x, axis=1)   # (B, 1152)
        x_avg = jnp.mean(x, axis=1)  # (B, 1152)
        globs = [x_max, x_avg]
        if self.with_label:
            lab = nn.Dense(64, use_bias=False, dtype=self.dtype,
                           name="label_conv")(cls_label_one_hot)  # (B, 64)
            lab = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               dtype=self.dtype, name="label_bn")(lab)
            lab = nn.leaky_relu(lab, negative_slope=0.2)
            globs.append(lab)
        x_global = jnp.concatenate(globs, axis=-1)  # (B, 2304[+64])

        f_level_0 = FeaturePropagation([self.trans_dim * 4, 1024],
                                       dtype=self.dtype,
                                       name="propagation_0")(
            pts, center, pts, x, train=train)  # (B, N, 1024)

        # convs1 over concat([f_level_0, x_global_broadcast]) WITHOUT
        # materializing the (B, N, 2304+) global broadcast: the global block
        # is identical across N, so _ConcatDense computes its contribution
        # once per batch row and broadcast-adds (2/3 of the convs1 FLOPs and
        # the broadcast's HBM round trip at the reference concat order —
        # reference pt.py torch.cat((f_level_0, x_global_feature), 1)).
        # Param layout/name unchanged.
        from act_tpu.models.common import _ConcatDense
        h = _ConcatDense(512, g_last=True, dtype=self.dtype,
                         name="convs1")(x_global, f_level_0)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bns1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=not train)
        h = nn.Dense(256, dtype=self.dtype, name="convs2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bns2")(h)
        h = nn.relu(h)
        # convs3/log_softmax stay f32 (losses-f32 policy; bf16 input + f32
        # kernel promotes)
        h = nn.Dense(self.cls_dim, name="convs3")(h)
        return jax.nn.log_softmax(h.astype(jnp.float32), axis=-1)


@MODELS.register_module()
class PartSegTransformer(nn.Module):
    """ShapeNetPart model (reference part_segmentation/models/pt.py get_model)."""
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        self.cls_dim = int(cfg.get("cls_dim", 50))
        # config `dtype: bf16` enables the same compute policy as every other
        # graph: matmul/conv activations bf16, params/norm stats/losses f32
        dtype = dtype_from_cfg(cfg)
        self.backbone = SegBackbone(
            num_group=int(cfg.get("num_group", 128)),
            group_size=int(cfg.get("group_size", 32)),
            dtype=dtype, name="backbone")
        self.head = _SegHead(self.cls_dim, with_label=True, dtype=dtype,
                             name="head")

    def __call__(self, pts, cls_label_one_hot, train: bool = False):
        seg_feats, center = self.backbone(pts, train=train)
        return self.head(pts, seg_feats, center, cls_label_one_hot, train=train)


@MODELS.register_module()
class SemSegTransformer(nn.Module):
    """S3DIS model (reference semantic_segmentation/models/pt.py get_model)."""
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        self.cls_dim = int(cfg.get("cls_dim", 13))
        dtype = dtype_from_cfg(cfg)  # see PartSegTransformer
        self.backbone = SegBackbone(
            num_group=int(cfg.get("num_group", 128)),
            group_size=int(cfg.get("group_size", 32)),
            dtype=dtype, name="backbone")
        self.head = _SegHead(self.cls_dim, with_label=False, dtype=dtype,
                             name="head")

    def __call__(self, pts, train: bool = False):
        seg_feats, center = self.backbone(pts, train=train)
        return self.head(pts, seg_feats, center, train=train)


def nll_seg_loss(log_probs: jax.Array, target: jax.Array,
                 weight: Optional[jax.Array] = None) -> jax.Array:
    """NLL over (B, N, C) log-probs vs (B, N) labels; optional per-class weights
    (semantic seg uses inverse-frequency weights, semantic_segmentation/main.py:112)."""
    nll = -jnp.take_along_axis(log_probs, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if weight is None:
        return jnp.mean(nll)
    w = weight[target.astype(jnp.int32)]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
