"""PointTransformer — the downstream classification model.

Reference: models/act.py:727-910. Group -> GroupEncoder -> 12 ViT blocks ->
concat[cls token, max-pool of patch tokens] -> head. ``transfer_type`` selects the
head and the freezing policy (full / linear / mlp-3 / side / bit-fit); freezing is
realized as an optax parameter mask produced by :func:`trainable_mask`.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from act_tpu import ops
from act_tpu.models.build import MODELS
from act_tpu.utils.config import as_cfg
from act_tpu.models.common import (GroupEncoder, PosEmbedMLP,
                                   TransformerEncoder, dtype_from_cfg)


class Mlp3Head(nn.Module):
    """Linear-BN-ReLU-Dropout x2 -> Linear classification head
    (the reference's 'original head', models/act.py:778-788)."""
    cls_dim: int
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = dict(use_running_average=not train, momentum=0.9,
                  axis_name=self.bn_axis_name if train else None)
        for i in range(2):
            x = nn.Dense(256, name=f"fc{i + 1}")(x)
            x = nn.BatchNorm(name=f"bn{i + 1}", **bn)(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5)(x, deterministic=not train)
        return nn.Dense(self.cls_dim, name="fc3")(x)


@MODELS.register_module()
class PointTransformer(nn.Module):
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        self.embed_dim = cfg.embed_dim
        self.cls_dim = cfg.cls_dim
        self.num_group = cfg.num_group
        self.group_size = cfg.group_size
        self.transfer_type = cfg.get("transfer_type", "full")
        # config `dtype: bf16` enables the same compute policy as the
        # pretrain graphs: matmul/conv activations bf16 on the MXU, params
        # and all norm layers f32, head/losses f32 (profiled: the all-f32
        # finetune blocks ran at the 46 TFLOP/s f32 MXU ceiling and the
        # encoder convs at the f32 HBM roofline)
        self.dtype = dtype_from_cfg(cfg)

        self.encoder = GroupEncoder(cfg.encoder_dims, dtype=self.dtype,
                                    name="encoder")
        self.use_reduce = cfg.encoder_dims != cfg.embed_dim
        if self.use_reduce:
            self.reduce_dim = nn.Dense(cfg.embed_dim, dtype=self.dtype,
                                       name="reduce_dim")
        self.cls_token = self.param("cls_token", nn.initializers.zeros,
                                    (1, 1, cfg.embed_dim))
        self.cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                                  (1, 1, cfg.embed_dim))
        self.pos_embed = PosEmbedMLP(cfg.embed_dim, dtype=self.dtype,
                                     name="pos_embed")
        self.blocks = TransformerEncoder(
            embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
            drop_path_rate=cfg.drop_path_rate, dtype=self.dtype,
            scan=cfg.get("scan", None), name="blocks")
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        if self.transfer_type == "linear":
            self.cls_head_finetune = nn.Dense(self.cls_dim,
                                              name="cls_head_finetune")
        else:
            self.cls_head_finetune = Mlp3Head(self.cls_dim,
                                              name="cls_head_finetune")

        if self.transfer_type == "side":
            # Side-Tuning (reference setup_side, models/act.py:811-817)
            self.side_alpha = self.param("side_alpha", nn.initializers.zeros, (1,))
            self.side = GroupEncoder(cfg.embed_dim, dtype=self.dtype,
                                     name="side")
            self.side_projection = nn.Dense(cfg.embed_dim, use_bias=False,
                                            dtype=self.dtype,
                                            name="side_projection")

    def __call__(self, pts: jax.Array, train: bool = False) -> jax.Array:
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        tokens = self.encoder(neighborhood, train=train)
        if self.use_reduce:
            tokens = self.reduce_dim(tokens)
        B = tokens.shape[0]

        side_out = None
        if self.transfer_type == "side":
            side_out = self.side_projection(self.side(neighborhood, train=train))

        cls_tok = jnp.broadcast_to(self.cls_token, (B, 1, self.embed_dim))
        cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, self.embed_dim))
        pos = jnp.concatenate([cls_pos, self.pos_embed(center)], axis=1)
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        x, _ = self.blocks(x, pos, deterministic=not train)
        x = self.norm(x)

        if side_out is not None:
            alpha = jax.nn.sigmoid(self.side_alpha)
            blended = alpha * x[:, 1:] + (1 - alpha) * side_out
            concat_f = jnp.concatenate([x[:, 0], jnp.max(blended, axis=1)], -1)
        else:
            concat_f = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], -1)

        if self.transfer_type == "linear":
            return self.cls_head_finetune(concat_f)
        return self.cls_head_finetune(concat_f, train=train)

    def extract_feature(self, pts: jax.Array) -> jax.Array:
        """[cls ‖ maxpool] feature for SVM probes / t-SNE (runner_pretrain.py:245+)."""
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        tokens = self.encoder(neighborhood)
        if self.use_reduce:
            tokens = self.reduce_dim(tokens)
        B = tokens.shape[0]
        cls_tok = jnp.broadcast_to(self.cls_token, (B, 1, self.embed_dim))
        cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, self.embed_dim))
        pos = jnp.concatenate([cls_pos, self.pos_embed(center)], axis=1)
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        x, _ = self.blocks(x, pos, deterministic=True)
        x = self.norm(x)
        return jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], -1)


def get_loss_acc(logits: jax.Array, labels: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """CE loss + accuracy% (reference get_loss_acc, models/act.py:823-827)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(
        logp, labels[:, None].astype(jnp.int32), axis=-1))
    acc = jnp.mean(jnp.argmax(logits, -1) == labels) * 100.0
    return loss, acc


def trainable_mask(params, transfer_type: str):
    """Pytree of bools marking trainable leaves, mirroring the reference's
    requires_grad policy (models/act.py:798-809): 'full' trains everything;
    'linear'/'mlp-3' only head params (path contains 'cls'); 'side' also side
    params; 'bit-fit' biases + head."""
    def decide(path: str) -> bool:
        if transfer_type == "full":
            return True
        if transfer_type in ("linear", "mlp-3"):
            return "cls" in path
        if transfer_type == "side":
            return "side" in path or "cls" in path
        if transfer_type == "bit-fit":
            return "bias" in path or "cls" in path
        raise ValueError(f"unknown transfer_type {transfer_type}")

    flat = jax.tree_util.tree_flatten_with_path(params)
    import jax.tree_util as jtu
    return jtu.tree_map_with_path(
        lambda path, _: decide(jtu.keystr(path)), params)
