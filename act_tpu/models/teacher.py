"""Frozen, deep-prompt-tuned 2D Transformer teacher.

The cross-modal teacher of ACT: a pretrained 2D ViT (or BERT-style) encoder applied
to dVAE codebook tokens, with learnable prompt tokens (re-)spliced at every layer
(reference ACTPromptedDiscreteVAEwithVIT.build_visual_embedding + the deep-prompt
forward, models/dvae.py:390-444,536-576). The teacher backbone itself stays frozen —
enforced at the optimizer level via a parameter mask (see engine/builder), the JAX
analog of ``param.requires_grad = False``.

Pretrained weights load from a local torch checkpoint via
``act_tpu.engine.torch_convert.load_timm_vit`` (this environment has no network
egress; the reference downloads from timm at build time, models/dvae.py:405).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from act_tpu.models.common import Block, Mlp, trunc_normal_init


class PostLNBlock(nn.Module):
    """BERT-style post-LN transformer block (for the BERT teacher variant)."""
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from act_tpu.models.common import Attention
        h = Attention(self.num_heads, qkv_bias=True, dtype=self.dtype,
                      name="attn")(x, deterministic)
        x = nn.LayerNorm(name="norm1")(x + h)
        h = Mlp(int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(x, deterministic)
        x = nn.LayerNorm(name="norm2")(x + h)
        return x


class PromptedTeacher(nn.Module):
    """proj_pre -> [prompts | tokens] -> frozen 2D transformer (pos added at every
    layer, prompts re-spliced per layer when deep) -> final LN -> strip prompts ->
    proj_post.

    arch: 'vit' (pre-LN, qkv bias, final LayerNorm — timm ViT-B layout) or
    'bert' (post-LN blocks).
    """
    embed_dim: int = 768        # teacher width (visual_embed_dim)
    depth: int = 12
    num_heads: int = 12
    tokens_dims: int = 384      # dVAE token width on both sides of the teacher
    num_prompt_token: int = 64
    use_deep_prompt: bool = True
    prompt_dropout: float = 0.1
    arch: str = "vit"
    dtype: Any = None

    def _block(self, i: int):
        if self.arch == "bert":
            return PostLNBlock(self.num_heads, dtype=self.dtype,
                               name=f"blocks_{i}")
        return Block(self.num_heads, qkv_bias=True, dtype=self.dtype,
                     name=f"blocks_{i}")

    @nn.compact
    def __call__(self, tokens: jax.Array, center: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        B, G, _ = tokens.shape
        P = self.num_prompt_token

        # positional embedding of the 3D group centers (dvae.py:413-417)
        pos = nn.Dense(128, dtype=self.dtype, name="pos_fc1")(center)
        pos = nn.gelu(pos, approximate=False)
        pos = nn.Dense(self.embed_dim, dtype=self.dtype, name="pos_fc2")(pos)

        feature = nn.Dense(self.embed_dim, dtype=self.dtype,
                           name="proj_pre")(tokens)

        if P > 0:
            prompt = self.param("visual_prompt_token", trunc_normal_init(),
                                (1, P, self.embed_dim))
            prompt_pos = self.param("visual_prompt_pos", trunc_normal_init(),
                                    (1, P, self.embed_dim))
            pdrop = nn.Dropout(self.prompt_dropout)
            x = jnp.concatenate(
                [pdrop(jnp.broadcast_to(prompt, (B, P, self.embed_dim)),
                       deterministic=deterministic), feature], axis=1)
            pos = jnp.concatenate(
                [jnp.broadcast_to(prompt_pos, (B, P, self.embed_dim)), pos], axis=1)
            if self.use_deep_prompt:
                deep_prompt = self.param("deep_prompt_tokens", trunc_normal_init(),
                                         (self.depth - 1, P, self.embed_dim))
                deep_pos = self.param("deep_prompt_pos", trunc_normal_init(),
                                      (self.depth - 1, P, self.embed_dim))
        else:
            x = feature

        for i in range(self.depth):
            if P > 0 and self.use_deep_prompt and i >= 1:
                # re-splice fresh prompts + prompt pos at every layer
                # (dvae.py:556-566)
                dp = jnp.broadcast_to(deep_prompt[i - 1][None],
                                      (B, P, self.embed_dim))
                x = jnp.concatenate(
                    [pdrop(dp, deterministic=deterministic), x[:, P:]], axis=1)
                pos = jnp.concatenate(
                    [jnp.broadcast_to(deep_pos[i - 1][None],
                                      (B, P, self.embed_dim)), pos[:, P:]], axis=1)
            x = self._block(i)(x + pos, deterministic)

        if self.arch == "vit":
            x = nn.LayerNorm(name="norm")(x)
        if P > 0:
            x = x[:, P:]
        return nn.Dense(self.tokens_dims, dtype=self.dtype, name="proj_post")(x)
