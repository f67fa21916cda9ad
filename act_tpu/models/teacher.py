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

from act_tpu.models.common import Block, FastDropout, Mlp, trunc_normal_init


class PostLNBlock(nn.Module):
    """BERT-style post-LN transformer block (for the BERT teacher variant).
    LN eps 1e-12 matches HuggingFace BertConfig.layer_norm_eps."""
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None
    ln_eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 q_keep_from: int = 0) -> jax.Array:
        from act_tpu.models.common import Attention
        h = Attention(self.num_heads, qkv_bias=True, dtype=self.dtype,
                      name="attn")(x, deterministic, q_keep_from=q_keep_from)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(
            x[:, q_keep_from:] + h)
        h = Mlp(int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(x, deterministic)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x + h)
        return x


class CLIPBlock(nn.Module):
    """CLIP ResidualAttentionBlock: pre-LN, fused in_proj attention, QuickGELU
    MLP (the reference reaches these via clip.load(...).visual.transformer
    .resblocks, models/dvae.py:394-403). Submodule names mirror CLIP's
    checkpoint keys (ln_1/ln_2/attn/c_fc/c_proj) for the converter."""
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 q_keep_from: int = 0) -> jax.Array:
        from act_tpu.models.common import Attention
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x[:, q_keep_from:] + Attention(
            self.num_heads, qkv_bias=True, dtype=self.dtype,
            name="attn")(h, deterministic, q_keep_from=q_keep_from)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(dim * 4, dtype=self.dtype, name="c_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        h = nn.Dense(dim, dtype=self.dtype, name="c_proj")(h)
        return x + h


class PromptedTeacher(nn.Module):
    """proj_pre -> [prompts | tokens] -> frozen 2D transformer (pos added at every
    layer, prompts re-spliced per layer when deep) -> final LN -> strip prompts ->
    proj_post.

    arch: 'vit' (pre-LN, qkv bias, final LayerNorm — timm ViT-B layout),
    'clip' (ln_pre before the stack, QuickGELU resblocks, ln_post after —
    CLIP visual-transformer layout, reference models/dvae.py:394-403,500-534;
    we implement the *intended* per-sample attention semantics: the reference's
    deep-prompt CLIP path omits the NLD->LND transpose, which would make torch
    MultiheadAttention attend across the batch dim) or
    'bert' (post-LN blocks, no final LN).
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
        if self.arch == "clip":
            return CLIPBlock(self.num_heads, dtype=self.dtype,
                             name=f"blocks_{i}")
        # timm ViT uses LayerNorm eps=1e-6 (vs torch default 1e-5)
        return Block(self.num_heads, qkv_bias=True, dtype=self.dtype,
                     ln_eps=1e-6, name=f"blocks_{i}")

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
            pdrop = FastDropout(self.prompt_dropout)
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

        if self.arch == "clip":
            # CLIP's ln_pre is applied to the full [prompt|tokens] sequence
            # after prompt concat (dvae.py:544-546 via visual_embed[0])
            x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        # pos handling per arch: ViT/CLIP add pos at EVERY block input
        # (dvae.py:510-511,566-573: blk(x + pos)); BERT adds it ONCE at the
        # encoder input (dvae.py:744: visual_embed(x + pos)[0] — HF BertEncoder
        # has no per-layer pos hook; the reference's BERT deep-prompt indexing
        # visual_embed[0][i] is not runnable torch, so for deep prompts we fold
        # the deep prompt pos into the spliced prompt tokens instead).
        pos_every_layer = self.arch != "bert"

        if P > 0 and self.use_deep_prompt:
            # Deep prompts replace the prompt rows at EVERY layer, so each
            # layer's prompt-row OUTPUTS are discarded (dvae.py:556-566) —
            # prompts only contribute as attention keys/values within their
            # own layer. Restrict queries/MLP/residuals to the token rows
            # (q_keep_from=P): exact same outputs, ~half the per-layer FLOPs
            # at the default 64-prompt/64-token shapes.
            tok = x[:, P:]
            tok_pos = pos[:, P:]
            prompt_in = x[:, :P]  # layer-0 prompts (ln_pre'd for clip)
            prompt_pos0 = pos[:, :P]
            for i in range(self.depth):
                if i == 0:
                    pr, prpos = prompt_in, prompt_pos0
                else:
                    pr = pdrop(jnp.broadcast_to(deep_prompt[i - 1][None],
                                                (B, P, self.embed_dim)),
                               deterministic=deterministic)
                    prpos = jnp.broadcast_to(deep_pos[i - 1][None],
                                             (B, P, self.embed_dim))
                add_tok_pos = pos_every_layer or i == 0
                inp = jnp.concatenate(
                    [pr + prpos, tok + tok_pos if add_tok_pos else tok],
                    axis=1)
                tok = self._block(i)(inp, deterministic, q_keep_from=P)
            x = tok  # (B, G, D)
        else:
            for i in range(self.depth):
                if pos_every_layer or i == 0:
                    x = x + pos
                x = self._block(i)(x, deterministic)
            if P > 0:
                x = x[:, P:]

        # final LN applied after stripping prompts — LN is per-row, identical
        if self.arch == "vit":
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)  # timm eps
        elif self.arch == "clip":
            x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        return nn.Dense(self.tokens_dims, dtype=self.dtype, name="proj_post")(x)
