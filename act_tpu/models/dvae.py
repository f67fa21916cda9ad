"""Discrete VAE tokenizer family (Stage I of ACT).

Reference: models/dvae.py — ``DiscreteVAE`` (:278-357) and the prompted variants
with a frozen 2D ViT/BERT teacher between codebook sampling and the decoder path
(``ACTPromptedDiscreteVAEwithVIT`` :360-615, ``...withBERT`` :617-857).

Pipeline: Group (ops.group_points) -> GroupEncoder -> DGCNN_1 -> Gumbel-softmax over
an 8192-way codebook -> [optional frozen prompted teacher] -> DGCNN_2 -> FoldingNet
decoder; loss = Chamfer-L1(coarse) + Chamfer-L1(fine) + KL(mean token posterior ‖
uniform). Whole models run inside one jit including the grouping kernels.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from act_tpu import ops
from act_tpu.models.build import MODELS
from act_tpu.utils.config import as_cfg
from act_tpu.models.common import (DGCNN, FoldingDecoder, GroupEncoder,
                                   dtype_from_cfg, fast_uniform, gumbel_softmax,
                                   gumbel_softmax_from_u)
from act_tpu.models.teacher import PromptedTeacher


class _DVAEBase(nn.Module):
    """Shared dVAE graph; subclasses decide whether a teacher sits in the middle."""
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        self.group_size = cfg.group_size
        self.num_group = cfg.num_group
        self.num_tokens = cfg.num_tokens
        self.tokens_dims = cfg.tokens_dims
        self.dtype = dtype_from_cfg(cfg)
        self.encoder = GroupEncoder(cfg.encoder_dims, dtype=self.dtype,
                                    name="encoder")
        self.dgcnn_1 = DGCNN(cfg.num_tokens, dtype=self.dtype, name="dgcnn_1")
        self.codebook = self.param(
            "codebook", nn.initializers.normal(stddev=1.0),
            (cfg.num_tokens, cfg.tokens_dims))
        self.dgcnn_2 = DGCNN(cfg.decoder_dims, dtype=self.dtype, name="dgcnn_2")
        self.decoder = FoldingDecoder(cfg.group_size, dtype=self.dtype,
                                      name="decoder")
        self._setup_teacher()

    def _setup_teacher(self):
        self.teacher = None

    def _teach(self, sampled: jax.Array, center: jax.Array,
               deterministic: bool) -> jax.Array:
        if self.teacher is None:
            return sampled
        return self.teacher(sampled, center, deterministic)

    # ------------------------------------------------------------------
    # forwards
    # ------------------------------------------------------------------

    def encode_logits(self, neighborhood: jax.Array, center: jax.Array,
                      train: bool = False) -> jax.Array:
        feats = self.encoder(neighborhood, train=train)  # B G C
        return self.dgcnn_1(feats, center)  # B G num_tokens

    def forward_tokenizer(self, neighborhood: jax.Array, center: jax.Array,
                          train: bool = False) -> jax.Array:
        """Hard token ids (BERT-style labels) — reference dvae.py:578-582."""
        logits = self.encode_logits(neighborhood, center, train=train)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)  # B G

    def forward_tokenizer_features(self, neighborhood: jax.Array, center: jax.Array,
                                   return_global: bool = True,
                                   train: bool = False) -> jax.Array:
        """Distillation targets: hard gumbel sample -> codebook -> teacher ->
        (optional) dgcnn_2 — reference dvae.py:584-592.

        ``train=True`` reproduces the reference's Stage-II behavior exactly:
        the frozen tokenizer is a submodule of a model in train mode, so its
        prompt dropout stays active and its BatchNorms use batch statistics
        even though no gradient flows (torch.no_grad does not imply eval()).

        Forward-value identity used for speed: this whole path sits under
        stop_gradient, and hard gumbel at tau=1 selects argmax(logits + g) —
        so instead of materializing the (B, G, 8192) softmax + one-hot and the
        one-hot @ codebook matmul, we gather codebook rows directly."""
        logits = self.encode_logits(neighborhood, center, train=train)
        if ops.use_fused_gumbel():
            # real-TPU path: noise drawn on-core inside the argmax kernel —
            # the (B, G, 8192) uniform tensor never exists in HBM
            ids = ops.gumbel_argmax_pallas(logits, self.make_rng("gumbel"))
        else:
            u = fast_uniform(self.make_rng("gumbel"), logits.shape,
                             minval=1e-10, maxval=1.0)
            # sown for the full-graph torch-equivalence tests (no-op in training)
            self.sow("intermediates", "gumbel_u", u)
            ids = jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1)  # (B, G)
        sampled = jnp.take(self.codebook, ids, axis=0)  # (B, G, C)
        feature = self._teach(sampled, center, deterministic=not train)
        if return_global:
            feature = self.dgcnn_2(feature, center)
        return feature

    def __call__(self, inp: jax.Array, temperature: float = 1.0,
                 hard: bool = False, train: bool = False) -> Tuple[jax.Array, ...]:
        neighborhood, center = ops.group_points(inp, self.num_group, self.group_size)
        logits = self.encode_logits(neighborhood, center, train=train)
        u = fast_uniform(self.make_rng("gumbel"), logits.shape,
                         minval=1e-10, maxval=1.0)
        self.sow("intermediates", "gumbel_u", u)
        soft_one_hot = gumbel_softmax_from_u(u, logits, tau=temperature,
                                             hard=hard)
        # HIGH: softmax weights/codebook are f32; the MXU default would
        # round the sampled features to bf16 (reference computes f32), while
        # HIGHEST's 6-pass f32 emulation doubles the MXU time of HIGH's
        # 3-pass (~2.6 -> ~1.3ms/step fwd+bwd at Stage-I shapes) for
        # precision beyond f32 the reference never had. bf16x3 keeps ~1e-7
        # relative error on these O(1)-magnitude operands.
        sampled = jnp.einsum("bgn,nc->bgc", soft_one_hot, self.codebook,
                             precision=jax.lax.Precision.HIGH)
        sampled = self._teach(sampled, center, deterministic=not train)
        feature = self.dgcnn_2(sampled, center)
        coarse, fine = self.decoder(feature, train=train)

        B = inp.shape[0]
        whole_fine = jax.lax.stop_gradient(
            (fine + center[:, :, None, :]).reshape(B, -1, 3))
        whole_coarse = jax.lax.stop_gradient(
            (coarse + center[:, :, None, :]).reshape(B, -1, 3))
        return whole_coarse, whole_fine, coarse, fine, neighborhood, logits

    # ------------------------------------------------------------------
    # losses (reference dvae.py:304-332)
    # ------------------------------------------------------------------

    def recon_loss(self, ret, gt=None) -> jax.Array:
        _, _, coarse, fine, group_gt, _ = ret
        B, G = coarse.shape[:2]
        coarse = coarse.reshape(B * G, -1, 3)
        fine = fine.reshape(B * G, -1, 3)
        group_gt = group_gt.reshape(B * G, -1, 3)
        return (ops.chamfer_distance_l1(coarse, group_gt)
                + ops.chamfer_distance_l1(fine, group_gt))

    def get_loss(self, ret, gt=None) -> Tuple[jax.Array, jax.Array]:
        loss_recon = self.recon_loss(ret, gt)
        logits = ret[-1]  # B G V
        softmax = jax.nn.softmax(logits, axis=-1)
        mean_softmax = jnp.mean(softmax, axis=1)  # B V
        log_qy = jnp.log(mean_softmax + 1e-20)
        log_uniform = jnp.log(1.0 / self.num_tokens)
        # torch F.kl_div(log_qy, log_uniform, log_target=True, 'batchmean')
        #   = sum(exp(log_uniform) * (log_uniform - log_qy)) / B
        B = log_qy.shape[0]
        loss_klv = jnp.sum(jnp.exp(log_uniform)
                           * (log_uniform - log_qy)) / B
        return loss_recon, loss_klv


@MODELS.register_module()
class DiscreteVAE(_DVAEBase):
    """Point-BERT-style baseline tokenizer, no cross-modal teacher
    (reference models/dvae.py:278-357; cfgs/autoencoder/pointbert_dvae.yaml)."""
    pass


@MODELS.register_module()
class ACTPromptedDiscreteVAEwithVIT(_DVAEBase):
    """dVAE with a frozen, deep-prompt-tuned pretrained 2D Transformer between
    the codebook and dgcnn_2 (reference models/dvae.py:360-615;
    visual_embed_pos=after_dgcnn1). ``visual_embed_type`` selects the teacher
    family exactly like the reference build_visual_embedding (dvae.py:394-410):
    'clip_*' -> CLIP visual transformer (pre-LN + ln_pre/ln_post + QuickGELU),
    anything else -> timm ViT layout. ``visual_embed_dim: none`` disables the
    teacher entirely (Point-BERT-style tokenizer with the prompted class name).
    """

    def _setup_teacher(self):
        cfg = as_cfg(self.config)
        ved = cfg.get("visual_embed_dim", "none")
        if ved is None or str(ved).lower() in ("none", "null", ""):
            self.teacher = None  # reference dvae.py:392-393
            return
        embed_type = str(cfg.get("visual_embed_type", "vit_base_patch16_224"))
        arch = "clip" if embed_type.lower().startswith("clip") else "vit"
        self.teacher = PromptedTeacher(
            embed_dim=cfg.visual_embed_dim,
            depth=int(cfg.get("visual_embed_depth", 12)),
            num_heads=int(cfg.get("visual_embed_heads", 12)),
            tokens_dims=cfg.tokens_dims,
            num_prompt_token=cfg.num_prompt_token,
            use_deep_prompt=cfg.use_deep_prompt,
            arch=arch,
            dtype=dtype_from_cfg(cfg),
            name="visual_embed",
        )


@MODELS.register_module()
class ACTPromptedDiscreteVAEwithBERT(_DVAEBase):
    """Same with a BERT-style (post-LN) language-model teacher
    (reference models/dvae.py:617-857)."""

    def _setup_teacher(self):
        cfg = as_cfg(self.config)
        self.teacher = PromptedTeacher(
            embed_dim=cfg.visual_embed_dim,
            depth=int(cfg.get("visual_embed_depth", 12)),
            num_heads=int(cfg.get("visual_embed_heads", 12)),
            tokens_dims=cfg.tokens_dims,
            num_prompt_token=cfg.num_prompt_token,
            use_deep_prompt=cfg.use_deep_prompt,
            arch="bert",
            dtype=dtype_from_cfg(cfg),
            name="visual_embed",
        )
