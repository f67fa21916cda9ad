"""ACT pretraining models: masked student transformers + distillation heads.

Reference: models/act.py — ``VisableOnlyMaskTransformer`` (:148-309), ``MaskTransformer``
(:532-723), ``ACT_PointDistillation`` (:1099-1258), ``ACT_PointBERT`` (:913-1095).

TPU-first design notes:
- masking uses a *fixed* mask count int(ratio*G) (the reference already does,
  models/act.py:255), so visible/masked gathers are static-shape take_along_axis of
  argsorted positions — no boolean advanced indexing, no dynamic shapes under jit;
- the frozen tokenizer/teacher forward runs inside the same jit as the student
  (stop_gradient replaces torch.no_grad);
- the per-batch-item cosine-loss python loop (reference models/act.py:1244-1254) is
  a single vectorized mean — numerically identical;
- the MoCo queue lives in a mutable 'buffers' variable collection; the momentum
  encoder update is an EMA on the param tree applied in the train step.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from act_tpu import ops
from act_tpu.models.build import MODELS
from act_tpu.utils.config import as_cfg
from act_tpu.models.common import (GroupEncoder, PosEmbedMLP, TransformerDecoder,
                                   TransformerEncoder, dtype_from_cfg,
                                   trunc_normal_init)
from act_tpu.models.dvae import ACTPromptedDiscreteVAEwithVIT


# ---------------------------------------------------------------------------
# masking (static mask counts)
# ---------------------------------------------------------------------------

def random_mask(key: jax.Array, batch: int, num_group: int, num_mask: int
                ) -> jax.Array:
    """Per-row random boolean mask with exactly ``num_mask`` True entries
    (reference _mask_center_rand, models/act.py:244-267)."""
    scores = jax.random.uniform(key, (batch, num_group))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    return ranks < num_mask


def block_mask(key: jax.Array, center: jax.Array, num_mask: int) -> jax.Array:
    """Mask the ``num_mask`` groups nearest to a random seed group
    (reference _mask_center_block, models/act.py:215-242)."""
    B, G, _ = center.shape
    k1, k2 = jax.random.split(key)
    seed_idx = jax.random.randint(k1, (B,), 0, G)
    seed = jnp.take_along_axis(center, seed_idx[:, None, None], axis=1)  # (B,1,3)
    d = jnp.sum((center - seed) ** 2, axis=-1)  # (B, G)
    ranks = jnp.argsort(jnp.argsort(d, axis=-1), axis=-1)
    return ranks < num_mask


def bernoulli_ratio_mask(key: jax.Array, batch: int, num_group: int,
                         lo: float, hi: float) -> jax.Array:
    """Bernoulli(ratio) mask with a shared per-batch ratio ~ U[lo, hi] — the
    jit-friendly stand-in for the reference MaskTransformer's exact-count
    masking (models/act.py:641-654); training-level equivalence is pinned by
    tests/test_models.py::TestMaskDistributionEquivalence."""
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (), minval=lo, maxval=hi)
    return jax.random.uniform(k2, (batch, num_group)) < ratio


def split_by_mask(mask: jax.Array, num_mask: int) -> Tuple[jax.Array, jax.Array]:
    """mask (B, G) bool -> (visible_idx (B, G-num_mask), masked_idx (B, num_mask)),
    each preserving original token order (stable sort on the 0/1 key), matching
    the reference's boolean indexing ``x[~mask].reshape(B, -1, C)``."""
    order = jnp.argsort(mask.astype(jnp.int32), axis=-1, stable=True)
    G = mask.shape[1]
    return order[:, :G - num_mask], order[:, G - num_mask:]


def take_tokens(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x: (B, G, C), idx: (B, S) -> (B, S, C)."""
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


# ---------------------------------------------------------------------------
# student encoders
# ---------------------------------------------------------------------------

class VisableOnlyMaskTransformer(nn.Module):
    """MAE-style student: encode all groups, keep only visible tokens + cls
    (reference models/act.py:148-309; name kept for checkpoint-key parity)."""
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        tc = cfg.transformer_config
        self.mask_ratio = tc.mask_ratio
        self.mask_type = tc.mask_type
        self.embed_dim = tc.embed_dim
        self.depth = tc.depth
        self.num_heads = tc.num_heads
        self.cls_dim = tc.cls_dim
        self.encoder_dims = cfg.dvae_config.encoder_dims
        self.dtype = dtype_from_cfg(tc)
        self.encoder = GroupEncoder(self.encoder_dims, dtype=self.dtype,
                                    name="encoder")
        self.use_reduce = self.encoder_dims != self.embed_dim
        if self.use_reduce:
            self.reduce_dim = nn.Dense(self.embed_dim, name="reduce_dim")
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(1.0),
                                    (1, 1, self.embed_dim))
        self.cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                                  (1, 1, self.embed_dim))
        self.pos_embed = PosEmbedMLP(self.embed_dim, dtype=self.dtype,
                                     name="pos_embed")
        self.blocks = TransformerEncoder(
            embed_dim=self.embed_dim, depth=self.depth, num_heads=self.num_heads,
            drop_path_rate=tc.drop_path_rate, dtype=self.dtype,
            remat=bool(tc.get("remat", False)),
            scan=tc.get("scan", None), name="blocks")
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.cls_head = nn.Sequential([
            nn.Dense(self.cls_dim), nn.gelu, nn.Dense(self.cls_dim)])

    def make_mask(self, center: jax.Array, noaug: bool) -> Tuple[jax.Array, int]:
        B, G, _ = center.shape
        num_mask = 0 if noaug else int(self.mask_ratio * G)
        if num_mask == 0:
            return jnp.zeros((B, G), bool), 0
        key = self.make_rng("mask")
        if self.mask_type == "rand":
            return random_mask(key, B, G, num_mask), num_mask
        return block_mask(key, center, num_mask), num_mask

    def __call__(self, neighborhood: jax.Array, center: jax.Array,
                 train: bool = False, noaug: bool = False,
                 only_cls_tokens: bool = False, register_shallow_hook: int = -1):
        B, G = center.shape[:2]
        mask, num_mask = self.make_mask(center, noaug)
        vis_idx, _ = split_by_mask(mask, num_mask)
        if self.mask_type == "block" and num_mask > 0:
            # Block masking picks a spatially contiguous masked region, so the
            # visible subset is anti-correlated with it — embedding only the
            # visible groups would bias train-mode BN batch statistics vs the
            # reference (which embeds all G). Embed everything and gather
            # (reference act.py:700-707; ADVICE r2).
            x_all = self.encoder(neighborhood, train=train)  # (B, G, C)
            x_vis = take_tokens(x_all, vis_idx)  # (B, V, C)
        else:
            # Embed only the visible groups (the masked ones' embeddings are
            # discarded — reference act.py:700-707 embeds all G then boolean-
            # indexes, 5x the embed FLOPs at mask_ratio 0.8). Identical math
            # per group; in train mode the BatchNorm batch statistics are
            # estimated over the visible subset of groups — for 'rand'
            # masking a uniformly random, unbiased sample over ~B*V*M >= 50k
            # points (pinned by TestVisibleOnlyEmbedding).
            vis_nbr = jnp.take_along_axis(
                neighborhood, vis_idx[:, :, None, None], axis=1)  # (B, V, M, 3)
            x_vis = self.encoder(vis_nbr, train=train)  # (B, V, C)
        if self.use_reduce:
            x_vis = self.reduce_dim(x_vis)
        vis_center = take_tokens(center, vis_idx)
        pos = self.pos_embed(vis_center)

        cls_tok = jnp.broadcast_to(self.cls_token, (B, 1, self.embed_dim))
        cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, self.embed_dim))
        x = jnp.concatenate([cls_tok, x_vis], axis=1)
        pos = jnp.concatenate([cls_pos, pos], axis=1)

        hooks = (register_shallow_hook,) if register_shallow_hook > 0 else ()
        x, hidden = self.blocks(x, pos, deterministic=not train,
                                return_hidden=hooks)
        x = self.norm(x)

        # always touch cls_head so its params exist regardless of which
        # forward variant ran at init time
        cls_feature = self.cls_head(x[:, 0])
        if only_cls_tokens:
            return cls_feature
        if register_shallow_hook > 0:
            return x[:, 1:], x[:, 0], hidden[0][:, 1:], mask
        return x[:, 1:], mask


class MaskTransformer(nn.Module):
    """Point-BERT style student: all tokens kept, masked ones replaced by a mask
    token (reference models/act.py:532-723). Used as the q/k pair in ACT_PointBERT.

    The reference's variable-ratio masking (random.uniform(lo, hi) per batch) is
    jit-unfriendly; we sample a Bernoulli(ratio~U[lo,hi]) mask like its
    _mask_center_rand (models/act.py:641-654), which is dynamic-count but only
    consumed via jnp.where — shapes stay static.
    """
    config: Any
    use_reduce: bool = True

    def setup(self):
        cfg = as_cfg(self.config)
        tc = cfg.transformer_config
        self.mask_ratio = tc.mask_ratio  # [lo, hi]
        self.mask_type = tc.mask_type
        self.embed_dim = tc.embed_dim
        self.depth = tc.depth
        self.num_heads = tc.num_heads
        self.cls_dim = tc.cls_dim
        self.replace_pob = tc.replace_pob
        self.num_tokens = cfg.dvae_config.num_tokens
        self.encoder_dims = tc.encoder_dims
        self.dtype = dtype_from_cfg(tc)
        self.encoder = GroupEncoder(self.encoder_dims, dtype=self.dtype,
                                    name="encoder")
        if self.use_reduce:
            self.reduce_dim = nn.Dense(self.embed_dim, name="reduce_dim")
        else:
            self.reduce_dim = lambda x: x
        self.cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                                    (1, 1, self.embed_dim))
        self.mask_token = self.param("mask_token", trunc_normal_init(),
                                     (1, 1, self.embed_dim))
        self.cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                                  (1, 1, self.embed_dim))
        self.pos_embed = PosEmbedMLP(self.embed_dim, dtype=self.dtype,
                                     name="pos_embed")
        self.blocks = TransformerEncoder(
            embed_dim=self.embed_dim, depth=self.depth, num_heads=self.num_heads,
            drop_path_rate=tc.drop_path_rate, dtype=self.dtype,
            scan=tc.get("scan", None), name="blocks")
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.lm_head = nn.Dense(self.num_tokens, name="lm_head")
        self.cls_head = nn.Sequential([
            nn.Dense(self.cls_dim), nn.gelu, nn.Dense(self.cls_dim)])

    def make_mask(self, center: jax.Array, noaug: bool) -> jax.Array:
        B, G, _ = center.shape
        lo, hi = (self.mask_ratio if isinstance(self.mask_ratio, (list, tuple))
                  else (self.mask_ratio, self.mask_ratio))
        if noaug or hi == 0:
            return jnp.zeros((B, G), bool)
        return bernoulli_ratio_mask(self.make_rng("mask"), B, G, lo, hi)

    def random_replace(self, tokens: jax.Array, mask: jax.Array,
                       noaug: bool):
        """BERT-style token corruption: with prob replace_pob, a non-masked
        token is swapped for a random (detached) token from the flattened batch
        (reference _random_replace, models/act.py:656-684). Returns the
        corrupted tokens and the overall mask (masked OR replaced) that the
        token-classification loss covers."""
        if noaug or self.replace_pob == 0:
            return tokens, mask
        B, G, C = tokens.shape
        k1, k2 = jax.random.split(self.make_rng("mask"))
        replace = (jax.random.uniform(k1, (B, G)) < self.replace_pob) & ~mask
        flat = jax.lax.stop_gradient(tokens).reshape(B * G, C)
        perm = jax.random.permutation(k2, B * G)
        shuffled = flat[perm].reshape(B, G, C)
        w = replace[:, :, None].astype(tokens.dtype)
        return tokens * (1 - w) + shuffled * w, mask | replace

    def __call__(self, neighborhood: jax.Array, center: jax.Array,
                 train: bool = False, noaug: bool = False,
                 only_cls_tokens: bool = False, return_all_tokens: bool = True):
        B, G = center.shape[:2]
        mask = self.make_mask(center, noaug)
        tokens = self.encoder(neighborhood, train=train)
        tokens = self.reduce_dim(tokens)
        tokens, overall_mask = self.random_replace(tokens, mask, noaug)
        # sown for the full-graph torch-equivalence tests (no-op in training)
        self.sow("intermediates", "mask", mask)
        self.sow("intermediates", "overall_mask", overall_mask)

        w = mask[:, :, None].astype(tokens.dtype)
        mask_tok = jnp.broadcast_to(self.mask_token, tokens.shape)
        tokens = tokens * (1 - w) + mask_tok * w

        cls_tok = jnp.broadcast_to(self.cls_token, (B, 1, self.embed_dim))
        cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, self.embed_dim))
        pos = jnp.concatenate([cls_pos, self.pos_embed(center)], axis=1)
        x = jnp.concatenate([cls_tok, tokens], axis=1)

        x, _ = self.blocks(x, pos, deterministic=not train)
        x = self.norm(x)

        # always touch both heads so the q/k param trees match for the EMA
        cls_feature = self.cls_head(x[:, 0])
        logits = self.lm_head(x[:, 1:])  # (B, G, num_tokens)
        if only_cls_tokens:
            return cls_feature
        # all-token logits + overall mask (masked OR replaced positions carry
        # the token-classification loss, reference models/act.py:722); the
        # caller selects positions with jnp.where weights (static shapes)
        return cls_feature, logits, overall_mask


class TokenAllMaskTransformer(MaskTransformer):
    """MaskTransformer variant whose encoder emits embed_dim directly, with no
    reduce_dim bridge (reference models/act.py:312-529; defined but unused by
    the registered pretrain models — kept for inventory parity)."""
    use_reduce: bool = False


# ---------------------------------------------------------------------------
# distillation losses (reference models/act.py:1184-1195 via lightly)
# ---------------------------------------------------------------------------

def negative_cosine_loss(student: jax.Array, teacher: jax.Array) -> jax.Array:
    """mean over all tokens of (1 - cos(student, teacher)) — the vectorized,
    numerically identical form of the reference's per-item loop
    (models/act.py:1244-1254 with lightly NegativeCosineSimilarity)."""
    s = student / (jnp.linalg.norm(student, axis=-1, keepdims=True) + 1e-8)
    t = teacher / (jnp.linalg.norm(teacher, axis=-1, keepdims=True) + 1e-8)
    return jnp.mean(1.0 - jnp.sum(s * t, axis=-1))


def ntxent_loss(student: jax.Array, teacher: jax.Array,
                temperature: float = 0.07) -> jax.Array:
    """NT-Xent between corresponding tokens, per sample, in-sample negatives
    (reference uses lightly NTXentLoss per batch item)."""
    s = student / (jnp.linalg.norm(student, axis=-1, keepdims=True) + 1e-8)
    t = teacher / (jnp.linalg.norm(teacher, axis=-1, keepdims=True) + 1e-8)
    logits = jnp.einsum("bmc,bnc->bmn", s, t) / temperature  # (B, M, M)
    labels = jnp.arange(logits.shape[1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(
        logp, jnp.broadcast_to(labels[None, :, None], logp.shape[:2] + (1,)),
        axis=-1))


def barlow_twins_loss(student: jax.Array, teacher: jax.Array,
                      lambda_param: float = 5e-3) -> jax.Array:
    """Barlow Twins cross-correlation loss per sample, averaged over the batch."""
    def one(s, t):
        m = s.shape[0]
        s = (s - s.mean(0)) / (s.std(0) + 1e-5)
        t = (t - t.mean(0)) / (t.std(0) + 1e-5)
        c = (s.T @ t) / m
        on = jnp.sum((jnp.diag(c) - 1.0) ** 2)
        off = jnp.sum(c ** 2) - jnp.sum(jnp.diag(c) ** 2)
        return on + lambda_param * off
    return jnp.mean(jax.vmap(one)(student, teacher))


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0
                   ) -> jax.Array:
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


# ---------------------------------------------------------------------------
# Stage-II pretrain models
# ---------------------------------------------------------------------------

@MODELS.register_module()
class ACT_PointDistillation(nn.Module):
    """Masked point modeling with latent-feature distillation from the frozen
    prompted dVAE teacher (reference models/act.py:1099-1258)."""
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        tc = cfg.transformer_config
        self.embed_dim = tc.embed_dim
        self.mask_ratio = tc.mask_ratio
        self.num_group = cfg.dvae_config.num_group
        self.group_size = cfg.dvae_config.group_size
        self.loss_type = cfg.loss
        self.cls_loss = bool(tc.get("cls_loss", False))
        self.shallow_hook = int(tc.get("register_shallow_hook", -1))
        self.proj_type = tc.get("proj", "linear")

        self.ACT_encoder = VisableOnlyMaskTransformer(cfg, name="ACT_encoder")
        self.dvae_tokenizer = ACTPromptedDiscreteVAEwithVIT(
            cfg.dvae_config, name="dvae_tokenizer")

        if self.proj_type in ("linear", "conv"):
            self.proj_head = nn.Dense(cfg.dvae_config.tokens_dims,
                                      name="proj_head")
        else:
            self.proj_head = lambda x: x

        if self.mask_ratio > 0:
            self.mask_token = self.param("mask_token", trunc_normal_init(),
                                         (1, 1, self.embed_dim))
            self.decoder_pos_embed = PosEmbedMLP(self.embed_dim,
                                                 name="decoder_pos_embed")
            self.ACT_decoder = TransformerDecoder(
                embed_dim=self.embed_dim, depth=tc.decoder_depth,
                num_heads=tc.decoder_num_heads,
                drop_path_rate=tc.drop_path_rate, dtype=dtype_from_cfg(tc),
                scan=tc.get("scan", None), name="ACT_decoder")
        if self.cls_loss:
            self.cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                                      (1, 1, self.embed_dim))

    def _loss(self, student: jax.Array, teacher: jax.Array) -> jax.Array:
        if self.loss_type == "cosine":
            return negative_cosine_loss(student, teacher)
        if self.loss_type == "l2":
            return jnp.mean((student - teacher) ** 2)
        if self.loss_type == "smoothl1":
            return smooth_l1_loss(student, teacher)
        if self.loss_type == "ntxent":
            return ntxent_loss(student, teacher)
        if self.loss_type == "barlow":
            return barlow_twins_loss(student, teacher)
        raise ValueError(f"unknown loss {self.loss_type}")

    def forward_eval(self, pts: jax.Array) -> jax.Array:
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        return self.ACT_encoder(neighborhood, center, noaug=True,
                                only_cls_tokens=True)

    def __call__(self, pts: jax.Array, train: bool = True,
                 noaug: bool = False) -> jax.Array:
        if noaug:
            return self.forward_eval(pts)
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        G = self.num_group
        num_mask = int(self.mask_ratio * G)
        self.sow("intermediates", "neighborhood", neighborhood)
        self.sow("intermediates", "center", center)

        if self.cls_loss:
            x_vis, x_cls, x_shallow, mask = self.ACT_encoder(
                neighborhood, center, train=train,
                register_shallow_hook=self.shallow_hook)
        else:
            x_vis, mask = self.ACT_encoder(neighborhood, center, train=train)
            x_cls = x_shallow = None
        self.sow("intermediates", "mask", mask)
        B, V, C = x_vis.shape

        # train=train: the reference's frozen tokenizer sits inside a train-mode
        # model — prompt dropout + batch-stat BN stay live under no_grad
        teacher_feat = jax.lax.stop_gradient(
            self.dvae_tokenizer.forward_tokenizer_features(
                neighborhood, center, return_global=True,
                train=train))  # (B, G, C_tok)

        if num_mask == 0:
            # mask_ratio=0: no decoder — distill visible (=all) tokens straight
            # against the full teacher features (reference models/act.py:
            # 1238-1241, mask_token is None branch)
            # (the reference's cls_loss shallow path only exists under the
            # decoder branch — student_feat_global stays None here, :1246)
            return self._loss(self.proj_head(x_vis), teacher_feat)

        vis_idx, mask_idx = split_by_mask(mask, num_mask)
        pos_vis = self.decoder_pos_embed(take_tokens(center, vis_idx))
        pos_mask = self.decoder_pos_embed(take_tokens(center, mask_idx))
        mask_tok = jnp.broadcast_to(self.mask_token, (B, num_mask, C))
        x_full = jnp.concatenate([x_vis, mask_tok], axis=1)
        pos_full = jnp.concatenate([pos_vis, pos_mask], axis=1)

        x_rec = self.ACT_decoder(x_full, pos_full, num_mask,
                                 deterministic=not train)
        student_feat = self.proj_head(x_rec)  # (B, num_mask, C_tok)
        teacher_masked = take_tokens(teacher_feat, mask_idx)

        loss = self._loss(student_feat, teacher_masked)
        if self.cls_loss:
            x_full_shallow = jnp.concatenate(
                [x_cls[:, None, :], x_shallow, mask_tok], axis=1)
            cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, C))
            pos_shallow = jnp.concatenate([cls_pos, pos_full], axis=1)
            x_rec_shallow = self.ACT_decoder(x_full_shallow, pos_shallow,
                                             num_mask, deterministic=not train)
            loss = loss + self._loss(self.proj_head(x_rec_shallow),
                                     teacher_masked)
        return loss


@MODELS.register_module()
class ACT_PointBERT(nn.Module):
    """Point-BERT with the ACT teacher: MoCo q/k transformers + dVAE token
    classification + point mixup/cutmix contrast (reference models/act.py:913-1095).

    Mutable pieces: the MoCo queue + pointer live in the 'buffers' collection;
    the momentum (k) encoder EMA update is applied to the param tree by the train
    step (see engine.train_steps.ema_update).
    """
    config: Any

    def setup(self):
        cfg = as_cfg(self.config)
        self.m = cfg.m
        self.T = cfg.T
        self.K = cfg.K
        tc = cfg.transformer_config
        self.moco_loss_on = tc.moco_loss
        self.dvae_loss_on = tc.dvae_loss
        self.cutmix_loss_on = tc.cutmix_loss
        self.return_all_tokens = tc.return_all_tokens
        self.cls_dim = tc.cls_dim
        self.num_group = cfg.dvae_config.num_group
        self.group_size = cfg.dvae_config.group_size

        self.transformer_q = MaskTransformer(cfg, name="transformer_q")
        self.transformer_k = MaskTransformer(cfg, name="transformer_k")
        self.dvae = ACTPromptedDiscreteVAEwithVIT(cfg.dvae_config, name="dvae")

        self.queue = self.variable(
            "buffers", "queue",
            lambda: _normalize(jax.random.normal(
                jax.random.PRNGKey(0), (self.cls_dim, self.K)), axis=0))
        self.queue_ptr = self.variable(
            "buffers", "queue_ptr", lambda: jnp.zeros((), jnp.int32))

    def forward_eval(self, pts: jax.Array) -> jax.Array:
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        return self.transformer_q(neighborhood, center, noaug=True,
                                  only_cls_tokens=True)

    def _mixup(self, key, neighborhood, center, dvae_label):
        """Point-cloud mixup with a flipped batch (reference models/act.py:1007-1025)."""
        B, G = center.shape[:2]
        k1, k2 = jax.random.split(key)
        ratio = jax.random.uniform(k1, (B,))
        mm = (jax.random.uniform(k2, (B, G)) < ratio[:, None]).astype(center.dtype)
        mix_n = (neighborhood * mm[:, :, None, None]
                 + jnp.flip(neighborhood, 0) * (1 - mm[:, :, None, None]))
        mix_c = center * mm[:, :, None] + jnp.flip(center, 0) * (1 - mm[:, :, None])
        mix_l = (dvae_label * mm + jnp.flip(dvae_label, 0) * (1 - mm)).astype(jnp.int32)
        # sown for the full-graph torch-equivalence tests (no-op in training)
        self.sow("intermediates", "mixup_ratio", ratio)
        self.sow("intermediates", "mixup_mask", mm)
        return ratio, mix_n, mix_c, mix_l

    def _masked_ce(self, logits, labels, mask):
        """CE over masked positions only, mean weighted by the mask
        (static-shape replacement for logits[mask]).

        Written as ``logsumexp(logits) - logits[label]`` rather than
        ``-log_softmax(logits)[label]``: mathematically identical, but the
        log_softmax form materializes the full (B, G, 8192)-vocab log-probs
        tensor only to gather ONE column per position — profiled at 48.8
        ms/step (35.7% of the PointBERT device step, HBM-bound at 51 GB/s,
        2026-08-19). The lse+gather form keeps the forward a reduction + a
        gather; the backward's dense softmax term is unavoidable either way.
        """
        lse = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        w = mask.astype(lse.dtype)
        return jnp.sum((lse - ll) * w) / jnp.maximum(jnp.sum(w), 1.0)

    def __call__(self, pts: jax.Array, train: bool = True, noaug: bool = False):
        if noaug:
            return self.forward_eval(pts)
        neighborhood, center = ops.group_points(pts, self.num_group,
                                                self.group_size)
        self.sow("intermediates", "neighborhood", neighborhood)
        self.sow("intermediates", "center", center)
        dvae_label = jax.lax.stop_gradient(
            self.dvae.forward_tokenizer(neighborhood, center,
                                        train=train))  # (B, G)

        q_cls, logits, mask = self.transformer_q(neighborhood, center, train=train)
        q_cls = _normalize(q_cls, axis=1)

        ratio, mix_n, mix_c, mix_l = self._mixup(
            self.make_rng("mask"), neighborhood, center, dvae_label)
        mix_cls, mix_logits, mix_mask = self.transformer_q(mix_n, mix_c, train=train)
        mix_cls = _normalize(mix_cls, axis=1)

        # key features: momentum encoder, no grad (EMA handled by train step)
        k_cls = jax.lax.stop_gradient(_normalize(
            self.transformer_k(neighborhood, center, train=train,
                               only_cls_tokens=True), axis=1))

        queue = jax.lax.stop_gradient(self.queue.value)  # (cls_dim, K)
        B = q_cls.shape[0]

        if self.moco_loss_on:
            l_pos = jnp.einsum("nc,nc->n", q_cls, k_cls,
                               precision=jax.lax.Precision.HIGHEST)[:, None]
            l_neg = jnp.einsum("nc,ck->nk", q_cls, queue,
                               precision=jax.lax.Precision.HIGHEST)
            ce_logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.T
            moco_loss = _ce(ce_logits, jnp.zeros((B,), jnp.int32))
        else:
            moco_loss = jnp.zeros(())

        if self.dvae_loss_on:
            if self.return_all_tokens:
                dvae_loss = (_ce(logits.reshape(-1, logits.shape[-1]),
                                 dvae_label.reshape(-1))
                             + _ce(mix_logits.reshape(-1, mix_logits.shape[-1]),
                                   mix_l.reshape(-1)))
            else:
                dvae_loss = (self._masked_ce(logits, dvae_label, mask)
                             + self._masked_ce(mix_logits, mix_l, mix_mask))
        else:
            dvae_loss = jnp.zeros(())

        if self.cutmix_loss_on:
            l_pos = jnp.einsum("nc,mc->nm", mix_cls, k_cls,
                               precision=jax.lax.Precision.HIGHEST)
            l_neg = jnp.einsum("nc,ck->nk", mix_cls, queue,
                               precision=jax.lax.Precision.HIGHEST)
            ce_logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.T
            labels = jnp.arange(B, dtype=jnp.int32)
            cutmix_loss = jnp.mean(
                ratio * _ce_per_item(ce_logits, labels)
                + (1 - ratio) * _ce_per_item(ce_logits, jnp.flip(labels, 0)))
        else:
            cutmix_loss = jnp.zeros(())

        # dequeue/enqueue (requires K % B == 0, like the reference
        # models/act.py:989)
        if self.K % B != 0:
            raise ValueError(f"MoCo queue K={self.K} must divide batch {B}")
        if not self.is_initializing():
            ptr = self.queue_ptr.value
            new_queue = jax.lax.dynamic_update_slice(
                self.queue.value, k_cls.T, (jnp.int32(0), ptr))
            self.queue.value = new_queue
            self.queue_ptr.value = (ptr + B) % self.K

        return moco_loss, dvae_loss, cutmix_loss


def _normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


def _ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    # lse - logits[label] == -log_softmax(logits)[label] without
    # materializing the full log-probs tensor (see _masked_ce)
    return jnp.mean(_ce_per_item(logits, labels))


def _ce_per_item(logits: jax.Array, labels: jax.Array) -> jax.Array:
    lse = jax.nn.logsumexp(logits, axis=-1)
    return lse - jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
