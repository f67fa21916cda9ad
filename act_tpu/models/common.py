"""Shared neural building blocks (flax.linen).

Covers the reference's transformer stack (models/act.py:25-145), the mini-PointNet
group encoder (models/dvae.py:185-215), the DGCNN graph feature network
(models/dvae.py:26-117) and the FoldingNet decoder (models/dvae.py:217-275) —
re-designed channels-last so 1x1 convs become Dense layers that XLA maps straight
onto the MXU, with all irregular gathers expressed as take_along_axis.

RNG streams: 'dropout' (dropout + prompt dropout), 'droppath' (stochastic depth),
'gumbel' (dVAE sampling), 'mask' (MAE masking) — all explicit, no global RNG.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from act_tpu.ops import graph_feature_idx, gather_points

Dtype = Any

# torch nn.LayerNorm default eps — flax defaults to 1e-6, which diverges
# visibly wherever token variance is small (e.g. std-0.02 prompt/cls tokens:
# sqrt((4e-4+1e-5)/(4e-4+1e-6)) ≈ 1.01 → percent-level drift). All reference
# modules use the torch default; timm ViT teachers use 1e-6 (teacher.py).
LN_EPS = 1e-5


def dtype_from_cfg(cfg) -> Any:
    """Map a config 'dtype' string to a jnp compute dtype (None = float32)."""
    d = cfg.get("dtype", None) if hasattr(cfg, "get") else None
    if d in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if d in ("f32", "float32", None):
        return None
    raise ValueError(f"unknown dtype {d}")


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2 * std, upper=2 * std)


def scan_default() -> bool:
    """Process default for scanning transformer stacks (ACT_TPU_SCAN env):
    off = the unrolled per-block layout (runtime-optimal, production);
    on = one nn.scan-compiled block body (compile-optimal, dev/CI). See the
    measured tradeoff at TransformerEncoder.scan."""
    import os
    return os.environ.get("ACT_TPU_SCAN", "").lower() in ("1", "true", "on")


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample.

    ``rate_override`` (a traced scalar) replaces the static attribute rate —
    used by the scanned transformer stacks, whose per-layer rates enter the
    one compiled block body as a scan input instead of forcing a compile per
    layer."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool,
                 rate_override=None) -> jax.Array:
        if deterministic or (rate_override is None and self.rate == 0.0):
            return x
        keep = (1.0 - self.rate if rate_override is None
                else 1.0 - rate_override)
        rng = self.make_rng("droppath")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        # scale in x's dtype: keep is f32 when traced (rate_override) or a
        # weak python float otherwise — an f32-strong divide would promote a
        # bf16 residual stream to f32 for the rest of the stack (and break
        # the scanned stack's carry dtype invariance in train mode)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                         jnp.zeros([], x.dtype))


class Mlp(nn.Module):
    """Transformer MLP (reference models/act.py:25-41).

    GELU flavor follows the compute dtype: exact erf in f32 (bit-parity with
    torch nn.GELU for converted checkpoints / equivalence tests), tanh
    approximation under bf16 — the erf epilogue de-rates the fc1 matmul to
    ~42% MXU peak (profiled ~0.5ms/layer at teacher shapes) while the
    tanh-gelu error (~1e-4 rel) is far below bf16 rounding itself (~8e-3).
    """
    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out_dim = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.dtype == jnp.bfloat16)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class _QKVProj(nn.Module):
    """Fused qkv projection emitting (B, H, N, hd) tensors straight from the
    MXU. Param layout/name identical to Dense(3C) ('qkv/kernel' (C, 3C)); the
    head split happens by reshaping the WEIGHT slices (loop-invariant — XLA
    hoists the relayout out of the step) instead of the activations, whose
    reshape to a 64-wide minor dim cost a full layout copy per block
    (~0.3ms/layer at teacher shapes, profiled)."""
    num_heads: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, q_keep_from: int = 0):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        w = self.param("kernel", nn.initializers.lecun_normal(), (C, 3 * C))
        b = (self.param("bias", nn.initializers.zeros, (3 * C,))
             if self.use_bias else None)
        dt = self.dtype or w.dtype
        xq = x[:, q_keep_from:] if q_keep_from else x

        def head_proj(inp, col0):
            wk = w[:, col0:col0 + C].reshape(C, H, hd).astype(dt)
            y = jnp.einsum("bnc,chd->bhnd", inp.astype(dt), wk)
            if b is not None:
                y = y + b[col0:col0 + C].reshape(1, H, 1, hd).astype(dt)
            return y

        # three separate contractions measured faster than a fused kv einsum
        # ('bnc,cthd->tbhnd' costs an output relayout: 4017 vs 4140
        # clouds/sec on the Stage-II bench)
        return head_proj(xq, 0), head_proj(x, C), head_proj(x, 2 * C)


class _HeadMergeProj(nn.Module):
    """Attention output projection contracting (head, head_dim) directly from
    (B, H, N, hd) context. Param layout/name identical to Dense(C)
    ('proj/kernel' (C, C) with rows ordered h*hd+d — exactly the layout the
    (B, N, C) head merge would feed a plain Dense)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, ctx: jax.Array) -> jax.Array:
        H, hd = ctx.shape[1], ctx.shape[3]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (H * hd, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or w.dtype
        return (jnp.einsum("bhnd,hdf->bnf", ctx.astype(dt),
                           w.reshape(H, hd, self.features).astype(dt))
                + b.astype(dt))


class Attention(nn.Module):
    """Multi-head self-attention (reference models/act.py:44-69).

    One fused qkv projection; softmax in f32 for TPU numerical stability.
    All five matmuls (q/k/v/scores/context/output) run on MXU-native layouts
    with head splits folded into the weight shapes — no activation relayouts.
    """
    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 q_keep_from: int = 0) -> jax.Array:
        """``q_keep_from``: restrict queries (and therefore outputs) to rows
        [q_keep_from:]; keys/values still cover all rows. Used by the prompted
        teacher whose leading prompt-row outputs are discarded every layer."""
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = self.qk_scale or head_dim ** -0.5
        q, k, v = _QKVProj(H, self.qkv_bias, dtype=self.dtype,
                           name="qkv")(x, q_keep_from)  # (B, H, *, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        # output projection contracts (h, d) directly — again the head merge
        # lives in the weight reshape, not an activation transpose
        out = _HeadMergeProj(C, dtype=self.dtype, name="proj")(ctx)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-LN transformer block with stochastic depth (reference models/act.py:72-90)."""
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None
    ln_eps: float = LN_EPS

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 q_keep_from: int = 0, drop_path_rate=None) -> jax.Array:
        """``q_keep_from > 0``: compute outputs only for rows [q_keep_from:]
        (attention keys/values still see all rows) — exact when the leading
        rows' outputs are discarded by the caller (deep-prompt teacher).
        ``drop_path_rate``: traced per-layer stochastic-depth rate from a
        scanned stack (overrides the static attribute)."""
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        h = Attention(self.num_heads, self.qkv_bias, self.qk_scale,
                      self.attn_drop, self.drop, dtype=self.dtype,
                      name="attn")(h, deterministic, q_keep_from=q_keep_from)
        dp = DropPath(self.drop_path)
        x = x[:, q_keep_from:] + dp(h, deterministic, drop_path_rate)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        h = Mlp(int(dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
                name="mlp")(h, deterministic)
        x = x + dp(h, deterministic, drop_path_rate)
        return x


class TransformerEncoder(nn.Module):
    """Stack of Blocks; pos embedding is added at EVERY block input
    (x = block(x + pos)), the reference's Point-BERT convention
    (models/act.py:109-112).

    ``scan=True`` (default) lays the depth out as ONE ``nn.scan``-compiled
    block body with stacked (depth, ...) params under scope ``blocks`` —
    XLA optimizes a 12-deep stack once instead of twelve times, which is the
    dominant share of the Stage-II cold compile (measured: the unrolled
    student fwd+bwd alone is ~25% of the full-program compile). Per-layer
    drop-path rates ride in as a scan input; per-layer RNG streams come from
    ``split_rngs``. ``scan=False`` restores the unrolled per-block layout
    (``blocks_0..``; legacy checkpoints are adapted on load, see
    engine/checkpoint.py ``adapt_block_layout``)."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Any = None
    remat: bool = False
    # None -> ACT_TPU_SCAN env (default off). Measured tradeoff on the
    # Stage-II program (v5e, B=128): scan compiles 131.4s -> 24.5s (5.4x)
    # but runs 4133 -> 3600 clouds/s (-13%; the stacked dynamic-sliced
    # weights lose cross-layer layout/fusion — still -5% at unroll=12).
    # Production training compiles once and runs for days, so the unrolled
    # layout is the default; dev/CI flows opt in (ACT_TPU_SCAN=1, the
    # multichip dryrun, `scan: true` in a model config). Checkpoints from
    # either layout load into the other (engine/checkpoint.adapt_block_layout).
    scan: Optional[bool] = None
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array, deterministic: bool = True,
                 return_hidden: Sequence[int] = ()) -> Tuple[jax.Array, list]:
        block_cls = nn.remat(Block, static_argnums=(2, 3)) if self.remat \
            else Block
        use_scan = self.scan if self.scan is not None else scan_default()
        if use_scan:
            dpr = jnp.asarray(np.linspace(0, self.drop_path_rate, self.depth),
                              jnp.float32)
            layer_idx = jnp.arange(self.depth, dtype=jnp.int32)
            hooks = tuple(return_hidden)
            blk = block_cls(self.num_heads, self.mlp_ratio, self.qkv_bias,
                            drop=self.drop, attn_drop=self.attn_drop,
                            dtype=self.dtype, name="blocks")

            def body(block, carry, xs):
                rate, li = xs
                x, hid = carry
                y = block(x + pos, deterministic, 0, rate)
                # hook outputs ride in the CARRY, selected at their layer —
                # emitting per-layer ys would materialize a (depth, B, N, C)
                # stack (and its cotangent) for one needed slice
                hid = tuple(jnp.where(li == h, y, hh)
                            for h, hh in zip(hooks, hid))
                return (y, hid), ()

            scan_fn = nn.scan(body, variable_axes={"params": 0},
                              split_rngs={"params": True, "dropout": True,
                                          "droppath": True},
                              in_axes=0, out_axes=0, length=self.depth,
                              unroll=self.scan_unroll)
            init_hid = tuple(jnp.zeros_like(x) for _ in hooks)
            (x, hid), _ = scan_fn(blk, (x, init_hid), (dpr, layer_idx))
            return x, list(hid)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        hidden = []
        for i in range(self.depth):
            # full arg list: nn.remat's static_argnums counts self as arg 0
            # (flax subtracts 1 internally), so (2, 3) marks deterministic/
            # q_keep_from static — drop_path_rate stays traceable (the
            # scanned path feeds a per-layer traced rate). The rematted
            # block must still be CALLED with all four args.
            x = block_cls(self.num_heads, self.mlp_ratio, self.qkv_bias,
                          drop=self.drop, attn_drop=self.attn_drop,
                          drop_path=dpr[i], dtype=self.dtype,
                          name=f"blocks_{i}")(x + pos, deterministic, 0, None)
            if i in return_hidden:
                hidden.append(x)
        return x, hidden


class TransformerDecoder(nn.Module):
    """Decoder stack + final norm, returning only the trailing ``return_token_num``
    tokens (the mask-token predictions) — reference models/act.py:115-145."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.1
    mlp_ratio: float = 4.0
    dtype: Any = None
    scan: Optional[bool] = None  # None -> ACT_TPU_SCAN (TransformerEncoder)

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array, return_token_num: int,
                 deterministic: bool = True) -> jax.Array:
        use_scan = self.scan if self.scan is not None else scan_default()
        if use_scan:
            dpr = jnp.asarray(np.linspace(0, self.drop_path_rate, self.depth),
                              jnp.float32)
            blk = Block(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                        name="blocks")

            def body(block, carry, rate):
                y = block(carry + pos, deterministic, 0, rate)
                return y, ()

            scan_fn = nn.scan(body, variable_axes={"params": 0},
                              split_rngs={"params": True, "dropout": True,
                                          "droppath": True},
                              in_axes=0, out_axes=0, length=self.depth)
            x, _ = scan_fn(blk, x, dpr)
        else:
            dpr = [float(r) for r in
                   np.linspace(0, self.drop_path_rate, self.depth)]
            for i in range(self.depth):
                x = Block(self.num_heads, self.mlp_ratio, drop_path=dpr[i],
                          dtype=self.dtype,
                          name=f"blocks_{i}")(x + pos, deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x[:, -return_token_num:])
        return x


class PosEmbedMLP(nn.Module):
    """3 -> 128 -> GELU -> dim positional embedding of group centers
    (the reference's pos_embed Sequential, models/act.py:173-177)."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, centers: jax.Array) -> jax.Array:
        h = nn.Dense(128, dtype=self.dtype, name="fc1")(centers)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class _ConcatDense(nn.Module):
    """Dense over concat([g_broadcast, x], -1) (or [x, g_broadcast] with
    ``g_last``) computed as two matmuls on the row-split kernel — numerically
    identical, no concat materialization, and the per-group/global term costs
    1/M of the naive matmul. Kernel shape/name match a plain Dense over the
    concatenated input."""
    features: int
    use_bias: bool = True
    dtype: Any = None
    g_last: bool = False  # kernel rows: [x | g] instead of [g | x]

    @nn.compact
    def __call__(self, g: jax.Array, x: jax.Array) -> jax.Array:
        cg, cx = g.shape[-1], x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (cg + cx, self.features))
        dt = self.dtype or w.dtype
        wx, wg = ((w[:cx], w[cx:]) if self.g_last else (w[cg:], w[:cg]))
        y = jnp.einsum("rmc,cf->rmf", x.astype(dt), wx.astype(dt))
        yg = jnp.einsum("rc,cf->rf", g.astype(dt), wg.astype(dt))
        y = y + yg[:, None, :]
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(dt)
        return y


class GroupEncoder(nn.Module):
    """Mini-PointNet over each local group (reference Encoder, models/dvae.py:185-215).

    (B, G, M, 3) -> (B, G, C): pointwise MLP -> max -> concat global -> MLP -> max.
    BatchNorm statistics are taken over the B*G*M 'batch' exactly like the
    reference's BatchNorm1d over the flattened (B*G, C, M) layout; pass
    ``bn_axis_name`` to cross-replica-sync the stats (SyncBN equivalent).
    """
    encoder_channel: int
    bn_momentum: float = 0.9
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, point_groups: jax.Array, train: bool = False) -> jax.Array:
        B, G, M, _ = point_groups.shape
        x = point_groups.reshape(B * G, M, 3)
        # dtype=self.dtype: emit normalized activations in the compute dtype.
        # flax computes the mean/var statistics in f32 regardless; without
        # this the BN *outputs* materialize in f32 and the (B*G*M, 256/512)
        # activation traffic through bn->relu->conv fwd+bwd doubles
        # (profiled ~1ms/step at default shapes).
        bn = dict(use_running_average=not train, momentum=self.bn_momentum,
                  axis_name=self.bn_axis_name if train else None,
                  dtype=self.dtype)
        # conv1/conv3 carry no bias: each is immediately followed by a
        # BatchNorm whose mean subtraction absorbs any constant bias — train
        # mode is bit-identical, and for converted torch checkpoints the
        # converter folds the torch bias into bn running_mean (rm' = rm - b,
        # exact in eval too). Dropping them removes a ~1.5ms/step bias-grad
        # reduction over the (BG*M, 512) activations.
        x = nn.Dense(128, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(name="bn1", **bn)(x)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=self.dtype, name="conv2")(x)
        g = jnp.max(x, axis=1)  # (BG, 256)
        # conv3 over concat([global_bcast, x]) without materializing the
        # (BG, M, 512) concat (a ~134MB round trip per pass at default
        # shapes): _ConcatDense splits the kernel rows — first 256 input
        # channels act on the broadcast global feature, last 256 on x — and
        # broadcast-adds the global contribution. Param layout unchanged.
        x = _ConcatDense(512, use_bias=False, dtype=self.dtype,
                         name="conv3")(g, x)
        x = nn.BatchNorm(name="bn2", **bn)(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, dtype=self.dtype, name="conv4")(x)
        x = jnp.max(x, axis=1)  # (BG, C)
        return x.reshape(B, G, self.encoder_channel)


class _GNConvLReLU(nn.Module):
    """1x1 conv + GroupNorm(4) + LeakyReLU(0.2), channels-last."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="conv")(x)
        # epsilon: torch nn.GroupNorm default (flax defaults to 1e-6).
        # dtype: emit normalized activations in the compute dtype — flax
        # computes the mean/var statistics in f32 regardless, but without
        # this the GN *outputs* materialize in f32 and the (B*G, 8192)
        # gn->lrelu traffic of dgcnn_1's logits layer doubles (profiled
        # ~1.2ms/step HBM-bound at Stage-I shapes).
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype,
                         name="gn")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class DGCNN(nn.Module):
    """Dynamic graph CNN over group centers (reference models/dvae.py:26-117).

    Four rounds of k=4 graph features in *coordinate* space (the kNN graph is the
    same every round since it is built from the fixed center coordinates — computed
    once and reused, unlike the reference which recomputes the identical kNN 4x),
    each followed by conv/GroupNorm/LeakyReLU and max over neighbors; the four
    scales concatenate (2304 ch) into the output projection.
    """
    output_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, f: jax.Array, coor: jax.Array) -> jax.Array:
        # f: (B, G, C) features; coor: (B, G, 3) centers
        idx = graph_feature_idx(coor, coor, k=4)  # (B, G, 4) — static graph
        B, G, k = idx.shape
        # feature gather as a one-hot matmul: G is tiny (64-128), so the
        # (B, G*k, G) one-hot is a few MB and the select runs on the MXU —
        # XLA's dynamic gather here cost ~1.3ms/step (profiled); it's also
        # trivially differentiable (transpose is the same matmul). Built once,
        # reused by all four rounds (the kNN graph is static).
        onehot = (idx.reshape(B, G * k, 1)
                  == jnp.arange(G, dtype=idx.dtype)[None, None, :])

        def graph_feature(feat):
            oh = onehot.astype(feat.dtype)
            # Precision: with bf16 features the one-hot select is EXACT at
            # DEFAULT (0/1 weights and bf16 values widen losslessly into the
            # f32 accumulator) and runs 6x fewer MXU passes than HIGHEST
            # (profiled ~1.2ms/step fwd across both DGCNNs at Stage-I
            # shapes). f32 features keep HIGHEST: DEFAULT would round the
            # gathered values to bf16 (the gather-exactness rule, CLAUDE.md).
            prec = (jax.lax.Precision.DEFAULT
                    if feat.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            nbr = jnp.einsum("bsg,bgc->bsc", oh, feat,
                             precision=prec).reshape(B, G, k, -1)
            self_f = jnp.broadcast_to(feat[:, :, None, :], nbr.shape)
            return jnp.concatenate([nbr - self_f, self_f], axis=-1)  # (B, G, 4, 2C)

        f = nn.Dense(128, dtype=self.dtype, name="input_trans")(f)
        feats = []
        for i, ch in enumerate([256, 512, 512, 1024]):
            g = graph_feature(f)
            g = _GNConvLReLU(ch, dtype=self.dtype, name=f"layer{i + 1}")(g)
            f = jnp.max(g, axis=2)  # (B, G, ch)
            feats.append(f)
        f = jnp.concatenate(feats, axis=-1)  # (B, G, 2304)
        return _GNConvLReLU(self.output_channel, dtype=self.dtype, name="layer5")(f)


class FoldingDecoder(nn.Module):
    """FoldingNet group decoder (reference Decoder, models/dvae.py:217-275).

    (B, G, C) -> coarse (B, G, M/4, 3) + fine (B, G, M, 3): an MLP emits the coarse
    points; a 2x2 folding seed grid, the global feature and the coarse points feed a
    pointwise conv stack whose output offsets the repeated coarse centers.
    """
    num_fine: int
    grid_size: int = 2
    bn_momentum: float = 0.9
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, feature_global: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        assert self.num_fine % (self.grid_size ** 2) == 0
        num_coarse = self.num_fine // (self.grid_size ** 2)
        B, G, C = feature_global.shape
        fg = feature_global.reshape(B * G, C)

        h = nn.Dense(1024, dtype=self.dtype, name="mlp1")(fg)
        h = nn.relu(h)
        h = nn.Dense(1024, dtype=self.dtype, name="mlp2")(h)
        h = nn.relu(h)
        coarse = nn.Dense(3 * num_coarse, name="mlp3")(h).reshape(B * G, num_coarse, 3)

        s = self.grid_size ** 2
        a = jnp.linspace(-0.05, 0.05, self.grid_size)
        seed = jnp.stack(jnp.meshgrid(a, a, indexing="xy"), axis=-1).reshape(s, 2)
        seed = jnp.broadcast_to(seed[None, None], (B * G, num_coarse, s, 2))
        seed = seed.reshape(B * G, self.num_fine, 2)

        point_feat = jnp.repeat(coarse, s, axis=1)  # (BG, num_fine, 3)

        # final1/final2 carry no bias: the following BatchNorm's mean
        # subtraction absorbs it (train mode bit-identical; the converter
        # folds torch biases into running_mean — exact in eval too). Their
        # bias grads were a ~1.9ms/step reduction over the (B*G*M, 512)
        # activations in Stage I. BN dtype: see GroupEncoder.
        bn = dict(use_running_average=not train, momentum=self.bn_momentum,
                  axis_name=self.bn_axis_name if train else None,
                  dtype=self.dtype)
        # final1 over concat([fg_broadcast, seed, point_feat]) WITHOUT
        # materializing the (BG, num_fine, C) global-feature broadcast
        # (a ~100MB round trip per pass at Stage-I shapes, and num_fine x
        # the matmul FLOPs on rows that are identical within a group):
        # _ConcatDense applies kernel rows [:C] to fg once per group and
        # broadcast-adds, rows [C:] to the per-point seed||coarse features.
        # Param layout/name unchanged (profiled: final1 fwd+bwd 3.6ms ->
        # the per-group path is ~num_fine/1 smaller for the fg term).
        h = _ConcatDense(512, use_bias=False, dtype=self.dtype,
                         name="final1")(
            fg, jnp.concatenate([seed, point_feat], axis=-1))
        h = nn.BatchNorm(name="fbn1", **bn)(h)
        h = nn.relu(h)
        h = nn.Dense(512, use_bias=False, dtype=self.dtype, name="final2")(h)
        h = nn.BatchNorm(name="fbn2", **bn)(h)
        h = nn.relu(h)
        offset = nn.Dense(3, name="final3")(h)
        fine = offset + point_feat  # (BG, num_fine, 3)

        return (coarse.reshape(B, G, num_coarse, 3),
                fine.reshape(B, G, self.num_fine, 3))


def fast_uniform(key: jax.Array, shape, minval=1e-10, maxval=1.0) -> jax.Array:
    """Uniform draws via the hardware-backed ``rbg`` PRNG (RngBitGenerator).

    jax's default threefry generator computes a counter hash per value on the
    VPU — for the Stage-II gumbel tensor (B, G, 8192) that is ~67M hashes,
    ~1.6ms/step on v5e. ``rbg`` maps to the TPU's native RNG instruction and
    shards cleanly under GSPMD. The threefry key is folded into the 4-word
    rbg key, so draws stay a deterministic function of the session seed
    (distribution-identical, stream-different vs threefry).

    Measured dead end (don't retry): building each value from 16 of the
    32 generated bits — rng emits half the words, bitcast to u16 — to halve
    the bits tensor's HBM round trip (~0.4ms/step at Stage-II shapes). The
    1-D word tensor's tiling doesn't bitcast to the consumer's (8,128) tiles,
    so XLA inserts a real relayout and the fused rng+log+argmax splits:
    3810 vs 4133 clouds/sec on the Stage-II bench (-8%)."""
    data = jax.random.key_data(jax.random.split(key, 2)).reshape(4)
    rbg = jax.random.wrap_key_data(data, impl="rbg")
    return jax.random.uniform(rbg, shape, minval=minval, maxval=maxval)


class FastDropout(nn.Module):
    """Dropout with the mask drawn from the hardware ``rbg`` PRNG.

    Semantically identical to ``nn.Dropout`` (iid Bernoulli keep at 1-rate,
    1/(1-rate) scaling, 'dropout' rng collection) but the mask bits come from
    ``fast_uniform`` — ``nn.Dropout``'s threefry draw costs ~0.12ms per
    (128, 64, 768) mask on v5e, and the prompted teacher draws one per layer
    (12x/step, profiled as 1.6ms fused into the pos-add)."""
    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        u = fast_uniform(self.make_rng("dropout"), x.shape,
                         minval=0.0, maxval=1.0)
        keep = u >= self.rate
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))


def gumbel_softmax(key: jax.Array, logits: jax.Array, tau: float = 1.0,
                   hard: bool = False, axis: int = -1) -> jax.Array:
    """Gumbel-softmax with optional straight-through hard sampling — the JAX
    equivalent of torch F.gumbel_softmax (used models/dvae.py:346,600)."""
    u = jax.random.uniform(key, logits.shape, minval=1e-10, maxval=1.0)
    return gumbel_softmax_from_u(u, logits, tau=tau, hard=hard, axis=axis)


def gumbel_softmax_from_u(u: jax.Array, logits: jax.Array, tau: float = 1.0,
                          hard: bool = False, axis: int = -1) -> jax.Array:
    """Gumbel-softmax from precomputed uniform draws (lets callers sow the
    noise so equivalence tests can replay the same draw in torch)."""
    g = -jnp.log(-jnp.log(u))
    y = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        # straight-through: forward value is one-hot, gradient flows through soft y
        y_hard = jax.nn.one_hot(jnp.argmax(y, axis=axis), logits.shape[axis],
                                axis=axis, dtype=y.dtype)
        y = y + jax.lax.stop_gradient(y_hard - y)
    return y
