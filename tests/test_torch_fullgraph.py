"""FULL-GRAPH torch equivalence of the composed Stage-II pretrain model.

The highest-leverage parity test: the complete reference graphs are rebuilt in
torch in-test with the reference's module/key layout —

- ACT_PointDistillation: masked student + frozen prompted-ViT dVAE teacher +
  transformer decoder + masked cosine loss (reference models/act.py:1099-1258)
- the prompted dVAE reconstruction forward (reference models/dvae.py:594-615)
- PointTransformer classification logits (reference models/act.py:882-910)

— their state dicts are converted with the production rules
(act_distillation_rules / dvae_rules / point_transformer_rules), and the end
-to-end outputs are asserted equal under pinned masks/gumbel draws (sown by
the flax models, replayed on the torch side). Any wiring discrepancy anywhere
in the composed graphs (mask ordering, per-block pos add, teacher splice
point, decoder token layout, loss reduction) fails these tests.
"""
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from act_tpu import ops
from act_tpu.engine import torch_convert as tc
from act_tpu.engine.checkpoint import flatten_keys
from act_tpu.models import ACT_PointDistillation, PointTransformer
from act_tpu.models.dvae import ACTPromptedDiscreteVAEwithVIT
from act_tpu.utils.config import ConfigDict

from tests.test_torch_convert import TorchMiniPointNet, to_np
from tests.test_torch_convert_deep import TorchDGCNN, TorchFolding

# tiny-but-structured dims: reduce_dim exercised (enc != embed), deep prompts
B, N, G, M = 2, 128, 16, 8
EMBED, ENC_DIMS, HEADS, DEPTH = 32, 24, 4, 2
NUM_TOKENS, TOKENS_DIMS, DECODER_DIMS = 32, 24, 24
TD, TDEPTH, THEADS, P = 48, 2, 4, 4
MASK_RATIO, DEC_DEPTH = 0.5, 1
CLS_DIM = 8


# ---------------------------------------------------------------------------
# torch reference modules (reference key layout, eval-mode semantics)
# ---------------------------------------------------------------------------

class TorchAttn(tnn.Module):
    def __init__(self, dim, heads, qkv_bias=False):
        super().__init__()
        self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = tnn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        Bb, Nn, C = x.shape
        qkv = self.qkv(x).reshape(Bb, Nn, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(Bb, Nn, C)
        return self.proj(x)


class TorchMlpBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchViTBlock(tnn.Module):
    """Pre-LN block (reference models/act.py:72-90; eps=torch default 1e-5;
    timm teachers use eps=1e-6)."""

    def __init__(self, dim, heads, qkv_bias=False, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.attn = TorchAttn(dim, heads, qkv_bias)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.mlp = TorchMlpBlock(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchEncoderStack(tnn.Module):
    """TransformerEncoder: pos added at EVERY block input
    (reference models/act.py:93-112)."""

    def __init__(self, dim, depth, heads):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)])

    def forward(self, x, pos):
        for blk in self.blocks:
            x = blk(x + pos)
        return x


class TorchStudent(tnn.Module):
    """VisableOnlyMaskTransformer minus the RNG: takes the mask as input
    (reference models/act.py:148-309)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchMiniPointNet(ENC_DIMS)
        self.reduce_dim = tnn.Linear(ENC_DIMS, EMBED)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.02)
        self.cls_pos = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.02)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, EMBED))
        self.blocks = TorchEncoderStack(EMBED, DEPTH, HEADS)
        self.norm = tnn.LayerNorm(EMBED)
        self.cls_head = tnn.Sequential(
            tnn.Linear(EMBED, CLS_DIM), tnn.GELU(), tnn.Linear(CLS_DIM, CLS_DIM))

    def forward(self, nbr, center, mask):
        tokens = self.reduce_dim(self.encoder(nbr))  # B G C
        Bb, Gg, C = tokens.shape
        x_vis = tokens[~mask].reshape(Bb, -1, C)
        vis_center = center[~mask].reshape(Bb, -1, 3)
        pos = self.pos_embed(vis_center)
        cls_tok = self.cls_token.expand(Bb, -1, -1)
        cls_pos = self.cls_pos.expand(Bb, -1, -1)
        x = torch.cat([cls_tok, x_vis], dim=1)
        pos = torch.cat([cls_pos, pos], dim=1)
        x = self.norm(self.blocks(x, pos))
        return x[:, 1:]


class TorchDVAE(tnn.Module):
    """ACTPromptedDiscreteVAEwithVIT: Group encoder -> dgcnn_1 -> gumbel ->
    codebook -> frozen prompted ViT (deep prompts) -> dgcnn_2 -> FoldingNet
    (reference models/dvae.py:360-615). Takes gumbel uniforms as input."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchMiniPointNet(ENC_DIMS)
        self.dgcnn_1 = TorchDGCNN(ENC_DIMS, NUM_TOKENS)
        self.codebook = tnn.Parameter(torch.randn(NUM_TOKENS, TOKENS_DIMS))
        self.dgcnn_2 = TorchDGCNN(TOKENS_DIMS, DECODER_DIMS)
        self.decoder = TorchFolding(DECODER_DIMS, M)
        # teacher (timm layout: visual_embed = Sequential(blocks, norm))
        self.proj_pre = tnn.Linear(TOKENS_DIMS, TD)
        self.visual_pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, TD))
        self.proj_post = tnn.Linear(TD, TOKENS_DIMS)
        self.visual_prompt_token = tnn.Parameter(torch.randn(1, P, TD) * 0.02)
        self.visual_prompt_pos = tnn.Parameter(torch.randn(1, P, TD) * 0.02)
        self.deep_prompt_tokens = tnn.Parameter(
            torch.randn(TDEPTH - 1, P, TD) * 0.02)
        self.deep_prompt_pos = tnn.Parameter(
            torch.randn(TDEPTH - 1, P, TD) * 0.02)
        self.visual_embed = tnn.Sequential(
            tnn.Sequential(*[TorchViTBlock(TD, THEADS, qkv_bias=True, eps=1e-6)
                             for _ in range(TDEPTH)]),
            tnn.LayerNorm(TD, eps=1e-6))

    def visual_embedding(self, inp, center):
        """Deep-prompt teacher forward (reference dvae.py:536-576)."""
        Bb = inp.shape[0]
        pos = self.visual_pos_embed(center)
        feature = self.proj_pre(inp)
        feature = torch.cat(
            [self.visual_prompt_token.expand(Bb, -1, -1), feature], dim=1)
        pos = torch.cat([self.visual_prompt_pos.expand(Bb, -1, -1), pos], dim=1)
        h = feature
        for i in range(TDEPTH):
            if i >= 1:
                h = torch.cat([self.deep_prompt_tokens[i - 1].expand(Bb, -1, -1),
                               h[:, P:]], dim=1)
                pos = torch.cat([self.deep_prompt_pos[i - 1].expand(Bb, -1, -1),
                                 pos[:, P:]], dim=1)
            h = self.visual_embed[0][i](h + pos)
        return self.proj_post(self.visual_embed[1](h)[:, P:])

    def encode_logits(self, nbr, center):
        return self.dgcnn_1(self.encoder(nbr), center)

    def forward_tokenizer_features(self, nbr, center, u):
        logits = self.encode_logits(nbr, center)
        g = -torch.log(-torch.log(u))
        ids = torch.argmax(logits + g, dim=-1)
        sampled = self.codebook[ids]
        feature = self.visual_embedding(sampled, center)
        return self.dgcnn_2(feature, center)

    def forward(self, nbr, center, u, temperature=1.0):
        """Soft-gumbel recon forward (reference dvae.py:594-615)."""
        logits = self.encode_logits(nbr, center)
        g = -torch.log(-torch.log(u))
        soft_one_hot = F.softmax((logits + g) / temperature, dim=-1)
        sampled = torch.einsum("bgn,nc->bgc", soft_one_hot, self.codebook)
        sampled = self.visual_embedding(sampled, center)
        feature = self.dgcnn_2(sampled, center)
        coarse, fine = self.decoder(feature)
        whole_fine = (fine + center.unsqueeze(2)).reshape(nbr.shape[0], -1, 3)
        whole_coarse = (coarse + center.unsqueeze(2)).reshape(nbr.shape[0], -1, 3)
        return whole_coarse, whole_fine, coarse, fine, nbr, logits


class TorchDecoderStack(tnn.Module):
    """TransformerDecoder (reference models/act.py:115-145)."""

    def __init__(self, dim, depth, heads):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x, pos, return_token_num):
        for blk in self.blocks:
            x = blk(x + pos)
        return self.norm(x[:, -return_token_num:])


class TorchDistill(tnn.Module):
    """ACT_PointDistillation composed graph (reference models/act.py:1099-1258)."""

    def __init__(self):
        super().__init__()
        self.ACT_encoder = TorchStudent()
        self.dvae_tokenizer = TorchDVAE()
        self.mask_token = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.02)
        self.decoder_pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, EMBED))
        self.ACT_decoder = TorchDecoderStack(EMBED, DEC_DEPTH, HEADS)
        self.proj_head = tnn.Linear(EMBED, TOKENS_DIMS)

    def forward(self, nbr, center, mask, u):
        x_vis = self.ACT_encoder(nbr, center, mask)
        Bb, _, C = x_vis.shape
        with torch.no_grad():
            teacher_feat = self.dvae_tokenizer.forward_tokenizer_features(
                nbr, center, u)
        pos_vis = self.decoder_pos_embed(center[~mask]).reshape(Bb, -1, C)
        pos_mask = self.decoder_pos_embed(center[mask]).reshape(Bb, -1, C)
        num_mask = pos_mask.shape[1]
        mask_tok = self.mask_token.expand(Bb, num_mask, -1)
        x_full = torch.cat([x_vis, mask_tok], dim=1)
        pos_full = torch.cat([pos_vis, pos_mask], dim=1)
        x_rec = self.ACT_decoder(x_full, pos_full, num_mask)
        student_feat = self.proj_head(x_rec)
        teacher_masked = teacher_feat[mask].reshape(Bb, -1,
                                                    student_feat.shape[-1])
        # cosine loss, reference per-item loop (models/act.py:1244-1254)
        loss = torch.zeros(())
        for b in range(Bb):
            neg = -F.cosine_similarity(student_feat[b], teacher_masked[b],
                                       dim=-1).mean()
            loss = loss + (1 + neg)
        return loss / Bb


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def tiny_distill_cfg():
    return ConfigDict(dict(
        NAME="ACT_PointDistillation", loss="cosine",
        transformer_config=dict(
            mask_ratio=MASK_RATIO, mask_type="rand", proj="linear",
            embed_dim=EMBED, encoder_dims=ENC_DIMS, depth=DEPTH,
            drop_path_rate=0.0, cls_dim=CLS_DIM, replace_pob=0.0,
            num_heads=HEADS, decoder_depth=DEC_DEPTH, decoder_num_heads=HEADS,
            return_all_tokens=False, cls_loss=False),
        dvae_config=dict(
            NAME="ACTPromptedDiscreteVAEwithVIT", group_size=M, num_group=G,
            encoder_dims=ENC_DIMS, num_tokens=NUM_TOKENS,
            tokens_dims=TOKENS_DIMS, decoder_dims=DECODER_DIMS,
            visual_embed_type="vit_base", visual_embed_dim=TD,
            visual_embed_depth=TDEPTH, visual_embed_heads=THEADS,
            visual_embed_pos="after_dgcnn1", freeze_visual_embed=True,
            num_prompt_token=P, use_deep_prompt=True),
    ))


def assert_tree_covers(flax_params, converted, where="", allow_extra=()):
    expected = set(flatten_keys(jax.tree_util.tree_map(np.asarray, flax_params)))
    got = set(flatten_keys(converted))
    missing = sorted(expected - got)
    extra = sorted(k for k in got - expected
                   if not any(k.startswith(p) for p in allow_extra))
    assert not missing and not extra, (
        f"{where}: converter tree mismatch missing={missing} extra={extra}")


RNGS = dict(params=jax.random.PRNGKey(0), gumbel=jax.random.PRNGKey(11),
            mask=jax.random.PRNGKey(22), dropout=jax.random.PRNGKey(33),
            droppath=jax.random.PRNGKey(44))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestStageIIFullGraph:
    def test_distillation_loss_matches_torch(self, rng):
        torch.manual_seed(0)
        tmodel = TorchDistill().eval()
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.act_distillation_rules())

        cfg = tiny_distill_cfg()
        fmodel = ACT_PointDistillation(cfg)
        pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        variables = fmodel.init(RNGS, pts)
        # production load boundary: per-block converted trees stack onto the
        # scanned student/decoder layouts (engine/checkpoint.py)
        from act_tpu.engine.checkpoint import adapt_block_layout
        params = adapt_block_layout(params, jax.device_get(variables["params"]))
        # the Stage-II graph never calls the dVAE FoldingNet decoder, so flax
        # creates no params for it; the torch ckpt carries it unused (the
        # reference loads the dVAE strictly, models/act.py:1154-1156)
        assert_tree_covers(variables["params"], params, "ACT_PointDistillation",
                           allow_extra=("dvae_tokenizer.decoder.",))

        new_vars = {"params": params, "batch_stats": batch_stats}
        out, inter = fmodel.apply(new_vars, pts, train=False, rngs=RNGS,
                                  mutable=["intermediates"])
        ii = inter["intermediates"]
        mask = np.asarray(ii["mask"][0])
        u = np.asarray(ii["dvae_tokenizer"]["gumbel_u"][0])
        nbr = np.asarray(ii["neighborhood"][0])
        center = np.asarray(ii["center"][0])

        with torch.no_grad():
            expect = tmodel(torch.from_numpy(nbr), torch.from_numpy(center),
                            torch.from_numpy(mask), torch.from_numpy(u))
        got = float(out)
        np.testing.assert_allclose(got, float(expect), atol=1e-4)

    def test_dvae_recon_forward_matches_torch(self, rng):
        torch.manual_seed(1)
        tdvae = TorchDVAE().eval()
        sd = {k: to_np(v) for k, v in tdvae.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(sd, tc.dvae_rules(""))

        cfg = tiny_distill_cfg().dvae_config
        fmodel = ACTPromptedDiscreteVAEwithVIT(cfg)
        pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        variables = fmodel.init(RNGS, pts)
        assert_tree_covers(variables["params"], params, "dVAE")

        new_vars = {"params": params, "batch_stats": batch_stats}
        ret, inter = fmodel.apply(new_vars, pts, 0.7, False, train=False,
                                  rngs=RNGS, mutable=["intermediates"])
        whole_coarse, whole_fine, coarse, fine, nbr, logits = ret
        u = np.asarray(inter["intermediates"]["gumbel_u"][0])
        center = (np.asarray(whole_fine).reshape(B, G, M, 3)
                  - np.asarray(fine))[:, :, 0, :]

        with torch.no_grad():
            e = tdvae(torch.from_numpy(np.asarray(nbr)),
                      torch.from_numpy(center.astype(np.float32)),
                      torch.from_numpy(u), temperature=0.7)
        np.testing.assert_allclose(np.asarray(logits), to_np(e[5]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(whole_coarse), to_np(e[0]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(whole_fine), to_np(e[1]),
                                   atol=2e-4)


class TorchPointTransformer(tnn.Module):
    """Finetune classifier (reference models/act.py:727-910, mlp-3 head).
    Parameterized so the parity rehearsal can build it at released full
    scale (384/12/6); reduce_dim is Identity when dims match like the
    reference (act.py:748-750)."""

    def __init__(self, cls_dim=6, embed=None, enc_dims=None, depth=None,
                 heads=None):
        super().__init__()
        embed = EMBED if embed is None else embed
        enc_dims = ENC_DIMS if enc_dims is None else enc_dims
        depth = DEPTH if depth is None else depth
        heads = HEADS if heads is None else heads
        self.encoder = TorchMiniPointNet(enc_dims)
        self.reduce_dim = (tnn.Linear(enc_dims, embed)
                           if enc_dims != embed else tnn.Identity())
        self.cls_token = tnn.Parameter(torch.randn(1, 1, embed) * 0.02)
        self.cls_pos = tnn.Parameter(torch.randn(1, 1, embed) * 0.02)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, embed))
        self.blocks = TorchEncoderStack(embed, depth, heads)
        self.norm = tnn.LayerNorm(embed)
        self.cls_head_finetune = tnn.Sequential(
            tnn.Linear(embed * 2, 256), tnn.BatchNorm1d(256),
            tnn.ReLU(inplace=True), tnn.Dropout(0.5),
            tnn.Linear(256, 256), tnn.BatchNorm1d(256),
            tnn.ReLU(inplace=True), tnn.Dropout(0.5),
            tnn.Linear(256, cls_dim))

    def forward(self, nbr, center):
        tokens = self.reduce_dim(self.encoder(nbr))
        Bb = tokens.shape[0]
        cls_tok = self.cls_token.expand(Bb, -1, -1)
        cls_pos = self.cls_pos.expand(Bb, -1, -1)
        pos = torch.cat([cls_pos, self.pos_embed(center)], dim=1)
        x = torch.cat([cls_tok, tokens], dim=1)
        x = self.norm(self.blocks(x, pos))
        concat_f = torch.cat([x[:, 0], x[:, 1:].max(1)[0]], dim=-1)
        return self.cls_head_finetune(concat_f)


class TestConverterCLI:
    @pytest.mark.slow
    def test_pth_to_orbax_end_to_end(self, rng, tmp_path):
        """The model_zoo recipe as executed: torch.save a full reference-layout
        PointTransformer state dict, run tools/convert_checkpoint.py, load the
        orbax result back, and check it matches the in-process conversion and
        produces the same logits."""
        import subprocess
        import sys as _sys
        torch.manual_seed(5)
        tmodel = TorchPointTransformer().eval()
        pth = tmp_path / "scan_hardest.pth"
        torch.save({"base_model": tmodel.state_dict()}, pth)
        dst = tmp_path / "scan_hardest.orbax"
        r = subprocess.run(
            [_sys.executable, "tools/convert_checkpoint.py", "--src", str(pth),
             "--dst", str(dst), "--model", "PointTransformer",
             "--head", "mlp-3"],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr[-2000:]

        from act_tpu.engine import checkpoint as ckpt_lib
        loaded = ckpt_lib.load_checkpoint(str(dst))
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.point_transformer_rules(head="mlp-3"))
        for want, got in (
                (params, loaded["params"]),
                (batch_stats, loaded["batch_stats"])):
            fw = jax.tree_util.tree_leaves_with_path(want)
            fg = dict((jax.tree_util.keystr(p), v) for p, v in
                      jax.tree_util.tree_leaves_with_path(got))
            assert len(fw) == len(fg)
            for p, v in fw:
                np.testing.assert_array_equal(
                    np.asarray(v), np.asarray(fg[jax.tree_util.keystr(p)]))

        cfg = ConfigDict(dict(
            NAME="PointTransformer", embed_dim=EMBED, cls_dim=6,
            num_group=G, group_size=M, encoder_dims=ENC_DIMS, depth=DEPTH,
            num_heads=HEADS, drop_path_rate=0.0, transfer_type="full",
            npoints=N))
        fmodel = PointTransformer(cfg)
        pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        from act_tpu.engine.checkpoint import adapt_block_layout
        key = jax.random.PRNGKey(0)
        target = jax.eval_shape(lambda: fmodel.init(
            dict(params=key, dropout=key, droppath=key), pts))
        got = np.asarray(fmodel.apply(
            {"params": adapt_block_layout(loaded["params"], target["params"]),
             "batch_stats": loaded["batch_stats"]}, pts, train=False))
        nbr, center = ops.group_points(pts, G, M)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(np.asarray(nbr)),
                                  torch.from_numpy(np.asarray(center))))
        np.testing.assert_allclose(got, expect, atol=2e-4)


class TestPointTransformerFullGraph:
    def test_logits_match_torch(self, rng):
        torch.manual_seed(2)
        tmodel = TorchPointTransformer().eval()
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.point_transformer_rules(head="mlp-3"))

        cfg = ConfigDict(dict(
            NAME="PointTransformer", embed_dim=EMBED, cls_dim=6,
            num_group=G, group_size=M, encoder_dims=ENC_DIMS, depth=DEPTH,
            num_heads=HEADS, drop_path_rate=0.0, transfer_type="full",
            npoints=N))
        fmodel = PointTransformer(cfg)
        pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        variables = fmodel.init(dict(params=key, dropout=key, droppath=key), pts)
        from act_tpu.engine.checkpoint import adapt_block_layout
        params = adapt_block_layout(params, jax.device_get(variables["params"]))
        # torch has no cls_head (pretrain-only) here; assert student trunk +
        # head coverage
        assert_tree_covers(variables["params"], params, "PointTransformer")

        got = np.asarray(fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, pts, train=False))

        nbr, center = ops.group_points(pts, G, M)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(np.asarray(nbr)),
                                  torch.from_numpy(np.asarray(center))))
        np.testing.assert_allclose(got, expect, atol=2e-4)

    def test_linear_head_rules(self, rng):
        """The reference linear head is Sequential(Linear) -> keys
        cls_head_finetune.0.* (models/act.py:772-775)."""
        sd = {"cls_head_finetune.0.weight": np.ones((6, EMBED * 2), np.float32),
              "cls_head_finetune.0.bias": np.zeros(6, np.float32)}
        params, _ = tc.convert_state_dict(
            sd, tc.point_transformer_rules(head="linear"))
        assert params["cls_head_finetune"]["kernel"].shape == (EMBED * 2, 6)


@pytest.mark.slow
class TestParityRehearsal:
    """Full-size rehearsal of tools/parity_protocol.py (VERDICT r2 #1): a
    fabricated torch state dict with the exact released key layout at the
    published finetune_scan_hardest scale (embed 384 / depth 12 / heads 6 /
    encoder 384, reference models/act.py:727-910 + the shipped config) goes
    through the production converter -> orbax -> reference --test protocol
    on the synthetic dataset fallback. Pins (a) the one-command pipeline runs
    end-to-end, (b) converter key coverage at full scale incl. the
    reduce_dim=Identity branch, (c) full-graph logits parity. Zero debugging
    left for the day the real archives appear."""

    def test_full_scale_pth_to_test_protocol(self, rng, tmp_path, monkeypatch):
        from tools.parity_protocol import run_protocol
        from act_tpu.engine import checkpoint as ckpt_lib

        torch.manual_seed(11)
        tmodel = TorchPointTransformer(cls_dim=15, embed=384, enc_dims=384,
                                       depth=12, heads=6).eval()
        pth = tmp_path / "released_scan_hardest.pth"
        torch.save({"base_model": tmodel.state_dict()}, pth)

        monkeypatch.chdir("/root/repo")
        result = run_protocol("scan_hardest", str(pth),
                              exp_name=f"rehearsal_{os.getpid()}")
        assert 0.0 <= result["ours"] <= 100.0
        assert result["zoo_acc"] == 88.21

        # (b) converter coverage: the orbax tree must exactly cover the real
        # finetune model's param/batch_stats trees (no missing, no extras)
        loaded = ckpt_lib.load_checkpoint(
            f"./work_dirs/parity/rehearsal_{os.getpid()}/converted.orbax")
        cfg = ConfigDict(dict(
            NAME="PointTransformer", embed_dim=384, depth=12,
            drop_path_rate=0.1, cls_dim=15, num_heads=6, group_size=32,
            num_group=128, encoder_dims=384, transfer_type="full"))
        fmodel = PointTransformer(cfg)
        k = jax.random.PRNGKey(0)
        shapes = jax.eval_shape(
            lambda: fmodel.init(dict(params=k, dropout=k, droppath=k),
                                jnp.zeros((2, 2048, 3), jnp.float32)))
        # production load boundary stacks per-block trees onto the scanned
        # layout; mirror it before the key-set comparison
        from act_tpu.engine.checkpoint import adapt_block_layout
        loaded["params"] = adapt_block_layout(loaded["params"],
                                              shapes["params"])
        want_p = set(flatten_keys(shapes["params"]))
        got_p = set(flatten_keys(loaded["params"]))
        assert want_p == got_p, (sorted(want_p - got_p)[:5],
                                 sorted(got_p - want_p)[:5])
        want_b = set(flatten_keys(shapes["batch_stats"]))
        got_b = set(flatten_keys(loaded["batch_stats"]))
        assert want_b == got_b

        # (c) full-graph logits parity at full scale (eval mode)
        pts = jnp.asarray(rng.normal(size=(2, 1024, 3)).astype(np.float32))
        got = np.asarray(fmodel.apply(
            {"params": loaded["params"],
             "batch_stats": loaded["batch_stats"]}, pts, train=False))
        nbr, center = ops.group_points(pts, 128, 32)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(np.asarray(nbr)),
                                  torch.from_numpy(np.asarray(center))))
        np.testing.assert_allclose(got, expect, atol=1e-3)


# ---------------------------------------------------------------------------
# ACT_PointBERT full graph (MoCo q/k + mixup/cutmix + dVAE token labels)
# ---------------------------------------------------------------------------

class TorchBERTStudent(tnn.Module):
    """Point-BERT MaskTransformer minus the RNG: takes the mask as input
    (reference models/act.py:532-723, replace_pob=0 path)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchMiniPointNet(ENC_DIMS)
        self.reduce_dim = tnn.Linear(ENC_DIMS, EMBED)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.02)
        self.mask_token = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.02)
        self.cls_pos = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.02)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, EMBED))
        self.blocks = TorchEncoderStack(EMBED, DEPTH, HEADS)
        self.norm = tnn.LayerNorm(EMBED)
        self.lm_head = tnn.Linear(EMBED, NUM_TOKENS)
        self.cls_head = tnn.Sequential(
            tnn.Linear(EMBED, CLS_DIM), tnn.GELU(), tnn.Linear(CLS_DIM, CLS_DIM))

    def forward(self, nbr, center, mask, only_cls_tokens=False):
        tokens = self.reduce_dim(self.encoder(nbr))
        Bb, Gg, C = tokens.shape
        # mask the input tokens (reference :706-709)
        w = mask.unsqueeze(-1).type_as(tokens)
        tokens = tokens * (1 - w) + self.mask_token.expand(Bb, Gg, -1) * w
        pos = torch.cat([self.cls_pos.expand(Bb, -1, -1),
                         self.pos_embed(center)], dim=1)
        x = torch.cat([self.cls_token.expand(Bb, -1, -1), tokens], dim=1)
        x = self.norm(self.blocks(x, pos))
        if only_cls_tokens:
            return self.cls_head(x[:, 0])
        return self.cls_head(x[:, 0]), self.lm_head(x[:, 1:])


class TorchPointBERT(tnn.Module):
    """ACT_PointBERT composed graph minus the RNG: masks/mixup draws enter as
    inputs (reference models/act.py:913-1095)."""

    def __init__(self, K=8, T=0.07):
        super().__init__()
        self.transformer_q = TorchBERTStudent()
        self.transformer_k = TorchBERTStudent()
        self.dvae = TorchDVAE()
        self.T, self.K = T, K
        self.register_buffer("queue", torch.zeros(CLS_DIM, K))
        self.register_buffer("queue_ptr", torch.zeros(1, dtype=torch.long))

    def forward(self, nbr, center, mask_q, mask_mix, mask_k, ratio, mm):
        with torch.no_grad():
            dvae_label = self.dvae.encode_logits(nbr, center).argmax(-1).long()

        q_cls, logits = self.transformer_q(nbr, center, mask_q)
        q_cls = F.normalize(q_cls, dim=1)

        # mixup with pinned draws (reference _mixup_pc, :1006-1024)
        mmf = mm.type_as(nbr)
        mix_n = nbr * mmf[:, :, None, None] + nbr.flip(0) * (1 - mmf[:, :, None, None])
        mix_c = center * mmf[:, :, None] + center.flip(0) * (1 - mmf[:, :, None])
        mix_l = (dvae_label * mmf + dvae_label.flip(0) * (1 - mmf)).long()
        mix_cls, mix_logits = self.transformer_q(mix_n, mix_c, mask_mix)
        mix_cls = F.normalize(mix_cls, dim=1)

        with torch.no_grad():
            k_cls = F.normalize(
                self.transformer_k(nbr, center, mask_k, only_cls_tokens=True),
                dim=1)

        Bb = q_cls.shape[0]
        l_pos = torch.einsum("nc,nc->n", q_cls, k_cls).unsqueeze(-1)
        l_neg = torch.einsum("nc,ck->nk", q_cls, self.queue.clone().detach())
        ce = torch.cat([l_pos, l_neg], dim=1) / self.T
        moco_loss = F.cross_entropy(ce, torch.zeros(Bb, dtype=torch.long))

        dvae_loss = (F.cross_entropy(logits[mask_q], dvae_label[mask_q])
                     + F.cross_entropy(mix_logits[mask_mix], mix_l[mask_mix]))

        l_pos = torch.einsum("nc,mc->nm", mix_cls, k_cls)
        l_neg = torch.einsum("nc,ck->nk", mix_cls, self.queue.clone().detach())
        ce = torch.cat([l_pos, l_neg], dim=1) / self.T
        labels = torch.arange(Bb, dtype=torch.long)
        per = F.cross_entropy(ce, labels, reduction="none")
        per_flip = F.cross_entropy(ce, labels.flip(0), reduction="none")
        cutmix_loss = (ratio * per + (1 - ratio) * per_flip).mean()

        # dequeue/enqueue (reference :976-989)
        ptr = int(self.queue_ptr)
        self.queue[:, ptr:ptr + Bb] = k_cls.T
        self.queue_ptr[0] = (ptr + Bb) % self.K
        return moco_loss, dvae_loss, cutmix_loss


def tiny_pointbert_cfg():
    cfg = tiny_distill_cfg()
    cfg.NAME = "ACT_PointBERT"
    cfg.m, cfg.T, cfg.K = 0.999, 0.07, 8
    cfg.transformer_config.mask_ratio = [0.25, 0.45]
    cfg.transformer_config.moco_loss = True
    cfg.transformer_config.dvae_loss = True
    cfg.transformer_config.cutmix_loss = True
    cfg.transformer_config.return_all_tokens = False
    return cfg


class TestPointBERTFullGraph:
    def test_losses_and_queue_match_torch(self, rng):
        from act_tpu.models import ACT_PointBERT

        torch.manual_seed(7)
        tmodel = TorchPointBERT().eval()
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        buffers_sd = tc.pointbert_buffers(sd)
        sd = {k: v for k, v in sd.items() if k not in ("queue", "queue_ptr")}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.act_pointbert_rules())

        cfg = tiny_pointbert_cfg()
        fmodel = ACT_PointBERT(cfg)
        pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        variables = fmodel.init(RNGS, pts)
        from act_tpu.engine.checkpoint import adapt_block_layout
        params = adapt_block_layout(params, jax.device_get(variables["params"]))
        # the PointBERT graph only drives the dVAE tokenizer head
        # (encoder + dgcnn_1, reference models/act.py:1032-1034); flax creates
        # no params for the rest of the dVAE the torch ckpt carries
        assert_tree_covers(variables["params"], params, "ACT_PointBERT",
                           allow_extra=("dvae.codebook", "dvae.dgcnn_2",
                                        "dvae.decoder.", "dvae.proj_",
                                        "dvae.visual_", "dvae.deep_prompt"))
        # production buffer extraction sees the reference-registered buffers
        assert buffers_sd["queue"].shape == (CLS_DIM, 8)
        assert buffers_sd["queue_ptr"].shape == ()
        # seed the SAME queue on both sides (flax init draws its own)
        queue0 = np.asarray(variables["buffers"]["queue"])
        with torch.no_grad():
            tmodel.queue.copy_(torch.from_numpy(queue0))

        (moco, dvae_loss, cutmix), aux = fmodel.apply(
            {"params": params, "batch_stats": batch_stats,
             "buffers": variables["buffers"]},
            pts, train=False, rngs=RNGS,
            mutable=["intermediates", "buffers"])
        ii = aux["intermediates"]
        nbr = np.asarray(ii["neighborhood"][0])
        center = np.asarray(ii["center"][0])
        mask_q, mask_mix = [np.asarray(m) for m in
                            ii["transformer_q"]["mask"]]
        mask_k = np.asarray(ii["transformer_k"]["mask"][0])
        ratio = np.asarray(ii["mixup_ratio"][0])
        mm = np.asarray(ii["mixup_mask"][0])
        # non-degenerate draws (empty masks would NaN the torch CE)
        assert mask_q.sum() > 0 and mask_mix.sum() > 0

        with torch.no_grad():
            e_moco, e_dvae, e_cut = tmodel(
                torch.from_numpy(nbr), torch.from_numpy(center),
                torch.from_numpy(mask_q), torch.from_numpy(mask_mix),
                torch.from_numpy(mask_k), torch.from_numpy(ratio),
                torch.from_numpy(mm))

        np.testing.assert_allclose(float(moco), float(e_moco),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(dvae_loss), float(e_dvae),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(cutmix), float(e_cut),
                                   rtol=1e-4, atol=1e-4)
        # MoCo queue advance matches (reference _dequeue_and_enqueue)
        np.testing.assert_allclose(np.asarray(aux["buffers"]["queue"]),
                                   to_np(tmodel.queue), atol=5e-4)
        assert int(aux["buffers"]["queue_ptr"]) == int(tmodel.queue_ptr)

    def test_converted_buffers_roundtrip(self):
        """pointbert_buffers extracts the reference queue buffers into the
        flax 'buffers' collection shapes (queue_ptr (1,) long -> () int32)."""
        sd = {"queue": np.ones((CLS_DIM, 8), np.float32),
              "queue_ptr": np.array([3], np.int64)}
        buf = tc.pointbert_buffers(sd)
        assert buf["queue"].shape == (CLS_DIM, 8)
        assert buf["queue_ptr"].shape == () and buf["queue_ptr"] == 3
        assert buf["queue_ptr"].dtype == np.int32


# ---------------------------------------------------------------------------
# Semantic segmentation full graph (released MODEL_ZOO row: S3DIS 61.2 mIoU)
# ---------------------------------------------------------------------------

class TorchSegStack(tnn.Module):
    """TransformerEncoder with multi-scale fetch at {3, 7, 11}
    (reference semantic_segmentation/models/pt.py:150-175)."""

    def __init__(self, dim, depth, heads):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)])

    def forward(self, x, pos, fetch=(3, 7, 11)):
        out = []
        for i, blk in enumerate(self.blocks):
            x = blk(x + pos)
            if i in fetch:
                out.append(x)
        return out


class TorchPropagation(tnn.Module):
    """PointNetFeaturePropagation (reference semantic_segmentation/models/
    pointnet2_utils.py:262-312): 3-NN inverse-distance interpolation +
    Conv1d/BN/ReLU MLP. Channel-first like the reference."""

    def __init__(self, in_channel, mlp):
        super().__init__()
        self.mlp_convs = tnn.ModuleList()
        self.mlp_bns = tnn.ModuleList()
        last = in_channel
        for out in mlp:
            self.mlp_convs.append(tnn.Conv1d(last, out, 1))
            self.mlp_bns.append(tnn.BatchNorm1d(out))
            last = out

    def forward(self, xyz1, xyz2, points1, points2):
        # xyz1 (B,3,N) unknown, xyz2 (B,3,S) known, points1 (B,3,N) raw
        # coords, points2 (B,D,S) features
        xyz1 = xyz1.permute(0, 2, 1)
        xyz2 = xyz2.permute(0, 2, 1)
        points2 = points2.permute(0, 2, 1)
        B, N, _ = xyz1.shape
        d = (xyz1.unsqueeze(2) - xyz2.unsqueeze(1)).pow(2).sum(-1)  # (B,N,S)
        dists, idx = d.sort(dim=-1)
        dists, idx = dists[:, :, :3], idx[:, :, :3]
        recip = 1.0 / (dists + 1e-8)
        weight = recip / recip.sum(2, keepdim=True)
        gathered = torch.stack(
            [points2[b][idx[b]] for b in range(B)])  # (B,N,3,D)
        interp = (gathered * weight.unsqueeze(-1)).sum(2)  # (B,N,D)
        new = torch.cat([points1.permute(0, 2, 1), interp], dim=-1)
        new = new.permute(0, 2, 1)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            new = F.relu(bn(conv(new)))
        return new  # (B, mlp[-1], N)


class TorchSemSeg(tnn.Module):
    """S3DIS get_model (reference semantic_segmentation/models/pt.py:178-350),
    released full-scale dims (384/12/6), grouping taken as input."""

    def __init__(self, cls_dim=13, dim=384, depth=12, heads=6):
        super().__init__()
        self.encoder = TorchMiniPointNet(dim)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, dim))
        self.blocks = TorchSegStack(dim, depth, heads)
        self.norm = tnn.LayerNorm(dim)
        self.propagation_0_cls = TorchPropagation(dim * 3 + 3,
                                                  [dim * 4, 1024])
        self.convs1_cls = tnn.Conv1d(1024 + dim * 6, 512, 1)
        self.dp1 = tnn.Dropout(0.5)
        self.convs2_cls = tnn.Conv1d(512, 256, 1)
        self.convs3_cls = tnn.Conv1d(256, cls_dim, 1)
        self.bns1_cls = tnn.BatchNorm1d(512)
        self.bns2_cls = tnn.BatchNorm1d(256)

    def forward(self, nbr, center, pts):
        Bb, Nn = pts.shape[:2]
        tokens = self.encoder(nbr)
        pos = self.pos_embed(center)
        feats = self.blocks(tokens, pos)
        feats = [self.norm(f).transpose(-1, -2) for f in feats]
        x = torch.cat(feats, dim=1)  # (B, 1152, G)
        x_max = x.max(2)[0]
        x_avg = x.mean(2)
        x_global = torch.cat([
            x_max.view(Bb, -1).unsqueeze(-1).repeat(1, 1, Nn),
            x_avg.view(Bb, -1).unsqueeze(-1).repeat(1, 1, Nn)], dim=1)
        f0 = self.propagation_0_cls(pts.transpose(-1, -2),
                                    center.transpose(-1, -2),
                                    pts.transpose(-1, -2), x)
        h = torch.cat([f0, x_global], dim=1)
        h = F.relu(self.bns1_cls(self.convs1_cls(h)))
        h = self.dp1(h)
        h = F.relu(self.bns2_cls(self.convs2_cls(h)))
        h = self.convs3_cls(h)
        return F.log_softmax(h, dim=1).permute(0, 2, 1)


class TestSemSegFullGraph:
    def test_log_probs_match_torch(self, rng):
        from act_tpu.models.segmentation import SemSegTransformer

        torch.manual_seed(13)
        tmodel = TorchSemSeg().eval()
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.seg_rules(with_label=False))

        cfg = ConfigDict(dict(NAME="SemSegTransformer", cls_dim=13,
                              num_group=16, group_size=8))
        fmodel = SemSegTransformer(cfg)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        variables = fmodel.init(RNGS, pts)
        from act_tpu.engine.checkpoint import adapt_block_layout
        params = adapt_block_layout(params, jax.device_get(variables["params"]))
        assert_tree_covers(variables["params"], params, "SemSegTransformer")
        assert_tree_covers(variables["batch_stats"], batch_stats,
                           "SemSegTransformer/bs")

        got = np.asarray(fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, pts, train=False))

        nbr, center = ops.group_points(pts, 16, 8)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(np.asarray(nbr)),
                                  torch.from_numpy(np.asarray(center)),
                                  torch.from_numpy(np.asarray(pts))))
        np.testing.assert_allclose(got, expect, atol=5e-4)

    def test_released_rename_layout_also_converts(self):
        """The released ckpt predates the *_cls rename (the reference loads it
        via load_model_from_ckpt_withrename); both key layouts must hit the
        same rules."""
        for prefix in ("convs1", "convs1_cls"):
            sd = {f"{prefix}.weight": np.ones((512, 3328, 1), np.float32)}
            params, _ = tc.convert_state_dict(sd, tc.seg_rules(False))
            assert params["head"]["convs1"]["kernel"].shape == (3328, 512)


@pytest.mark.slow
class TestSemSegParityRehearsal:
    """Turnkey parity rehearsal for the released S3DIS row (MODEL_ZOO.md:16):
    a fabricated full-scale state dict in the exact released layout
    (pre-*_cls key names under 'model_state_dict') goes through the
    production converter -> orbax -> whole-scene vote eval. Zero debugging
    left for the day the archive appears."""

    def test_released_s3dis_pth_to_whole_scene_eval(self, tmp_path,
                                                    monkeypatch):
        from tools.parity_protocol import run_protocol
        torch.manual_seed(23)
        tmodel = TorchSemSeg().eval()
        sd = {k.replace("_cls", ""): v for k, v in tmodel.state_dict().items()}
        pth = tmp_path / "s3dis_best.pth"
        torch.save({"model_state_dict": sd, "epoch": 99}, pth)
        monkeypatch.chdir("/root/repo")
        result = run_protocol("s3dis", str(pth),
                              exp_name=f"s3dis_rehearsal_{os.getpid()}",
                              smoke=True)
        assert result["zoo_acc"] == 61.2
        assert 0.0 <= result["ours"] <= 100.0


class TorchPartSeg(tnn.Module):
    """ShapeNetPart get_model (reference part_segmentation/models/pt.py:
    178-350): the semseg trunk + 16-way object-label conv in the global
    feature."""

    def __init__(self, cls_dim=50, dim=384, depth=12, heads=6):
        super().__init__()
        self.encoder = TorchMiniPointNet(dim)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, dim))
        self.blocks = TorchSegStack(dim, depth, heads)
        self.norm = tnn.LayerNorm(dim)
        self.label_conv_cls = tnn.Sequential(
            tnn.Conv1d(16, 64, kernel_size=1, bias=False),
            tnn.BatchNorm1d(64), tnn.LeakyReLU(0.2))
        self.propagation_0_cls = TorchPropagation(dim * 3 + 3,
                                                  [dim * 4, 1024])
        self.convs1_cls = tnn.Conv1d(1024 + dim * 6 + 64, 512, 1)
        self.dp1 = tnn.Dropout(0.5)
        self.convs2_cls = tnn.Conv1d(512, 256, 1)
        self.convs3_cls = tnn.Conv1d(256, cls_dim, 1)
        self.bns1_cls = tnn.BatchNorm1d(512)
        self.bns2_cls = tnn.BatchNorm1d(256)

    def forward(self, nbr, center, pts, cls_label):
        Bb, Nn = pts.shape[:2]
        tokens = self.encoder(nbr)
        pos = self.pos_embed(center)
        feats = self.blocks(tokens, pos)
        feats = [self.norm(f).transpose(-1, -2) for f in feats]
        x = torch.cat(feats, dim=1)
        x_max = x.max(2)[0]
        x_avg = x.mean(2)
        lab = self.label_conv_cls(cls_label.view(Bb, 16, 1))
        x_global = torch.cat([
            x_max.view(Bb, -1).unsqueeze(-1).repeat(1, 1, Nn),
            x_avg.view(Bb, -1).unsqueeze(-1).repeat(1, 1, Nn),
            lab.repeat(1, 1, Nn)], dim=1)
        f0 = self.propagation_0_cls(pts.transpose(-1, -2),
                                    center.transpose(-1, -2),
                                    pts.transpose(-1, -2), x)
        h = torch.cat([f0, x_global], dim=1)
        h = F.relu(self.bns1_cls(self.convs1_cls(h)))
        h = self.dp1(h)
        h = F.relu(self.bns2_cls(self.convs2_cls(h)))
        h = self.convs3_cls(h)
        return F.log_softmax(h, dim=1).permute(0, 2, 1)


class TestPartSegFullGraph:
    def test_log_probs_match_torch(self, rng):
        from act_tpu.models.segmentation import PartSegTransformer

        torch.manual_seed(17)
        tmodel = TorchPartSeg().eval()
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.seg_rules(with_label=True))

        cfg = ConfigDict(dict(NAME="PartSegTransformer", cls_dim=50,
                              num_group=16, group_size=8))
        fmodel = PartSegTransformer(cfg)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        one_hot = jnp.eye(16, dtype=jnp.float32)[jnp.asarray([2, 9])]
        variables = fmodel.init(RNGS, pts, one_hot)
        from act_tpu.engine.checkpoint import adapt_block_layout
        params = adapt_block_layout(params, jax.device_get(variables["params"]))
        assert_tree_covers(variables["params"], params, "PartSegTransformer")
        assert_tree_covers(variables["batch_stats"], batch_stats,
                           "PartSegTransformer/bs")

        got = np.asarray(fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, pts, one_hot,
            train=False))

        nbr, center = ops.group_points(pts, 16, 8)
        with torch.no_grad():
            expect = to_np(tmodel(
                torch.from_numpy(np.asarray(nbr)),
                torch.from_numpy(np.asarray(center)),
                torch.from_numpy(np.asarray(pts)),
                torch.from_numpy(np.asarray(one_hot))))
        np.testing.assert_allclose(got, expect, atol=5e-4)


@pytest.mark.slow
class TestFewShotParityRehearsal:
    """Few-shot MODEL_ZOO rows: released pretrain .pth -> convert -> fold
    finetunes -> mean±std acc. Smoke pins the turnkey pipeline (single fold,
    tiny model; 20% = 5-way chance with a tiny fabricated ckpt)."""

    def test_pretrain_pth_to_fewshot_protocol(self, tmp_path, monkeypatch):
        from tools.parity_protocol import run_protocol
        torch.manual_seed(29)
        tmodel = TorchDistill().eval()
        pth = tmp_path / "pretrain.pth"
        torch.save({"base_model": tmodel.state_dict()}, pth)
        monkeypatch.chdir("/root/repo")
        result = run_protocol("fewshot_modelnet_5w10s", str(pth),
                              exp_name=f"fewshot_rehearsal_{os.getpid()}",
                              smoke=True)
        assert result["zoo_acc"] == 96.8
        assert 0.0 <= result["ours"] <= 100.0
        assert "std" in result


@pytest.mark.slow
class TestDvaeParityRehearsal:
    """Autoencoding MODEL_ZOO row (MODEL_ZOO.md:8): a fabricated full-scale
    Stage-I state dict in the released layout ({'base_model': ...}, prompted
    ViT-B teacher) goes through the production converter -> orbax ->
    ``--val`` CDL1/CDL2/F-score protocol (reference
    tools/runner_autoencoder.py:219-323). With this leg every released
    artifact row has a one-command parity path."""

    def test_released_dvae_pth_to_val_protocol(self, tmp_path, monkeypatch):
        import sys
        from tools.parity_protocol import run_protocol
        from act_tpu.engine import checkpoint as ckpt_lib
        from act_tpu.utils.config import cfg_from_yaml_file

        # published scale (cfgs/autoencoder/act_dvae_with_pretrained_
        # transformer.yaml): ViT-B/768x12 teacher, 8192-token codebook
        fg = sys.modules[__name__]
        for name, val in dict(ENC_DIMS=384, NUM_TOKENS=8192, TOKENS_DIMS=384,
                              DECODER_DIMS=384, M=32, TD=768, TDEPTH=12,
                              THEADS=12, P=64).items():
            monkeypatch.setattr(fg, name, val)
        torch.manual_seed(31)
        tmodel = TorchDVAE().eval()
        pth = tmp_path / "released_dvae.pth"
        torch.save({"base_model": tmodel.state_dict()}, pth)

        monkeypatch.chdir("/root/repo")
        result = run_protocol("dvae", str(pth),
                              exp_name=f"dvae_rehearsal_{os.getpid()}",
                              smoke=True)
        assert result["zoo_acc"] is None  # zoo publishes no number (N/A)
        assert set(result["metrics"]) == {"F-Score", "CDL1", "CDL2"}
        assert all(np.isfinite(v) for v in result["metrics"].values())

        # converter coverage: the orbax tree must exactly cover the real
        # full-scale flax model's param/batch_stats trees
        loaded = ckpt_lib.load_checkpoint(
            f"./work_dirs/parity/dvae_rehearsal_{os.getpid()}/converted.orbax")
        config = cfg_from_yaml_file(
            "cfgs/autoencoder/act_dvae_with_pretrained_transformer.yaml")
        from act_tpu.models import MODELS
        fmodel = MODELS.build(config.model)
        k = jax.random.PRNGKey(0)
        shapes = jax.eval_shape(lambda: fmodel.init(
            dict(params=k, gumbel=k, dropout=k, droppath=k, mask=k),
            jnp.zeros((1, 1024, 3), jnp.float32)))
        from act_tpu.engine.checkpoint import adapt_block_layout
        loaded["params"] = adapt_block_layout(loaded["params"],
                                              shapes["params"])
        want_p = set(flatten_keys(shapes["params"]))
        got_p = set(flatten_keys(loaded["params"]))
        assert want_p == got_p, (sorted(want_p - got_p)[:5],
                                 sorted(got_p - want_p)[:5])
        want_b = set(flatten_keys(shapes["batch_stats"]))
        got_b = set(flatten_keys(loaded["batch_stats"]))
        assert want_b == got_b, (sorted(want_b - got_b)[:5],
                                 sorted(got_b - want_b)[:5])
