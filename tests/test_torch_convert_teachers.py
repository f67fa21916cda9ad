"""Converter + forward equivalence for the CLIP and BERT teacher variants.

Ground truths are built in-test from the reference's documented recipes:
- CLIP: ln_pre + ResidualAttentionBlocks (nn.MultiheadAttention in LND layout,
  QuickGELU) + ln_post, prompts (re-)spliced per layer, pos added at every
  block input (reference models/dvae.py:394-403,500-534,536-576). We compare
  against the *intended* per-sample semantics (correct NLD<->LND transposes).
- BERT: the actual HuggingFace BertEncoder, pos added once at the encoder
  input (reference models/dvae.py:652-663,744: visual_embed(x + pos)[0]).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from act_tpu.engine import torch_convert as tc
from act_tpu.engine.checkpoint import flatten_keys
from act_tpu.models.teacher import PromptedTeacher


def to_np(t):
    return t.detach().cpu().numpy()


D, HEADS, T, P, DEPTH = 48, 4, 24, 4, 3
B, G = 2, 6


class QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchCLIPBlock(tnn.Module):
    """CLIP ResidualAttentionBlock recipe (pre-LN, fused-qkv MHA, QuickGELU)."""

    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d)
        self.attn = tnn.MultiheadAttention(d, h)
        self.ln_2 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(d, d * 4))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", tnn.Linear(d * 4, d))

    def forward(self, x):  # x: (L, N, D)
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class TorchCLIPTeacher(tnn.Module):
    """Full prompted CLIP teacher with deep prompts, per the reference's
    intended semantics (dvae.py:536-576 with correct LND transposes)."""

    def __init__(self):
        super().__init__()
        self.proj_pre = tnn.Linear(T, D)
        self.pos0 = tnn.Linear(3, 128)
        self.pos2 = tnn.Linear(128, D)
        self.proj_post = tnn.Linear(D, T)
        self.ln_pre = tnn.LayerNorm(D)
        self.ln_post = tnn.LayerNorm(D)
        self.blocks = tnn.ModuleList(
            [TorchCLIPBlock(D, HEADS) for _ in range(DEPTH)])
        self.prompt = tnn.Parameter(torch.randn(1, P, D) * 0.02)
        self.prompt_pos = tnn.Parameter(torch.randn(1, P, D) * 0.02)
        self.deep_prompt = tnn.Parameter(torch.randn(DEPTH - 1, P, D) * 0.02)
        self.deep_pos = tnn.Parameter(torch.randn(DEPTH - 1, P, D) * 0.02)

    def forward(self, tokens, center):
        Bb = tokens.shape[0]
        pos = self.pos2(torch.nn.functional.gelu(self.pos0(center)))
        x = self.proj_pre(tokens)
        x = torch.cat([self.prompt.expand(Bb, -1, -1), x], dim=1)
        pos = torch.cat([self.prompt_pos.expand(Bb, -1, -1), pos], dim=1)
        x = self.ln_pre(x)
        for i, blk in enumerate(self.blocks):
            if i >= 1:
                x = torch.cat([self.deep_prompt[i - 1].expand(Bb, -1, -1),
                               x[:, P:]], dim=1)
                pos = torch.cat([self.deep_pos[i - 1].expand(Bb, -1, -1),
                                 pos[:, P:]], dim=1)
            x = blk((x + pos).transpose(0, 1)).transpose(0, 1)
        x = self.ln_post(x)[:, P:]
        return self.proj_post(x)

    def act_state_dict(self):
        """Keys in the ACT checkpoint layout: visual_embed = Sequential(
        ln_pre=0, resblocks=1, ln_post=2); projections/prompts are siblings."""
        sd = {}
        sd["proj_pre.weight"] = to_np(self.proj_pre.weight)
        sd["proj_pre.bias"] = to_np(self.proj_pre.bias)
        sd["proj_post.weight"] = to_np(self.proj_post.weight)
        sd["proj_post.bias"] = to_np(self.proj_post.bias)
        sd["visual_pos_embed.0.weight"] = to_np(self.pos0.weight)
        sd["visual_pos_embed.0.bias"] = to_np(self.pos0.bias)
        sd["visual_pos_embed.2.weight"] = to_np(self.pos2.weight)
        sd["visual_pos_embed.2.bias"] = to_np(self.pos2.bias)
        sd["visual_prompt_token"] = to_np(self.prompt)
        sd["visual_prompt_pos"] = to_np(self.prompt_pos)
        sd["deep_prompt_tokens"] = to_np(self.deep_prompt)
        sd["deep_prompt_pos"] = to_np(self.deep_pos)
        sd["visual_embed.0.weight"] = to_np(self.ln_pre.weight)
        sd["visual_embed.0.bias"] = to_np(self.ln_pre.bias)
        sd["visual_embed.2.weight"] = to_np(self.ln_post.weight)
        sd["visual_embed.2.bias"] = to_np(self.ln_post.bias)
        for i, blk in enumerate(self.blocks):
            for k, v in blk.state_dict().items():
                sd[f"visual_embed.1.{i}.{k}"] = to_np(v)
        return sd


class TestCLIPTeacher:
    def test_clip_forward_matches_torch(self, rng):
        tmodel = TorchCLIPTeacher().eval()
        sd = tmodel.act_state_dict()
        params, _ = tc.convert_state_dict(sd, tc.clip_teacher_rules("", "t"))

        teacher = PromptedTeacher(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                                  tokens_dims=T, num_prompt_token=P,
                                  use_deep_prompt=True, arch="clip")
        tokens = rng.normal(size=(B, G, T)).astype(np.float32)
        center = rng.normal(size=(B, G, 3)).astype(np.float32)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(tokens),
                                  torch.from_numpy(center)))
        got = np.asarray(teacher.apply({"params": params["t"]},
                                       jnp.asarray(tokens), jnp.asarray(center),
                                       True))
        np.testing.assert_allclose(got, expect, atol=5e-4)

    def test_clip_key_coverage(self, rng):
        """Every flax param of the clip teacher is produced by the rules."""
        teacher = PromptedTeacher(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                                  tokens_dims=T, num_prompt_token=P,
                                  use_deep_prompt=True, arch="clip")
        key = jax.random.PRNGKey(0)
        variables = teacher.init({"params": key, "dropout": key},
                                 jnp.zeros((1, G, T)), jnp.zeros((1, G, 3)))
        expected = set(flatten_keys(jax.tree_util.tree_map(
            np.asarray, variables["params"])))
        sd = TorchCLIPTeacher().act_state_dict()
        params, _ = tc.convert_state_dict(sd, tc.clip_teacher_rules("", "t"))
        got = set(flatten_keys(params["t"]))
        assert expected == got, (
            f"missing={sorted(expected - got)} extra={sorted(got - expected)}")

    def test_clip_dvae_builds_from_registry(self):
        """visual_embed_type: clip_* must build the clip-arch teacher."""
        from act_tpu.models import MODELS
        from act_tpu.utils.config import ConfigDict
        cfg = ConfigDict(dict(
            NAME="ACTPromptedDiscreteVAEwithVIT", group_size=8, num_group=16,
            encoder_dims=32, num_tokens=64, tokens_dims=T, decoder_dims=32,
            visual_embed_type="clip_ViT-B/32", visual_embed_dim=D,
            visual_embed_depth=2, visual_embed_heads=4,
            visual_embed_pos="after_dgcnn1", freeze_visual_embed=True,
            num_prompt_token=P, use_deep_prompt=True))
        model = MODELS.build(cfg)
        key = jax.random.PRNGKey(0)
        rngs = dict(params=key, gumbel=key, dropout=key)
        pts = jnp.zeros((2, 128, 3))
        variables = model.init(rngs, pts)
        # clip-specific params exist
        ve = variables["params"]["visual_embed"]
        assert "ln_pre" in ve and "ln_post" in ve
        assert "c_fc" in ve["blocks_0"]


class TorchBertTeacher(tnn.Module):
    """Prompted BERT teacher around a real HF BertEncoder (non-deep prompts):
    proj_pre -> [prompt|tokens] -> BertEncoder(x + pos) -> strip -> proj_post
    (reference dvae.py:726-757 visual_embedding + forward_visual_feature)."""

    def __init__(self, bert_encoder):
        super().__init__()
        self.encoder = bert_encoder
        self.proj_pre = tnn.Linear(T, D)
        self.pos0 = tnn.Linear(3, 128)
        self.pos2 = tnn.Linear(128, D)
        self.proj_post = tnn.Linear(D, T)
        self.prompt = tnn.Parameter(torch.randn(1, P, D) * 0.02)
        self.prompt_pos = tnn.Parameter(torch.randn(1, P, D) * 0.02)

    def forward(self, tokens, center):
        Bb = tokens.shape[0]
        pos = self.pos2(torch.nn.functional.gelu(self.pos0(center)))
        x = self.proj_pre(tokens)
        x = torch.cat([self.prompt.expand(Bb, -1, -1), x], dim=1)
        pos = torch.cat([self.prompt_pos.expand(Bb, -1, -1), pos], dim=1)
        x = self.encoder(x + pos)[0][:, P:]
        return self.proj_post(x)

    def act_state_dict(self):
        sd = {}
        sd["proj_pre.weight"] = to_np(self.proj_pre.weight)
        sd["proj_pre.bias"] = to_np(self.proj_pre.bias)
        sd["proj_post.weight"] = to_np(self.proj_post.weight)
        sd["proj_post.bias"] = to_np(self.proj_post.bias)
        sd["visual_pos_embed.0.weight"] = to_np(self.pos0.weight)
        sd["visual_pos_embed.0.bias"] = to_np(self.pos0.bias)
        sd["visual_pos_embed.2.weight"] = to_np(self.pos2.weight)
        sd["visual_pos_embed.2.bias"] = to_np(self.pos2.bias)
        sd["visual_prompt_token"] = to_np(self.prompt)
        sd["visual_prompt_pos"] = to_np(self.prompt_pos)
        for k, v in self.encoder.state_dict().items():
            sd[f"visual_embed.0.{k}"] = to_np(v)
        return sd


def make_hf_encoder():
    transformers = pytest.importorskip("transformers")
    from transformers.models.bert.modeling_bert import BertEncoder
    cfg = transformers.BertConfig(
        hidden_size=D, num_attention_heads=HEADS, num_hidden_layers=DEPTH,
        intermediate_size=D * 4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
        attn_implementation="eager")
    if getattr(cfg, "_attn_implementation", None) is None:
        cfg._attn_implementation = "eager"
    return BertEncoder(cfg).eval()


class TestBertTeacher:
    def test_bert_forward_matches_hf(self, rng):
        enc = make_hf_encoder()
        tmodel = TorchBertTeacher(enc).eval()
        sd = tc.fuse_bert_qkv(tmodel.act_state_dict())
        params, _ = tc.convert_state_dict(sd, tc.bert_teacher_rules("", "t"))

        teacher = PromptedTeacher(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                                  tokens_dims=T, num_prompt_token=P,
                                  use_deep_prompt=False, arch="bert")
        tokens = rng.normal(size=(B, G, T)).astype(np.float32)
        center = rng.normal(size=(B, G, 3)).astype(np.float32)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(tokens),
                                  torch.from_numpy(center)))
        got = np.asarray(teacher.apply({"params": params["t"]},
                                       jnp.asarray(tokens), jnp.asarray(center),
                                       True))
        np.testing.assert_allclose(got, expect, atol=5e-4)

    def test_bert_key_coverage_no_leftovers(self):
        """fuse_bert_qkv + bert rules consume every HF encoder tensor."""
        enc = make_hf_encoder()
        tmodel = TorchBertTeacher(enc)
        sd = tc.fuse_bert_qkv(tmodel.act_state_dict())
        matched, _ = tc.convert_state_dict(sd, tc.bert_teacher_rules("", "t"))
        flat = flatten_keys(matched["t"])
        # 12 tensors per block + 10 shared (projs/pos/prompts, no deep prompts)
        assert len(flat) == 12 * DEPTH + 10

        teacher = PromptedTeacher(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                                  tokens_dims=T, num_prompt_token=P,
                                  use_deep_prompt=False, arch="bert")
        key = jax.random.PRNGKey(0)
        variables = teacher.init({"params": key, "dropout": key},
                                 jnp.zeros((1, G, T)), jnp.zeros((1, G, 3)))
        expected = set(flatten_keys(jax.tree_util.tree_map(
            np.asarray, variables["params"])))
        assert expected == set(flat), (
            f"missing={sorted(expected - set(flat))} "
            f"extra={sorted(set(flat) - expected)}")

    def test_load_hf_bert_raw_checkpoint(self):
        """Raw bert-base-style state dict (bert.encoder.layer.N) ingests."""
        enc = make_hf_encoder()
        sd = {f"bert.encoder.{k}": to_np(v) for k, v in enc.state_dict().items()}
        params, _ = tc.load_hf_bert(sd, dst="t")
        assert "blocks_0" in params["t"]
        assert params["t"]["blocks_0"]["attn"]["qkv"]["kernel"].shape == (D, 3 * D)
