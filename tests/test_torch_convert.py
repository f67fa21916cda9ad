"""Numerical equivalence: torch reference blocks vs flax modules under converted
weights. The torch minis below are built from the reference's documented layer
recipes (SURVEY.md §2.3) to act as ground truth for the weight converter."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn

from act_tpu.engine import torch_convert as tc
from act_tpu.models.common import GroupEncoder, Block, PosEmbedMLP


def to_np(t):
    return t.detach().cpu().numpy()


class TorchMiniPointNet(tnn.Module):
    """Conv1d(3-128)-BN-ReLU-Conv1d(128-256) | concat max | Conv1d(512-512)-BN-
    ReLU-Conv1d(512-C): the reference Encoder recipe (models/dvae.py:185-215)."""

    def __init__(self, C):
        super().__init__()
        self.first_conv = tnn.Sequential(
            tnn.Conv1d(3, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
            tnn.Conv1d(128, 256, 1))
        self.second_conv = tnn.Sequential(
            tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, C, 1))

    def forward(self, pg):  # B G M 3
        bs, g, m, _ = pg.shape
        x = pg.reshape(bs * g, m, 3)
        f = self.first_conv(x.transpose(2, 1))
        fg = torch.max(f, dim=2, keepdim=True)[0]
        f = torch.cat([fg.expand(-1, -1, m), f], dim=1)
        f = self.second_conv(f)
        return torch.max(f, dim=2)[0].reshape(bs, g, -1)


class TestEncoderEquivalence:
    def test_group_encoder_matches_torch(self, rng):
        C = 32
        tmodel = TorchMiniPointNet(C).eval()
        sd = {k: to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(sd, tc.encoder_rules(
            "", "enc"))
        # strip the empty-prefix artifacts: rules used src="" giving keys
        # like '.first_conv...' — handled below by regex on full names
        # simpler: rebuild with explicit prefix
        tsd = {f"encoder.{k}": v for k, v in sd.items()}
        params, batch_stats = tc.convert_state_dict(
            tsd, tc.encoder_rules("encoder", "encoder"))

        x = rng.normal(size=(2, 4, 16, 3)).astype(np.float32)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(x)))

        fmodel = GroupEncoder(C)
        variables = {"params": params["encoder"],
                     "batch_stats": batch_stats["encoder"]}
        got = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, expect, atol=2e-4)


class TorchBlock(tnn.Module):
    """Pre-LN ViT block (reference models/act.py:72-90)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn = tnn.ModuleDict({})
        self.attn_qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.attn_proj = tnn.Linear(dim, dim)
        self.mlp_fc1 = tnn.Linear(dim, dim * 4)
        self.mlp_fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn_proj(h)
        h = self.norm2(x)
        h = self.mlp_fc2(torch.nn.functional.gelu(self.mlp_fc1(h)))
        return x + h

    def state_dict_timm(self):
        """Rename to timm layout for the converter."""
        sd = {}
        sd["blocks.0.norm1.weight"] = to_np(self.norm1.weight)
        sd["blocks.0.norm1.bias"] = to_np(self.norm1.bias)
        sd["blocks.0.norm2.weight"] = to_np(self.norm2.weight)
        sd["blocks.0.norm2.bias"] = to_np(self.norm2.bias)
        sd["blocks.0.attn.qkv.weight"] = to_np(self.attn_qkv.weight)
        sd["blocks.0.attn.proj.weight"] = to_np(self.attn_proj.weight)
        sd["blocks.0.attn.proj.bias"] = to_np(self.attn_proj.bias)
        sd["blocks.0.mlp.fc1.weight"] = to_np(self.mlp_fc1.weight)
        sd["blocks.0.mlp.fc1.bias"] = to_np(self.mlp_fc1.bias)
        sd["blocks.0.mlp.fc2.weight"] = to_np(self.mlp_fc2.weight)
        sd["blocks.0.mlp.fc2.bias"] = to_np(self.mlp_fc2.bias)
        return sd


class TestBlockEquivalence:
    def test_vit_block_matches_torch(self, rng):
        dim, heads = 32, 4
        tblock = TorchBlock(dim, heads).eval()
        params, _ = tc.convert_state_dict(tblock.state_dict_timm(),
                                          tc.vit_block_rules("blocks", "stack"))
        x = rng.normal(size=(2, 9, dim)).astype(np.float32)
        with torch.no_grad():
            expect = to_np(tblock(torch.from_numpy(x)))
        fblock = Block(num_heads=heads, qkv_bias=False)
        got = np.asarray(fblock.apply(
            {"params": params["stack"]["blocks_0"]}, jnp.asarray(x), True))
        np.testing.assert_allclose(got, expect, atol=2e-4)


class TestPosEmbedEquivalence:
    def test_pos_embed(self, rng):
        tmod = tnn.Sequential(tnn.Linear(3, 128), tnn.GELU(),
                              tnn.Linear(128, 32)).eval()
        sd = {f"pos_embed.{k}": to_np(v) for k, v in tmod.state_dict().items()}
        params, _ = tc.convert_state_dict(sd, tc.pos_embed_rules("pos_embed",
                                                                 "pos_embed"))
        x = rng.normal(size=(2, 5, 3)).astype(np.float32)
        with torch.no_grad():
            expect = to_np(tmod(torch.from_numpy(x)))
        got = np.asarray(PosEmbedMLP(32).apply(
            {"params": params["pos_embed"]}, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, atol=1e-5)
