"""Deeper converter equivalence: DGCNN, FoldingNet decoder, and the prompted
teacher end-to-end, vs in-test torch ground truths built from the reference's
documented recipes (SURVEY.md §2.3)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from act_tpu.engine import torch_convert as tc
from act_tpu.engine.checkpoint import flatten_keys
from act_tpu.models.common import DGCNN, FoldingDecoder
from act_tpu.models.teacher import PromptedTeacher


def to_np(t):
    return t.detach().cpu().numpy()


class TorchDGCNN(tnn.Module):
    """4 rounds of k=4 coordinate-space graph features + GN convs
    (reference DGCNN recipe, models/dvae.py:26-117)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.input_trans = tnn.Conv1d(in_ch, 128, 1)
        def gn_block(i, o):
            return tnn.Sequential(tnn.Conv2d(i, o, 1, bias=False),
                                  tnn.GroupNorm(4, o),
                                  tnn.LeakyReLU(negative_slope=0.2))
        self.layer1 = gn_block(256, 256)
        self.layer2 = gn_block(512, 512)
        self.layer3 = gn_block(1024, 512)
        self.layer4 = gn_block(1024, 1024)
        self.layer5 = tnn.Sequential(tnn.Conv1d(2304, out_ch, 1, bias=False),
                                     tnn.GroupNorm(4, out_ch),
                                     tnn.LeakyReLU(negative_slope=0.2))

    @staticmethod
    def graph_feature(coor, x, k=4):
        # coor: B 3 N, x: B C N
        B, C, N = x.shape
        d = torch.cdist(coor.transpose(1, 2), coor.transpose(1, 2)) ** 2
        idx = d.topk(k, dim=-1, largest=False).indices  # B N k
        idx_base = torch.arange(B).view(-1, 1, 1) * N
        flat = (idx + idx_base).view(-1)
        feat = x.transpose(2, 1).reshape(B * N, C)[flat].view(B, N, k, C)
        feat = feat.permute(0, 3, 1, 2)  # B C N k
        xq = x.unsqueeze(-1).expand(-1, -1, -1, k)
        return torch.cat([feat - xq, xq], dim=1)  # B 2C N k

    def forward(self, f, coor):
        # f: B G C, coor: B G 3
        coor = coor.transpose(1, 2)
        f = f.transpose(1, 2)
        f = self.input_trans(f)
        feats = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            g = self.graph_feature(coor, f)
            g = layer(g)
            f = g.max(dim=-1).values
            feats.append(f)
        f = torch.cat(feats, dim=1)
        return self.layer5(f).transpose(1, 2)


class TestDGCNNEquivalence:
    def test_dgcnn_matches_torch(self, rng):
        tmodel = TorchDGCNN(16, 24).eval()
        sd = {f"dg.{k}": to_np(v) for k, v in tmodel.state_dict().items()}
        params, _ = tc.convert_state_dict(sd, tc.dgcnn_rules("dg", "dg"))
        f = rng.normal(size=(2, 12, 16)).astype(np.float32)
        coor = rng.normal(size=(2, 12, 3)).astype(np.float32)
        with torch.no_grad():
            expect = to_np(tmodel(torch.from_numpy(f), torch.from_numpy(coor)))
        got = np.asarray(DGCNN(24).apply({"params": params["dg"]},
                                         jnp.asarray(f), jnp.asarray(coor)))
        np.testing.assert_allclose(got, expect, atol=5e-4)


class TorchFolding(tnn.Module):
    """FoldingNet decoder recipe (reference Decoder, models/dvae.py:217-275)."""

    def __init__(self, C, num_fine):
        super().__init__()
        self.num_fine = num_fine
        self.grid_size = 2
        self.num_coarse = num_fine // 4
        self.mlp = tnn.Sequential(tnn.Linear(C, 1024), tnn.ReLU(),
                                  tnn.Linear(1024, 1024), tnn.ReLU(),
                                  tnn.Linear(1024, 3 * self.num_coarse))
        self.final_conv = tnn.Sequential(
            tnn.Conv1d(C + 3 + 2, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, 3, 1))
        a = torch.linspace(-0.05, 0.05, 2).view(1, 2).expand(2, 2).reshape(1, -1)
        b = torch.linspace(-0.05, 0.05, 2).view(2, 1).expand(2, 2).reshape(1, -1)
        self.folding_seed = torch.cat([a, b], dim=0).view(1, 2, 4)

    def forward(self, fg):
        bs, g, c = fg.shape
        fg = fg.reshape(bs * g, c)
        coarse = self.mlp(fg).reshape(bs * g, self.num_coarse, 3)
        point_feat = coarse.unsqueeze(2).expand(-1, -1, 4, -1)
        point_feat = point_feat.reshape(bs * g, self.num_fine, 3).transpose(2, 1)
        seed = self.folding_seed.unsqueeze(2).expand(bs * g, -1, self.num_coarse, -1)
        seed = seed.reshape(bs * g, -1, self.num_fine)
        fge = fg.unsqueeze(2).expand(-1, -1, self.num_fine)
        feat = torch.cat([fge, seed, point_feat], dim=1)
        center = point_feat
        fine = self.final_conv(feat) + center
        fine = fine.reshape(bs, g, 3, self.num_fine).transpose(-1, -2)
        coarse = coarse.reshape(bs, g, self.num_coarse, 3)
        return coarse, fine


class TestFoldingEquivalence:
    def test_folding_matches_torch(self, rng):
        C, M = 24, 8
        tmodel = TorchFolding(C, M).eval()
        sd = {f"decoder.{k}": to_np(v) for k, v in tmodel.state_dict().items()}
        params, batch_stats = tc.convert_state_dict(
            sd, tc.folding_decoder_rules("decoder", "decoder"))
        fg = rng.normal(size=(2, 4, C)).astype(np.float32)
        with torch.no_grad():
            e_coarse, e_fine = tmodel(torch.from_numpy(fg))
        g_coarse, g_fine = FoldingDecoder(M).apply(
            {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
            jnp.asarray(fg), train=False)
        np.testing.assert_allclose(np.asarray(g_coarse), to_np(e_coarse),
                                   atol=5e-4)
        # seed/point_feat interleaving must match exactly:
        # torch repeats each coarse point 4x contiguously; ours uses jnp.repeat
        np.testing.assert_allclose(np.asarray(g_fine), to_np(e_fine), atol=5e-4)


class TestTeacherRules:
    def test_teacher_key_coverage(self, rng):
        """Every expected flax teacher param receives a tensor from a synthetic
        torch state dict shaped like the reference's (prefix dvae_tokenizer)."""
        D, P, depth, T = 48, 4, 2, 24
        teacher = PromptedTeacher(embed_dim=D, depth=depth, num_heads=4,
                                  tokens_dims=T, num_prompt_token=P)
        key = jax.random.PRNGKey(0)
        variables = teacher.init({"params": key, "dropout": key},
                                 jnp.zeros((1, 6, T)), jnp.zeros((1, 6, 3)))
        flat_expected = flatten_keys(jax.tree_util.tree_map(
            np.asarray, variables["params"]))

        sd = {}
        sd["proj_pre.weight"] = np.zeros((D, T), np.float32)
        sd["proj_pre.bias"] = np.zeros(D, np.float32)
        sd["proj_post.weight"] = np.zeros((T, D), np.float32)
        sd["proj_post.bias"] = np.zeros(T, np.float32)
        sd["visual_pos_embed.0.weight"] = np.zeros((128, 3), np.float32)
        sd["visual_pos_embed.0.bias"] = np.zeros(128, np.float32)
        sd["visual_pos_embed.2.weight"] = np.zeros((D, 128), np.float32)
        sd["visual_pos_embed.2.bias"] = np.zeros(D, np.float32)
        sd["visual_prompt_token"] = np.zeros((1, P, D), np.float32)
        sd["visual_prompt_pos"] = np.zeros((1, P, D), np.float32)
        sd["deep_prompt_tokens"] = np.zeros((depth - 1, P, D), np.float32)
        sd["deep_prompt_pos"] = np.zeros((depth - 1, P, D), np.float32)
        sd["visual_embed.1.weight"] = np.zeros(D, np.float32)
        sd["visual_embed.1.bias"] = np.zeros(D, np.float32)
        for i in range(depth):
            b = f"visual_embed.0.{i}"
            sd[f"{b}.norm1.weight"] = np.zeros(D, np.float32)
            sd[f"{b}.norm1.bias"] = np.zeros(D, np.float32)
            sd[f"{b}.norm2.weight"] = np.zeros(D, np.float32)
            sd[f"{b}.norm2.bias"] = np.zeros(D, np.float32)
            sd[f"{b}.attn.qkv.weight"] = np.zeros((3 * D, D), np.float32)
            sd[f"{b}.attn.qkv.bias"] = np.zeros(3 * D, np.float32)
            sd[f"{b}.attn.proj.weight"] = np.zeros((D, D), np.float32)
            sd[f"{b}.attn.proj.bias"] = np.zeros(D, np.float32)
            sd[f"{b}.mlp.fc1.weight"] = np.zeros((4 * D, D), np.float32)
            sd[f"{b}.mlp.fc1.bias"] = np.zeros(4 * D, np.float32)
            sd[f"{b}.mlp.fc2.weight"] = np.zeros((D, 4 * D), np.float32)
            sd[f"{b}.mlp.fc2.bias"] = np.zeros(D, np.float32)

        params, _ = tc.convert_state_dict(sd, tc.teacher_rules("", "teacher"))
        flat_got = flatten_keys(params["teacher"])
        missing = set(flat_expected) - set(flat_got)
        assert not missing, f"converter misses teacher params: {sorted(missing)}"
