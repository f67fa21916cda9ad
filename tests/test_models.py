"""Model-family tests: init, forward shapes, losses, grads on tiny configs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from act_tpu.utils.config import ConfigDict
from act_tpu.models import (MODELS, DiscreteVAE, ACTPromptedDiscreteVAEwithVIT,
                            ACT_PointDistillation, ACT_PointBERT,
                            PointTransformer, get_loss_acc, trainable_mask)
from act_tpu.models.act import random_mask, block_mask, split_by_mask
from act_tpu.models.common import gumbel_softmax


def tiny_dvae_cfg(**over):
    cfg = ConfigDict(dict(
        NAME="DiscreteVAE", group_size=8, num_group=16, encoder_dims=32,
        num_tokens=64, tokens_dims=32, decoder_dims=32,
        visual_embed_type="vit_tiny", visual_embed_dim=48, visual_embed_depth=2,
        visual_embed_heads=4, visual_embed_pos="after_dgcnn1",
        freeze_visual_embed=True, num_prompt_token=4, use_deep_prompt=True,
    ))
    cfg.update(over)
    return cfg


def tiny_pretrain_cfg(**over):
    cfg = ConfigDict(dict(
        NAME="ACT_PointDistillation", loss="cosine",
        transformer_config=dict(
            mask_ratio=0.5, mask_type="rand", proj="linear", embed_dim=32,
            encoder_dims=32, depth=2, drop_path_rate=0.1, cls_dim=16,
            replace_pob=0.0, num_heads=4, decoder_depth=1, decoder_num_heads=4,
            return_all_tokens=False, cls_loss=False, register_shallow_hook=1,
        ),
        dvae_config=tiny_dvae_cfg(),
    ))
    cfg.update(over)
    return cfg


def make_points(rng, b=2, n=128):
    return jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))


RNGS = dict(params=jax.random.PRNGKey(0), gumbel=jax.random.PRNGKey(1),
            mask=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3),
            droppath=jax.random.PRNGKey(4))


class TestMasking:
    def test_random_mask_fixed_count(self):
        m = random_mask(jax.random.PRNGKey(0), 4, 16, 12)
        assert m.shape == (4, 16)
        np.testing.assert_array_equal(np.asarray(m.sum(-1)), 12)

    def test_block_mask_contiguous(self):
        center = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 3)),
                             dtype=jnp.float32)
        m = block_mask(jax.random.PRNGKey(0), center, 12)
        np.testing.assert_array_equal(np.asarray(m.sum(-1)), 12)

    def test_split_by_mask_preserves_order(self):
        mask = jnp.asarray([[False, True, False, True]])
        vis, msk = split_by_mask(mask, 2)
        np.testing.assert_array_equal(np.asarray(vis), [[0, 2]])
        np.testing.assert_array_equal(np.asarray(msk), [[1, 3]])

    def test_gumbel_hard_one_hot(self):
        logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 8)),
                             dtype=jnp.float32)
        y = gumbel_softmax(jax.random.PRNGKey(0), logits, tau=0.5, hard=True)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)
        assert ((np.asarray(y) == 0) | np.isclose(np.asarray(y), 1)).all()

    def test_gumbel_hard_grad_flows(self):
        logits = jnp.ones((1, 3, 8))
        g = jax.grad(lambda l: jnp.sum(
            gumbel_softmax(jax.random.PRNGKey(0), l, 1.0, True) ** 2))(logits)
        assert np.abs(np.asarray(g)).sum() > 0


class TestDVAE:
    def test_forward_and_loss(self, rng):
        pts = make_points(rng)
        model = DiscreteVAE(tiny_dvae_cfg())
        variables = model.init(RNGS, pts, 1.0, False)
        ret = model.apply(variables, pts, 1.0, False, rngs=RNGS)
        whole_coarse, whole_fine, coarse, fine, nbr, logits = ret
        assert coarse.shape == (2, 16, 2, 3)
        assert fine.shape == (2, 16, 8, 3)
        assert logits.shape == (2, 16, 64)
        assert whole_fine.shape == (2, 128, 3)
        rec, kld = model.apply(variables, ret, pts, method=model.get_loss)
        assert np.isfinite(float(rec)) and np.isfinite(float(kld))
        assert float(kld) >= 0

    def test_train_grad(self, rng):
        pts = make_points(rng)
        model = DiscreteVAE(tiny_dvae_cfg())
        variables = model.init(RNGS, pts, 1.0, False)
        params = variables["params"]

        def loss_fn(p):
            ret, new_state = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                pts, 1.0, False, train=True, rngs=RNGS,
                mutable=["batch_stats"])
            rec, kld = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                ret, pts, method=model.get_loss)
            return rec + 0.1 * kld

        g = jax.grad(loss_fn)(params)
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_prompted_vit_tokenizer_features(self, rng):
        pts = make_points(rng)
        cfg = tiny_dvae_cfg(NAME="ACTPromptedDiscreteVAEwithVIT")
        model = ACTPromptedDiscreteVAEwithVIT(cfg)
        variables = model.init(RNGS, pts, 1.0, False)
        from act_tpu import ops
        nbr, center = ops.group_points(pts, 16, 8)
        feats = model.apply(variables, nbr, center, rngs=RNGS,
                            method=model.forward_tokenizer_features)
        assert feats.shape == (2, 16, 32)
        ids = model.apply(variables, nbr, center, method=model.forward_tokenizer)
        assert ids.shape == (2, 16) and ids.dtype == jnp.int32

    def test_registry_builds_all_dvae(self):
        for name in ("DiscreteVAE", "ACTPromptedDiscreteVAEwithVIT",
                     "ACTPromptedDiscreteVAEwithBERT"):
            m = MODELS.build(tiny_dvae_cfg(NAME=name))
            assert m is not None


class TestACTPretrain:
    def test_distillation_loss_and_grad(self, rng):
        pts = make_points(rng)
        model = ACT_PointDistillation(tiny_pretrain_cfg())
        variables = model.init(RNGS, pts)
        loss = model.apply(variables, pts, rngs=RNGS,
                           mutable=["batch_stats"])[0]
        assert np.isfinite(float(loss))

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                pts, rngs=RNGS, mutable=["batch_stats"])
            return out
        g = jax.grad(loss_fn)(variables["params"])
        # student gets gradient, frozen tokenizer gets zero gradient
        stu = sum(float(jnp.abs(x).sum()) for x in
                  jax.tree_util.tree_leaves(g["ACT_encoder"]))
        tok = sum(float(jnp.abs(x).sum()) for x in
                  jax.tree_util.tree_leaves(g["dvae_tokenizer"]))
        assert stu > 0
        assert tok == 0.0

    @pytest.mark.parametrize("loss_type", ["l2", "smoothl1", "ntxent", "barlow"])
    def test_other_losses(self, rng, loss_type):
        pts = make_points(rng)
        model = ACT_PointDistillation(tiny_pretrain_cfg(loss=loss_type))
        variables = model.init(RNGS, pts)
        loss = model.apply(variables, pts, rngs=RNGS, mutable=["batch_stats"])[0]
        assert np.isfinite(float(loss))

    def test_cls_loss_path(self, rng):
        pts = make_points(rng)
        cfg = tiny_pretrain_cfg()
        cfg.transformer_config.cls_loss = True
        model = ACT_PointDistillation(cfg)
        variables = model.init(RNGS, pts)
        loss = model.apply(variables, pts, rngs=RNGS, mutable=["batch_stats"])[0]
        assert np.isfinite(float(loss))

    def test_mask_ratio_zero_no_decoder(self, rng):
        """mask_ratio=0 distills visible(=all) tokens without a decoder
        (reference models/act.py:1180-1182,1238-1241)."""
        pts = make_points(rng)
        cfg = tiny_pretrain_cfg()
        cfg.transformer_config.mask_ratio = 0.0
        model = ACT_PointDistillation(cfg)
        variables = model.init(RNGS, pts)
        assert "ACT_decoder" not in variables["params"]
        assert "mask_token" not in variables["params"]
        loss = model.apply(variables, pts, rngs=RNGS, mutable=["batch_stats"])[0]
        assert np.isfinite(float(loss))

    def test_forward_eval(self, rng):
        pts = make_points(rng)
        model = ACT_PointDistillation(tiny_pretrain_cfg())
        variables = model.init(RNGS, pts)
        feat = model.apply(variables, pts, noaug=True, rngs=RNGS)
        assert feat.shape == (2, 16)  # cls_dim


class TestPointBERT:
    def cfg(self):
        c = tiny_pretrain_cfg(NAME="ACT_PointBERT", m=0.999, T=0.07, K=8)
        c.transformer_config.mask_ratio = [0.25, 0.45]
        c.transformer_config.moco_loss = False
        c.transformer_config.dvae_loss = True
        c.transformer_config.cutmix_loss = True
        c.transformer_config.return_all_tokens = False
        return c

    def test_losses_and_queue_update(self, rng):
        pts = make_points(rng)
        model = ACT_PointBERT(self.cfg())
        variables = model.init(RNGS, pts)
        (moco, dvae, cutmix), new_vars = model.apply(
            variables, pts, rngs=RNGS, mutable=["buffers", "batch_stats"])
        assert float(moco) == 0.0
        assert np.isfinite(float(dvae)) and np.isfinite(float(cutmix))
        assert int(new_vars["buffers"]["queue_ptr"]) == 2  # advanced by batch


class TestPointTransformer:
    def cfg(self, transfer="full"):
        return ConfigDict(dict(
            NAME="PointTransformer", embed_dim=32, depth=2, drop_path_rate=0.1,
            cls_dim=10, num_heads=4, group_size=8, num_group=16,
            encoder_dims=32, transfer_type=transfer))

    @pytest.mark.parametrize("transfer", ["full", "linear", "mlp-3", "side",
                                          "bit-fit"])
    def test_forward_and_mask(self, rng, transfer):
        pts = make_points(rng)
        model = PointTransformer(self.cfg(transfer))
        variables = model.init(RNGS, pts)
        logits = model.apply(variables, pts, rngs=RNGS)
        assert logits.shape == (2, 10)
        loss, acc = get_loss_acc(logits, jnp.asarray([1, 2]))
        assert np.isfinite(float(loss)) and 0 <= float(acc) <= 100
        mask = trainable_mask(variables["params"], transfer)
        n_train = sum(bool(x) for x in jax.tree_util.tree_leaves(mask))
        n_total = len(jax.tree_util.tree_leaves(mask))
        if transfer == "full":
            assert n_train == n_total
        else:
            assert 0 < n_train < n_total

    def test_extract_feature(self, rng):
        pts = make_points(rng)
        model = PointTransformer(self.cfg())
        variables = model.init(RNGS, pts)
        f = model.apply(variables, pts, method=model.extract_feature)
        assert f.shape == (2, 64)  # 2 * embed_dim

    def test_bf16_policy(self, rng):
        """config dtype=bf16: params stay f32, logits track the f32 model
        (same compute policy as the pretrain graphs; finetune configs ship
        with it since the all-f32 blocks profiled at the f32 MXU ceiling)."""
        pts = make_points(rng)
        cfg16 = self.cfg()
        cfg16.dtype = "bf16"
        m32, m16 = PointTransformer(self.cfg()), PointTransformer(cfg16)
        variables = m32.init(RNGS, pts)
        for leaf in jax.tree_util.tree_leaves(m16.init(RNGS, pts)["params"]):
            assert leaf.dtype == jnp.float32
        l32 = m32.apply(variables, pts, rngs=RNGS)
        l16 = m16.apply(variables, pts, rngs=RNGS)
        assert l16.dtype == jnp.float32  # head/losses stay f32
        np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                                   atol=0.15)


class TestBertTeacher:
    def test_bert_dvae_forward(self, rng):
        pts = make_points(rng)
        cfg = tiny_dvae_cfg(NAME="ACTPromptedDiscreteVAEwithBERT")
        from act_tpu.models import ACTPromptedDiscreteVAEwithBERT
        model = ACTPromptedDiscreteVAEwithBERT(cfg)
        variables = model.init(RNGS, pts, 1.0, False)
        ret = model.apply(variables, pts, 1.0, False, rngs=RNGS)
        assert ret[3].shape == (2, 16, 8, 3)  # fine
        # post-LN blocks: teacher params exist with norm1/norm2 inside blocks
        teach = variables["params"]["visual_embed"]
        assert "blocks_0" in teach and "norm1" in teach["blocks_0"]
        assert "norm" not in teach  # no final LN in the bert arch

    def test_shallow_prompt_variant(self, rng):
        pts = make_points(rng)
        cfg = tiny_dvae_cfg(NAME="ACTPromptedDiscreteVAEwithVIT",
                            use_deep_prompt=False)
        from act_tpu.models import ACTPromptedDiscreteVAEwithVIT
        model = ACTPromptedDiscreteVAEwithVIT(cfg)
        variables = model.init(RNGS, pts, 1.0, False)
        assert "deep_prompt_tokens" not in variables["params"]["visual_embed"]
        ret = model.apply(variables, pts, 1.0, False, rngs=RNGS)
        assert np.isfinite(np.asarray(ret[3])).all()

    def test_no_prompt_variant(self, rng):
        pts = make_points(rng)
        cfg = tiny_dvae_cfg(NAME="ACTPromptedDiscreteVAEwithVIT",
                            num_prompt_token=0)
        from act_tpu.models import ACTPromptedDiscreteVAEwithVIT
        model = ACTPromptedDiscreteVAEwithVIT(cfg)
        variables = model.init(RNGS, pts, 1.0, False)
        assert "visual_prompt_token" not in variables["params"]["visual_embed"]
        ret = model.apply(variables, pts, 1.0, False, rngs=RNGS)
        assert np.isfinite(np.asarray(ret[3])).all()


class TestRandomReplace:
    def test_replace_pob_corrupts_and_extends_mask(self, rng):
        pts = make_points(rng)
        cfg = tiny_pretrain_cfg(NAME="ACT_PointBERT", m=0.999, T=0.07, K=8)
        cfg.transformer_config.mask_ratio = [0.3, 0.3]
        cfg.transformer_config.replace_pob = 0.5
        cfg.transformer_config.moco_loss = False
        cfg.transformer_config.dvae_loss = True
        cfg.transformer_config.cutmix_loss = False
        cfg.transformer_config.return_all_tokens = False
        model = ACT_PointBERT(cfg)
        variables = model.init(RNGS, pts)
        (moco, dvae, cutmix), _ = model.apply(
            variables, pts, rngs=RNGS, mutable=["buffers", "batch_stats"])
        assert np.isfinite(float(dvae))

    def test_mask_transformer_overall_mask_superset(self, rng):
        from act_tpu.models.act import MaskTransformer
        cfg = tiny_pretrain_cfg()
        cfg.transformer_config.mask_ratio = [0.3, 0.3]
        cfg.transformer_config.replace_pob = 0.9
        m = MaskTransformer(cfg)
        pts = make_points(rng)
        from act_tpu import ops
        nbr, center = ops.group_points(pts, 16, 8)
        variables = m.init(RNGS, nbr, center)
        _, logits, overall = m.apply(variables, nbr, center, train=True,
                                     rngs=RNGS, mutable=["batch_stats"])[0]
        # overall mask should (almost surely) exceed the ~30% base mask
        assert float(overall.mean()) > 0.35


class TestMaskDistributionEquivalence:
    """The rebuild uses Bernoulli(ratio) masking where the reference's
    MaskTransformer masks exactly int(ratio*G) positions per row with a
    shared per-batch ratio ~ U[lo, hi] (models/act.py:641-654). These tests
    pin the training-level equivalence claim: equal expected mask counts and
    uniform per-position marginals for both schemes."""

    def _reference_mask(self, rng, B, G, lo, hi):
        ratio = rng.uniform(lo, hi)
        n = int(ratio * G)
        m = np.zeros((B, G), bool)
        for b in range(B):
            m[b, rng.permutation(G)[:n]] = True
        return m

    def test_mean_count_and_marginals_match(self):
        B, G, lo, hi = 8, 32, 0.25, 0.45
        reps = 400
        from act_tpu.models.act import bernoulli_ratio_mask
        ours = np.zeros((B, G))
        key = jax.random.PRNGKey(0)
        for r in range(reps):
            key, k = jax.random.split(key)
            ours += np.asarray(bernoulli_ratio_mask(k, B, G, lo, hi))
        ours /= reps

        rng = np.random.default_rng(0)
        ref = np.zeros((B, G))
        for r in range(reps):
            ref += self._reference_mask(rng, B, G, lo, hi)
        ref /= reps

        expected = (lo + hi) / 2
        # mean masked fraction matches E[ratio] for both schemes
        assert abs(ours.mean() - expected) < 0.02, ours.mean()
        # reference's int() floor biases it slightly low — same ballpark
        assert abs(ref.mean() - expected) < 0.03, ref.mean()
        # per-position marginals are uniform in both
        assert np.abs(ours - ours.mean()).max() < 0.1
        assert np.abs(ref - ref.mean()).max() < 0.1


class TestVisibleOnlyEmbedding:
    """MaskTransformer embeds only the visible groups (reference act.py:700-707
    embeds all G then boolean-indexes). Per-group math is identical — the only
    train-mode deviation is BatchNorm batch statistics estimated over the
    visible (uniformly random) subset of groups. These tests pin both claims."""

    def _setup(self, rng, B=4, G=32, M=16):
        from act_tpu.models.common import GroupEncoder
        nbr = jnp.asarray(rng.normal(size=(B, G, M, 3)).astype(np.float32))
        ge = GroupEncoder(32)
        variables = ge.init(jax.random.PRNGKey(0), nbr)
        vis_idx = jnp.argsort(jnp.asarray(
            rng.random((B, G)).astype(np.float32)), axis=-1)[:, :G // 2]
        vis_nbr = jnp.take_along_axis(nbr, vis_idx[:, :, None, None], axis=1)
        return ge, variables, nbr, vis_idx, vis_nbr

    def test_eval_mode_exact(self, rng):
        ge, variables, nbr, vis_idx, vis_nbr = self._setup(rng)
        full = ge.apply(variables, nbr)  # (B, G, C), running stats
        gathered = jnp.take_along_axis(full, vis_idx[:, :, None], axis=1)
        direct = ge.apply(variables, vis_nbr)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(gathered))

    def test_train_mode_subset_stats_close(self, rng):
        ge, variables, nbr, vis_idx, vis_nbr = self._setup(rng, B=8, G=32, M=16)
        full, st_f = ge.apply(variables, nbr, train=True,
                              mutable=["batch_stats"])
        gathered = np.asarray(
            jnp.take_along_axis(full, vis_idx[:, :, None], axis=1))
        direct, st_v = ge.apply(variables, vis_nbr, train=True,
                                mutable=["batch_stats"])
        # outputs differ only through the subset-estimated BN stats
        scale = np.abs(gathered).mean()
        assert np.abs(np.asarray(direct) - gathered).mean() < 0.05 * scale
        # the subset batch stats are an unbiased estimate of the full ones
        for k in ("bn1", "bn2"):
            mf = np.asarray(st_f["batch_stats"][k]["mean"])
            mv = np.asarray(st_v["batch_stats"][k]["mean"])
            vf = np.asarray(st_f["batch_stats"][k]["var"])
            vv = np.asarray(st_v["batch_stats"][k]["var"])
            # mean shifts measured in units of the feature std (the scale BN
            # actually normalizes by); variances relatively
            assert (np.abs(mv - mf) / np.sqrt(vf + 1e-5)).mean() < 0.1
            assert np.abs(vv - vf).mean() < 0.15 * (np.abs(vf).mean() + 1e-3)

    def test_distillation_forward_unchanged_shapes(self, rng):
        pts = make_points(rng)
        model = ACT_PointDistillation(tiny_pretrain_cfg())
        variables = model.init(RNGS, pts)
        loss = model.apply(variables, pts, train=True, rngs=RNGS,
                           mutable=["batch_stats"])[0]
        assert np.isfinite(float(loss[0] if isinstance(loss, tuple) else loss))

    def test_block_mask_embeds_all_groups(self, rng):
        """'block' masking picks a spatially anti-correlated visible subset,
        so the student embeds ALL groups there (ADVICE r2): train-mode BN
        batch stats must equal a full-neighborhood GroupEncoder pass."""
        from act_tpu.models.act import VisableOnlyMaskTransformer
        from act_tpu.models.common import GroupEncoder
        cfg = ConfigDict(dict(
            transformer_config=dict(mask_ratio=0.5, mask_type="block",
                                    embed_dim=32, depth=1, num_heads=4,
                                    cls_dim=16, drop_path_rate=0.0),
            dvae_config=dict(encoder_dims=32)))
        model = VisableOnlyMaskTransformer(cfg)
        nbr = jnp.asarray(rng.normal(size=(4, 32, 16, 3)).astype(np.float32))
        center = jnp.asarray(rng.normal(size=(4, 32, 3)).astype(np.float32))
        k = jax.random.PRNGKey(0)
        rngs = dict(params=k, mask=jax.random.fold_in(k, 1),
                    dropout=jax.random.fold_in(k, 2),
                    droppath=jax.random.fold_in(k, 3))
        variables = model.init(rngs, nbr, center)
        _, newv = model.apply(variables, nbr, center, train=True, rngs=rngs,
                              mutable=["batch_stats"])
        ge = GroupEncoder(32)
        _, ge_new = ge.apply(
            {"params": variables["params"]["encoder"],
             "batch_stats": variables["batch_stats"]["encoder"]},
            nbr, train=True, mutable=["batch_stats"])
        for kk in ("bn1", "bn2"):
            for stat in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(newv["batch_stats"]["encoder"][kk][stat]),
                    np.asarray(ge_new["batch_stats"][kk][stat]),
                    rtol=1e-5, atol=1e-6)


class TestFastUniform:
    """fast_uniform (hardware rbg PRNG) must be a well-behaved U(minval, 1):
    the gumbel sampling paths (dvae.forward_tokenizer_features/__call__) rely
    on it being in-range (log(-log(u)) finite), deterministic per key, and
    distributionally uniform."""

    def test_range_determinism_moments(self):
        from act_tpu.models.common import fast_uniform
        u = np.asarray(fast_uniform(jax.random.PRNGKey(3), (64, 4096)))
        assert u.min() > 0.0 and u.max() < 1.0
        assert np.isfinite(-np.log(-np.log(u))).all()
        u2 = np.asarray(fast_uniform(jax.random.PRNGKey(3), (64, 4096)))
        np.testing.assert_array_equal(u, u2)
        u3 = np.asarray(fast_uniform(jax.random.PRNGKey(4), (64, 4096)))
        assert np.abs(u - u3).max() > 1e-3  # different key -> different stream
        # moments of U(0,1): mean 1/2, var 1/12 (n=262144: generous 5-sigma)
        assert abs(u.mean() - 0.5) < 0.005, u.mean()
        assert abs(u.var() - 1.0 / 12.0) < 0.003, u.var()
        # uniformity across deciles
        hist, _ = np.histogram(u, bins=10, range=(0, 1))
        assert np.abs(hist / u.size - 0.1).max() < 0.01


class TestFpsSubsampleDistribution:
    """ops.fps_subsample draws a per-item random subset where the reference
    shares one subset across the batch (runner_finetune.py:155-157). The
    per-sample marginal is identical: every FPS point kept with probability
    n_out/n_fps, uniformly."""

    def test_capped_full_n_is_random_permutation_subset(self):
        """n_fps >= N (reference's point_all cap): output must be a random
        n_out-subset of the input points, shuffled — FPS degenerates to a
        reordering there and is skipped."""
        from act_tpu import ops
        B, N, n_out = 3, 64, 48
        pts = np.random.default_rng(0).normal(size=(B, N, 3)).astype(np.float32)
        out = np.asarray(ops.fps_subsample(jnp.asarray(pts), 2400, n_out,
                                           jax.random.PRNGKey(0)))
        out2 = np.asarray(ops.fps_subsample(jnp.asarray(pts), 2400, n_out,
                                            jax.random.PRNGKey(1)))
        assert out.shape == (B, n_out, 3)
        assert np.abs(out - out2).max() > 1e-6  # key-dependent shuffle
        for b in range(B):
            # every output point is an input point, no duplicates
            d = np.linalg.norm(out[b][:, None] - pts[b][None], axis=-1)
            src = np.argmin(d, axis=1)
            assert np.min(d, axis=1).max() < 1e-6
            assert len(set(src.tolist())) == n_out

    def test_marginal_inclusion_uniform(self):
        from act_tpu import ops
        B, N, n_fps, n_out = 4, 256, 128, 64
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(B, N, 3)).astype(np.float32))
        fps_idx = np.asarray(ops.furthest_point_sample(pts, n_fps))
        fps_pts = np.asarray(ops.gather_points(pts, jnp.asarray(fps_idx)))

        reps = 300
        counts = np.zeros((B, n_fps))
        key = jax.random.PRNGKey(1)
        for r in range(reps):
            key, k = jax.random.split(key)
            sub = np.asarray(ops.fps_subsample(pts, n_fps, n_out, k))
            # match each selected point back to its FPS-set position
            for b in range(B):
                d = np.linalg.norm(sub[b][:, None, :] - fps_pts[b][None], axis=-1)
                counts[b, np.argmin(d, axis=1)] += 1
        marg = counts / reps
        expected = n_out / n_fps
        assert abs(marg.mean() - expected) < 0.01
        assert np.abs(marg - expected).max() < 0.15  # uniform, no hot spots


class TestScannedStacks:
    """TransformerEncoder/Decoder scan=True (one nn.scan-compiled block body,
    stacked params) must match the unrolled per-block layout exactly given
    restacked weights — the compile/runtime tradeoff is a layout choice, not
    a semantics change (models/common.py)."""

    def test_encoder_scan_matches_unrolled(self, rng):
        from act_tpu.models.common import TransformerEncoder
        B, V, C, D = 4, 14, 32, 4
        x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
        k = jax.random.PRNGKey(0)
        enc = TransformerEncoder(embed_dim=C, depth=D, num_heads=4,
                                 drop_path_rate=0.1, scan=True)
        v = enc.init(dict(params=k, dropout=k, droppath=k), x, pos)
        stacked = v["params"]["blocks"]
        assert stacked["attn"]["qkv"]["kernel"].shape[0] == D
        pu = {f"blocks_{i}": jax.tree_util.tree_map(lambda a: a[i], stacked)
              for i in range(D)}
        enc_u = TransformerEncoder(embed_dim=C, depth=D, num_heads=4,
                                   drop_path_rate=0.1, scan=False)
        o1, h1 = enc.apply({"params": v["params"]}, x, pos,
                           return_hidden=(2,))
        o2, h2 = enc_u.apply({"params": pu}, x, pos, return_hidden=(2,))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(h1[0]), np.asarray(h2[0]),
                                   atol=2e-5)

    def test_decoder_scan_matches_unrolled(self, rng):
        from act_tpu.models.common import TransformerDecoder
        B, V, C, D = 2, 10, 32, 3
        x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
        k = jax.random.PRNGKey(0)
        dec = TransformerDecoder(embed_dim=C, depth=D, num_heads=4, scan=True)
        v = dec.init(dict(params=k, dropout=k, droppath=k), x, pos, 4)
        pu = {f"blocks_{i}": jax.tree_util.tree_map(
            lambda a: a[i], v["params"]["blocks"]) for i in range(D)}
        pu["norm"] = v["params"]["norm"]
        dec_u = TransformerDecoder(embed_dim=C, depth=D, num_heads=4,
                                   scan=False)
        o1 = dec.apply({"params": v["params"]}, x, pos, 4)
        o2 = dec_u.apply({"params": pu}, x, pos, 4)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)

    def test_remat_unrolled_and_scanned(self, rng):
        """remat=True must work in BOTH stack layouts (regression: the
        unrolled path called the rematted block without the q_keep_from /
        drop_path_rate args that static_argnums=(2, 3) indexes)."""
        from act_tpu.models.common import TransformerEncoder
        B, V, C, D = 2, 6, 32, 2
        x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
        k = jax.random.PRNGKey(0)
        ref = TransformerEncoder(embed_dim=C, depth=D, num_heads=4, scan=False)
        v = ref.init(dict(params=k, dropout=k, droppath=k), x, pos)
        expect, _ = ref.apply({"params": v["params"]}, x, pos)
        for use_scan in (False, True):
            enc = TransformerEncoder(embed_dim=C, depth=D, num_heads=4,
                                     scan=use_scan, remat=True)
            params = v["params"]
            if use_scan:
                params = {"blocks": jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[v["params"][f"blocks_{i}"] for i in range(D)])}
            got, _ = jax.jit(lambda p: enc.apply({"params": p}, x, pos))(params)
            np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                       atol=2e-5)

    def test_env_default_off(self, monkeypatch):
        from act_tpu.models.common import scan_default
        monkeypatch.delenv("ACT_TPU_SCAN", raising=False)
        assert scan_default() is False
        monkeypatch.setenv("ACT_TPU_SCAN", "1")
        assert scan_default() is True
