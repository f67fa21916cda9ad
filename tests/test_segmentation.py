"""Segmentation model + metrics tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from act_tpu.utils.config import ConfigDict
from act_tpu.models import MODELS
from act_tpu.models.segmentation import nll_seg_loss
from act_tpu.engine.runner_segmentation import (part_iou_per_shape,
                                                evaluate_semseg)
from act_tpu.datasets.segmentation_datasets import (
    PartNormalDataset, S3DISDataset, WholeSceneDataset, SEG_CLASSES)

RNGS = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
            droppath=jax.random.PRNGKey(2))


class TestSegModels:
    def test_partseg_forward_and_grad(self, rng):
        cfg = ConfigDict(dict(NAME="PartSegTransformer", cls_dim=50,
                              num_group=16, group_size=8))
        model = MODELS.build(cfg)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        lab = jnp.eye(16)[jnp.asarray([0, 3])]
        variables = model.init(RNGS, pts, lab)
        out = model.apply(variables, pts, lab)
        assert out.shape == (2, 128, 50)
        # log-softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0,
                                   atol=1e-4)
        seg = jnp.zeros((2, 128), jnp.int32)

        def loss_fn(p):
            lp, nv = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                pts, lab, train=True, rngs=RNGS, mutable=["batch_stats"])
            return nll_seg_loss(lp, seg)
        g = jax.grad(loss_fn)(variables["params"])
        gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gsum) and gsum > 0

    def test_semseg_forward(self, rng):
        cfg = ConfigDict(dict(NAME="SemSegTransformer", cls_dim=13,
                              num_group=16, group_size=8))
        model = MODELS.build(cfg)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        variables = model.init(RNGS, pts)
        out = model.apply(variables, pts)
        assert out.shape == (2, 128, 13)

    def test_weighted_nll(self):
        lp = jnp.log(jnp.full((1, 4, 3), 1 / 3))
        tgt = jnp.asarray([[0, 1, 2, 0]])
        w = jnp.asarray([1.0, 2.0, 3.0])
        unweighted = nll_seg_loss(lp, tgt)
        weighted = nll_seg_loss(lp, tgt, w)
        np.testing.assert_allclose(float(unweighted), float(np.log(3)),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(weighted), float(np.log(3)), rtol=1e-5)


class TestIoUProtocol:
    def test_absent_part_is_one(self):
        # Airplane parts are [0,1,2,3]; only labels 0/1 present & predicted
        pred = np.array([0, 0, 1, 1])
        gt = np.array([0, 0, 1, 1])
        ious = part_iou_per_shape(pred, gt, "Airplane")
        assert ious == [1.0, 1.0, 1.0, 1.0]

    def test_partial_overlap(self):
        pred = np.array([0, 0, 1, 1])
        gt = np.array([0, 1, 1, 1])
        ious = part_iou_per_shape(pred, gt, "Airplane")
        assert abs(ious[0] - 0.5) < 1e-9           # 1 inter / 2 union
        assert abs(ious[1] - 2 / 3) < 1e-9
        assert ious[2] == 1.0 and ious[3] == 1.0   # absent both sides


class TestSegDatasets:
    def test_partnormal_synthetic(self):
        ds = PartNormalDataset("/nope", npoints=128, split="trainval")
        pts, cls, seg = ds[0]
        assert pts.shape == (128, 3)
        cat = sorted(SEG_CLASSES)[cls]
        assert set(np.unique(seg)).issubset(set(SEG_CLASSES[cat]))

    def test_s3dis_synthetic(self):
        ds = S3DISDataset("train", "/nope", num_point=128)
        pts, seg = ds[0]
        assert pts.shape == (128, 3)
        assert seg.min() >= 0 and seg.max() < 13

    def test_whole_scene_blocks_cover_points(self):
        ds = WholeSceneDataset("/nope", num_point=64)
        covered = np.zeros(len(ds.semantic_labels[0]), bool)
        for block, labels, sel in ds.blocks_for_scene(0):
            assert block.shape == (64, 3)
            covered[sel] = True
        assert covered.mean() > 0.95  # sliding window covers the scene
