"""Golden-value regression tests: fixed seeds -> fixed outputs (CPU).

Guards future rounds against silent semantic drift in the kernels, grouping,
Gumbel sampling and transformer blocks. Values recorded on the CPU backend at
round 1 (2026-08-16). If a deliberate change breaks one, update the golden with
the change that justifies it.
"""
import numpy as np
import jax
import jax.numpy as jnp

from act_tpu import ops
from act_tpu.models.common import Block, gumbel_softmax


def fixed_cloud():
    return jnp.asarray(np.random.default_rng(7).normal(size=(1, 64, 3)),
                       jnp.float32)


class TestGolden:
    def test_fps_indices(self):
        idx = ops.furthest_point_sample(fixed_cloud(), 8)
        np.testing.assert_array_equal(np.asarray(idx)[0],
                                      [0, 6, 52, 8, 54, 42, 16, 34])

    def test_group_sums(self):
        nbr, center = ops.group_points(fixed_cloud(), 8, 4)
        np.testing.assert_allclose(float(center.sum()), -7.669997, atol=1e-3)
        np.testing.assert_allclose(float(jnp.abs(nbr).sum()), 38.760719,
                                   atol=1e-3)

    def test_gumbel_ids(self):
        logits = jnp.asarray(np.random.default_rng(8).normal(size=(1, 4, 16)),
                             jnp.float32)
        y = gumbel_softmax(jax.random.PRNGKey(5), logits, tau=1.0, hard=True)
        np.testing.assert_array_equal(np.asarray(jnp.argmax(y, -1))[0],
                                      [12, 4, 4, 10])

    def test_block_forward(self):
        blk = Block(num_heads=2)
        x = jnp.asarray(np.random.default_rng(9).normal(size=(1, 5, 8)),
                        jnp.float32)
        v = blk.init(jax.random.PRNGKey(3), x, True)
        out = blk.apply(v, x, True)
        np.testing.assert_allclose(float(out.sum()), -5.817669, atol=1e-3)
        np.testing.assert_allclose(float(out[0, 0, 0]), 1.663347, atol=1e-3)

    def test_chamfer_identity_permutation(self):
        pts = fixed_cloud()
        d1, d2 = ops.chamfer_distances(pts, pts[:, ::-1])
        assert float(d1.sum()) < 1e-4  # permuted cloud: same point set
