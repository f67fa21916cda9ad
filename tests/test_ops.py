"""Kernel substrate tests: Pallas kernels (interpret mode) vs pure-XLA references,
and the references vs straightforward numpy implementations."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from act_tpu import ops
from act_tpu.ops import chamfer as chamfer_mod
from act_tpu.ops import fps as fps_mod
from act_tpu.ops import group as group_mod


def np_fps(points, n_samples):
    """O(N*S) numpy greedy FPS, start at index 0."""
    N = points.shape[0]
    idxs = np.zeros(n_samples, dtype=np.int64)
    dists = np.full(N, np.inf)
    last = points[0]
    for i in range(1, n_samples):
        d = ((points - last) ** 2).sum(-1)
        dists = np.minimum(dists, d)
        idxs[i] = int(np.argmax(dists))
        last = points[idxs[i]]
    return idxs


class TestReferenceOps:
    def test_square_distance(self, rng):
        a = rng.normal(size=(2, 5, 3)).astype(np.float32)
        b = rng.normal(size=(2, 7, 3)).astype(np.float32)
        d = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
        expect = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d, expect, atol=1e-4)

    def test_fps_ref_matches_numpy(self, rng):
        pts = rng.normal(size=(3, 256, 3)).astype(np.float32)
        got = np.asarray(ops.furthest_point_sample_ref(jnp.asarray(pts), 32))
        for b in range(3):
            np.testing.assert_array_equal(got[b], np_fps(pts[b], 32))

    def test_fps_covers_spread(self, rng):
        # FPS of 4 from two well-separated clusters must pick both clusters
        cluster1 = rng.normal(size=(64, 3)).astype(np.float32) * 0.01
        cluster2 = cluster1 + 10.0
        pts = np.concatenate([cluster1, cluster2])[None]
        idx = np.asarray(ops.furthest_point_sample_ref(jnp.asarray(pts), 4))[0]
        assert (idx < 64).any() and (idx >= 64).any()

    def test_knn_matches_numpy(self, rng):
        ref = rng.normal(size=(2, 64, 3)).astype(np.float32)
        q = rng.normal(size=(2, 16, 3)).astype(np.float32)
        d, idx = ops.knn(jnp.asarray(ref), jnp.asarray(q), 5)
        d, idx = np.asarray(d), np.asarray(idx)
        for b in range(2):
            full = ((q[b][:, None] - ref[b][None]) ** 2).sum(-1)
            expect_sorted = np.sort(full, axis=-1)[:, :5]
            np.testing.assert_allclose(np.sort(d[b], axis=-1), expect_sorted,
                                       atol=1e-4)
            # indices actually index the right distances
            np.testing.assert_allclose(
                np.take_along_axis(full, idx[b], axis=-1), d[b], atol=1e-4)

    def test_gather_points(self, rng):
        pts = rng.normal(size=(2, 10, 3)).astype(np.float32)
        idx = rng.integers(0, 10, size=(2, 4, 6))
        out = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(out[b], pts[b][idx[b]], atol=1e-6)

    def test_chamfer_ref_matches_numpy(self, rng):
        x = rng.normal(size=(2, 12, 3)).astype(np.float32)
        y = rng.normal(size=(2, 17, 3)).astype(np.float32)
        d1, d2, i1, i2 = ops.chamfer_ref(jnp.asarray(x), jnp.asarray(y))
        full = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d1), full.min(-1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), full.min(-2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), full.argmin(-1))
        np.testing.assert_array_equal(np.asarray(i2), full.argmin(-2))

    def test_three_nn_interpolate(self, rng):
        known = rng.normal(size=(1, 8, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 8, 4)).astype(np.float32)
        # query exactly at a known point -> (nearly) that point's features
        out = ops.three_nn_interpolate(jnp.asarray(known), jnp.asarray(known),
                                       jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(out), feats, atol=1e-3)

    def test_three_nn_interpolate_matmul_matches_ref(self, rng):
        """The dense-weight MXU formulation (ops/interpolate.py) reproduces
        the reference gather path (values AND gradients) — same weighted sum,
        reassociated over S."""
        unknown = rng.normal(size=(2, 137, 3)).astype(np.float32)
        known = rng.normal(size=(2, 24, 3)).astype(np.float32)
        feats = rng.normal(size=(2, 24, 16)).astype(np.float32)
        args = tuple(jnp.asarray(a) for a in (unknown, known, feats))
        got = ops.three_nn_interpolate(*args)
        want = ops.three_nn_interpolate_ref(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        # full gradient parity: grads flow through weights (distances ->
        # both xyz args) and through the features
        def loss(fn):
            return lambda u, kx, kf: (fn(u, kx, kf) ** 2).sum()
        g_new = jax.grad(loss(ops.three_nn_interpolate), argnums=(0, 1, 2))(*args)
        g_ref = jax.grad(loss(ops.three_nn_interpolate_ref),
                         argnums=(0, 1, 2))(*args)
        for a, b in zip(g_new, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_three_nn_interpolate_degenerate_cloud(self, rng):
        """All-identical known points (tied distances): both paths select the
        same tie-broken indices (knn parity) and produce finite output."""
        unknown = rng.normal(size=(1, 11, 3)).astype(np.float32)
        known = np.zeros((1, 8, 3), np.float32)
        feats = rng.normal(size=(1, 8, 4)).astype(np.float32)
        args = tuple(jnp.asarray(a) for a in (unknown, known, feats))
        got = np.asarray(ops.three_nn_interpolate(*args))
        want = np.asarray(ops.three_nn_interpolate_ref(*args))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_ball_query_in_radius(self, rng):
        xyz = rng.uniform(-1, 1, size=(1, 128, 3)).astype(np.float32)
        centers = xyz[:, :4]
        idx = np.asarray(ops.ball_query(0.5, 16, jnp.asarray(xyz),
                                        jnp.asarray(centers)))
        for s in range(4):
            d = ((xyz[0][idx[0, s]] - centers[0, s]) ** 2).sum(-1)
            assert (d <= 0.25 + 1e-5).all()

    def test_group_points_shapes_and_normalization(self, rng):
        pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
        nbr, center = ops.group_points(jnp.asarray(pts), 16, 8)
        assert nbr.shape == (2, 16, 8, 3)
        assert center.shape == (2, 16, 3)
        # each group's nearest neighbor of its center is the center itself ->
        # one row of each neighborhood is ~0
        m = np.abs(np.asarray(nbr)).sum(-1).min(-1)
        np.testing.assert_allclose(m, 0.0, atol=1e-5)


class TestChamferVJP:
    def test_gradcheck_vs_dense_autodiff(self, rng):
        """Our custom VJP must equal autodiff through the dense formulation
        (the TPU analog of the reference's gradcheck, extensions/chamfer_dist/test.py)."""
        x = jnp.asarray(rng.normal(size=(2, 9, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, 13, 3)).astype(np.float32))

        def loss_custom(x, y):
            d1, d2 = ops.chamfer_distances(x, y)
            return jnp.sum(d1 * 1.3) + jnp.sum(d2 * 0.7)

        def loss_dense(x, y):
            d = ops.square_distance(x, y)
            return jnp.sum(jnp.min(d, -1) * 1.3) + jnp.sum(jnp.min(d, -2) * 0.7)

        gx1, gy1 = jax.grad(loss_custom, argnums=(0, 1))(x, y)
        gx2, gy2 = jax.grad(loss_dense, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), atol=1e-4)

    def test_gradcheck_large_regime(self, rng):
        """Same check past the one-hot threshold (gather/scatter bwd path)."""
        x = jnp.asarray(rng.normal(size=(1, 300, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(1, 270, 3)).astype(np.float32))

        def loss_custom(x, y):
            d1, d2 = ops.chamfer_distances(x, y)
            return jnp.sum(d1 * 1.3) + jnp.sum(d2 * 0.7)

        def loss_dense(x, y):
            d = ops.square_distance(x, y)
            return jnp.sum(jnp.min(d, -1) * 1.3) + jnp.sum(jnp.min(d, -2) * 0.7)

        gx1, gy1 = jax.grad(loss_custom, argnums=(0, 1))(x, y)
        gx2, gy2 = jax.grad(loss_dense, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), atol=1e-4)

    def test_l1_l2_reductions(self, rng):
        x = jnp.asarray(rng.normal(size=(3, 8, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(3, 8, 3)).astype(np.float32))
        d1, d2, _, _ = ops.chamfer_ref(x, y)
        l2 = ops.chamfer_distance_l2(x, y)
        np.testing.assert_allclose(float(l2),
                                   float(jnp.mean(d1) + jnp.mean(d2)), rtol=1e-5)
        l1 = ops.chamfer_distance_l1(x, y)
        expect = 0.5 * (jnp.mean(jnp.sqrt(d1 + 1e-12)) + jnp.mean(jnp.sqrt(d2 + 1e-12)))
        np.testing.assert_allclose(float(l1), float(expect), rtol=1e-5)

    def test_identical_clouds_zero(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
        # expanded-form distances carry ~1e-7 cancellation noise
        assert float(ops.chamfer_distance_l2(x, x)) < 1e-6


@pytest.mark.pallas
class TestPallasInterpret:
    """Pallas kernel logic vs references, via the interpreter on CPU."""

    def setup_method(self, method):
        os.environ["ACT_TPU_PALLAS"] = "interpret"

    def teardown_method(self, method):
        os.environ.pop("ACT_TPU_PALLAS", None)

    def test_fps_pallas_matches_ref(self, rng):
        pts = jnp.asarray(rng.normal(size=(2, 200, 3)).astype(np.float32))
        got = np.asarray(fps_mod._fps_pallas(pts, 16))
        want = np.asarray(ops.furthest_point_sample_ref(pts, 16))
        np.testing.assert_array_equal(got, want)

    def test_nn_pair_matches_dense(self, rng):
        """Fused both-direction NN kernel: row/col minima + argmins identical
        to the two directed dense reductions, incl. ragged (padded) sizes and
        a multi-tile target axis."""
        for (N, M) in [(150, 300), (600, 2100), (513, 129)]:
            x = jnp.asarray(rng.normal(size=(2, N, 3)).astype(np.float32))
            y = jnp.asarray(rng.normal(size=(2, M, 3)).astype(np.float32))
            d1, i1, d2, i2 = chamfer_mod._nn_pair_pallas(x, y)
            dd1, ii1 = chamfer_mod._nn_dense(x, y)
            dd2, ii2 = chamfer_mod._nn_dense(y, x)
            np.testing.assert_allclose(np.asarray(d1), np.asarray(dd1),
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(d2), np.asarray(dd2),
                                       atol=1e-3)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(ii1))
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(ii2))

    def test_nn_pair_min_matches_dense(self, rng):
        """Distance-only pair kernel (primal/eval path): row+col minima match
        the dense reductions on ragged (sentinel-padded) sizes."""
        for (N, M) in [(150, 300), (600, 2100), (513, 129)]:
            x = jnp.asarray(rng.normal(size=(2, N, 3)).astype(np.float32))
            y = jnp.asarray(rng.normal(size=(2, M, 3)).astype(np.float32))
            d1, d2 = chamfer_mod._nn_pair_min_pallas(x, y)
            dd1, _ = chamfer_mod._nn_dense(x, y)
            dd2, _ = chamfer_mod._nn_dense(y, x)
            np.testing.assert_allclose(np.asarray(d1), np.asarray(dd1),
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(d2), np.asarray(dd2),
                                       atol=1e-3)

    def test_fps_batched_pallas_matches_ref(self, rng):
        pts = jnp.asarray(rng.normal(size=(3, 200, 3)).astype(np.float32))
        got = np.asarray(fps_mod._fps_pallas_batched(pts, 16))
        want = np.asarray(ops.furthest_point_sample_ref(pts, 16))
        np.testing.assert_array_equal(got, want)

    def test_fps_seeded_start_matches_ref(self, rng):
        """Seedable start (SURVEY §2.1): per-cloud random start indices give
        index-exact parity between the batched Pallas kernel and the pure-XLA
        reference, and a nonzero start changes the walk."""
        pts = jnp.asarray(rng.normal(size=(3, 200, 3)).astype(np.float32))
        start = jnp.asarray(rng.integers(0, 200, size=(3,)), jnp.int32)
        got = np.asarray(ops.furthest_point_sample(pts, 16, start_idx=start))
        want = np.asarray(ops.furthest_point_sample_ref(pts, 16, start))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got[:, 0], np.asarray(start))
        # a long-enough sample list (beyond one 128-lane flush block) keeps
        # the start in lane 0 of block 0 across the rolling-buffer flushes
        got_long = np.asarray(ops.furthest_point_sample(pts, 130,
                                                        start_idx=start))
        want_long = np.asarray(ops.furthest_point_sample_ref(pts, 130, start))
        np.testing.assert_array_equal(got_long, want_long)
        # scalar start broadcasts; default stays the CUDA-parity index 0
        got_s = np.asarray(ops.furthest_point_sample(pts, 16, start_idx=5))
        np.testing.assert_array_equal(got_s[:, 0], np.full(3, 5))
        base = np.asarray(ops.furthest_point_sample(pts, 16))
        np.testing.assert_array_equal(
            base, np.asarray(ops.furthest_point_sample_ref(pts, 16)))

    def test_k_smallest_matches_topk(self, rng):
        from act_tpu.ops.topk import k_smallest_pallas
        for (B, S, N, k) in [(2, 64, 1024, 32), (1, 9, 777, 3),
                             (3, 37, 130, 4)]:
            d = jnp.asarray(rng.normal(size=(B, S, N)).astype(np.float32))
            v_p, i_p = k_smallest_pallas(d, k)
            v_r, i_r = jax.lax.top_k(-d, k)
            np.testing.assert_allclose(np.asarray(v_p), -np.asarray(v_r),
                                       atol=1e-6)
            np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_r))

    def test_k_smallest_tie_break_and_degenerate(self):
        from act_tpu.ops.topk import k_smallest_pallas
        d = jnp.zeros((1, 8, 256), jnp.float32)  # all-identical distances
        v, i = k_smallest_pallas(d, 5)
        np.testing.assert_array_equal(np.asarray(i)[0, 0], [0, 1, 2, 3, 4])
        np.testing.assert_allclose(np.asarray(v), 0.0)

    def _expected_gumbel_ids(self, logits, seed, chunk):
        """Replicates sampling._hash_bits (interpret-mode noise) in numpy."""
        rows, v = logits.shape
        row = (np.arange(rows, dtype=np.uint32) % np.uint32(chunk))[:, None]
        pid = (np.arange(rows, dtype=np.uint32) // np.uint32(chunk))[:, None]
        lane = np.arange(v, dtype=np.uint32)[None, :]
        s0, s1 = (np.uint32(seed[0] & 0xFFFFFFFF), np.uint32(seed[1] & 0xFFFFFFFF))
        with np.errstate(over="ignore"):
            h = (row * np.uint32(2654435769) + lane * np.uint32(40503)
                 + s0 * np.uint32(69069) + s1 * np.uint32(1013904223)
                 + pid * np.uint32(22695477) + np.uint32(374761393))
            h = h ^ (h << np.uint32(13))
            h = h ^ (h >> np.uint32(17))
            h = h ^ (h << np.uint32(5))
        bits = (h >> np.uint32(1)).astype(np.float64)
        u = np.maximum(bits * (1.0 / 2 ** 31), 1e-10).astype(np.float32)
        g = -np.log(-np.log(u))
        return np.argmax(logits.astype(np.float32) + g, axis=-1)

    def test_gumbel_argmax_kernel_matches_hash_formula(self, rng):
        from act_tpu.ops import sampling
        key = jax.random.PRNGKey(11)
        try:
            seed = np.asarray(jax.random.key_data(key))
        except TypeError:
            seed = np.asarray(key)
        seed = seed.astype(np.int64).reshape(-1)[:2]
        for (B, G, V) in [(2, 16, 512), (3, 40, 130)]:
            logits = rng.normal(size=(B, G, V)).astype(np.float32) * 3
            vpad = ((V + 127) // 128) * 128
            chunk = max(8, min(256, (4 * 1024 * 1024) // (4 * vpad)))
            chunk = min(chunk, ((B * G + 7) // 8) * 8)
            ids = np.asarray(sampling.gumbel_argmax_pallas(
                jnp.asarray(logits), key))
            want = self._expected_gumbel_ids(
                logits.reshape(-1, V), seed, chunk).reshape(B, G)
            np.testing.assert_array_equal(ids, want)

    def test_gumbel_argmax_tracks_logits(self, rng):
        """Huge logit margins dominate the noise -> plain argmax."""
        from act_tpu.ops import sampling
        logits = jnp.asarray(rng.normal(size=(4, 8, 256)).astype(np.float32))
        ids = sampling.gumbel_argmax_pallas(logits * 1e6, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(
            np.asarray(ids), np.asarray(jnp.argmax(logits, -1)))

    def test_knn_pallas_path_matches_ref(self, rng):
        pts = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
        d_p, i_p = group_mod._knn_tpu(pts, q, 8)
        d_r, i_r = ops.knn_ref(pts, q, 8)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_r))
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), atol=1e-4)


@pytest.mark.pallas
class TestKernelShardMap:
    """Pallas kernels under shard_map over an 8-device 'data' axis (interpret
    mode): multi-chip runs must partition the kernels per shard instead of
    GSPMD all-gathering through the opaque custom-calls. Results must be
    identical to the unsharded kernels."""

    def setup_method(self, method):
        os.environ["ACT_TPU_PALLAS"] = "interpret"

    def teardown_method(self, method):
        os.environ.pop("ACT_TPU_PALLAS", None)

    def _mesh(self):
        from act_tpu.parallel import make_mesh
        return make_mesh()  # ('data', 'model') over the 8 CPU devices

    def test_group_points_sharded_matches_unsharded(self, rng):
        from act_tpu.ops._backend import kernel_mesh
        pts = jnp.asarray(rng.normal(size=(16, 512, 3)).astype(np.float32))
        nbr0, c0 = ops.group_points(pts, 32, 16)
        with kernel_mesh(self._mesh()):
            nbr1, c1 = ops.group_points(pts, 32, 16)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(nbr0), np.asarray(nbr1))

    def test_fps_knn_sharded_match(self, rng):
        from act_tpu.ops._backend import kernel_mesh
        pts = jnp.asarray(rng.normal(size=(8, 300, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(8, 40, 3)).astype(np.float32))
        i0 = ops.furthest_point_sample(pts, 16)
        _, k0 = ops.knn(pts, q, 8)
        with kernel_mesh(self._mesh()):
            i1 = ops.furthest_point_sample(pts, 16)
            _, k1 = ops.knn(pts, q, 8)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))

    def test_ragged_batch_falls_back(self, rng):
        """Batch not divisible by the data axis: unsharded fallback, same values."""
        from act_tpu.ops._backend import kernel_mesh
        pts = jnp.asarray(rng.normal(size=(3, 300, 3)).astype(np.float32))
        i0 = ops.furthest_point_sample(pts, 16)
        with kernel_mesh(self._mesh()):
            i1 = ops.furthest_point_sample(pts, 16)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_sharded_inside_jit_with_sharded_input(self, rng):
        """End-to-end: sharded batch into a jitted fn whose body runs
        group_points under the kernel mesh."""
        from act_tpu.ops._backend import kernel_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._mesh()
        pts = jnp.asarray(rng.normal(size=(16, 512, 3)).astype(np.float32))
        ref_n, ref_c = ops.group_points(pts, 32, 16)
        sharded = jax.device_put(pts, NamedSharding(mesh, P("data")))

        @jax.jit
        def fn(x):
            with kernel_mesh(mesh):
                nbr, center = ops.group_points(x, 32, 16)
            return nbr.sum(), center

        s, center = fn(sharded)
        np.testing.assert_allclose(float(s), float(ref_n.sum()), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(center), np.asarray(ref_c))

    def test_gumbel_argmax_sharded(self, rng):
        """Fused gumbel dispatch shards over 'data' (ADVICE r2): dominant
        logits still win everywhere, and the per-shard seed fold keeps the
        noise streams distinct across shards (a replicated seed would draw
        the identical Gumbel pattern on every chip)."""
        from act_tpu.ops._backend import kernel_mesh
        from act_tpu.ops import sampling
        logits = jnp.asarray(rng.normal(size=(16, 4, 256)).astype(np.float32))
        with kernel_mesh(self._mesh()):
            ids = sampling.gumbel_argmax_pallas(logits * 1e6,
                                                jax.random.PRNGKey(0))
            np.testing.assert_array_equal(
                np.asarray(ids), np.asarray(jnp.argmax(logits, -1)))
            flat = sampling.gumbel_argmax_pallas(
                jnp.zeros((16, 4, 256), jnp.float32), jax.random.PRNGKey(0))
        flat = np.asarray(flat)  # pure-noise winners, 2 rows per shard
        shard_rows = flat.reshape(8, 2 * 4)
        assert len({tuple(r) for r in shard_rows}) > 1


class TestGatherPallas:
    def setup_method(self, method):
        os.environ["ACT_TPU_PALLAS"] = "interpret"

    def teardown_method(self, method):
        os.environ.pop("ACT_TPU_PALLAS", None)

    def test_gather_matches_take_along_axis(self, rng):
        from act_tpu.ops.gather import gather_points_pallas
        import jax.numpy as jnp
        for (B, N, S, C) in [(2, 777, 300, 3), (3, 1024, 2048, 3),
                             (2, 129, 256, 6)]:
            pts = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, N, size=(B, S)).astype(np.int32))
            ref = jnp.take_along_axis(pts, idx[..., None], axis=1)
            got = gather_points_pallas(pts, idx)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_gather_coords_multidim_idx(self, rng):
        from act_tpu.ops.reference import gather_coords
        import jax.numpy as jnp
        pts = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 512, size=(2, 64, 32)).astype(np.int32))
        ref = jnp.take_along_axis(pts, idx.reshape(2, -1)[..., None],
                                  axis=1).reshape(2, 64, 32, 3)
        got = gather_coords(pts, idx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
