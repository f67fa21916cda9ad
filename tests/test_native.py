"""Native C++ pointops: build, parity vs numpy/JAX references, speed sanity."""
import time

import numpy as np
import pytest

from act_tpu import native


class TestNativeOps:
    def test_builds(self):
        assert native.available(), "C++ pointops failed to build"

    def test_fps_matches_reference(self, rng):
        import jax.numpy as jnp
        from act_tpu.ops import furthest_point_sample_ref
        pts = rng.normal(size=(3, 500, 3)).astype(np.float32)
        got = native.fps(pts, 37)
        want = np.asarray(furthest_point_sample_ref(jnp.asarray(pts), 37))
        np.testing.assert_array_equal(got, want.astype(np.int64))

    def test_fps_single_cloud(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        idx = native.fps(pts, 16)
        assert idx.shape == (16,)
        assert idx[0] == 0
        assert len(np.unique(idx)) == 16

    def test_normalize(self, rng):
        pts = (rng.normal(size=(2, 100, 3)) * 5 + 3).astype(np.float32)
        out = native.normalize(pts)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)
        r = np.linalg.norm(out, axis=-1).max(axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-4)

    def test_knn_matches_numpy(self, rng):
        ref = rng.normal(size=(2, 128, 3)).astype(np.float32)
        q = rng.normal(size=(2, 16, 3)).astype(np.float32)
        dist, idx = native.knn(ref, q, 5)
        full = ((q[:, :, None] - ref[:, None]) ** 2).sum(-1)
        want_d = np.sort(full, axis=-1)[..., :5]
        np.testing.assert_allclose(dist, want_d, atol=1e-4)
        np.testing.assert_allclose(
            np.take_along_axis(full, idx, axis=-1), dist, atol=1e-4)

    def test_fps_faster_than_numpy_fallback(self, rng):
        if not native.available():
            pytest.skip("no native lib")
        pts = rng.normal(size=(4, 4096, 3)).astype(np.float32)
        t0 = time.time()
        native.fps(pts, 512)
        t_native = time.time() - t0
        # numpy path
        lib, native._lib = native._lib, None
        failed, native._build_failed = native._build_failed, True
        t0 = time.time()
        native.fps(pts, 512)
        t_numpy = time.time() - t0
        native._lib, native._build_failed = lib, failed
        assert t_native < t_numpy, (t_native, t_numpy)
