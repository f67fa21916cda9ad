"""Data layer tests: registries, synthetic fallback, loader, transforms."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from act_tpu.utils.config import ConfigDict
from act_tpu.datasets import (DATASETS, build_dataset_from_cfg, DataLoader,
                              transforms)


def shapenet_cfg(**over):
    cfg = ConfigDict(dict(NAME="ShapeNet", N_POINTS=8192,
                          DATA_PATH="/nonexistent/ShapeNet-55",
                          PC_PATH="/nonexistent/shapenet_pc",
                          subset="train", npoints=128))
    cfg.update(over)
    return cfg


class TestDatasets:
    def test_shapenet_synthetic(self):
        ds = DATASETS.build(shapenet_cfg())
        tax, mid, pts = ds[0]
        assert pts.shape == (128, 3)
        assert pts.dtype == np.float32
        # unit sphere normalized
        assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-5

    def test_build_from_base_cfg(self):
        node = ConfigDict(dict(_base_=dict(NAME="ShapeNet", N_POINTS=8192,
                                           DATA_PATH="/nope", PC_PATH="/nope"),
                               others=dict(subset="train", npoints=64,
                                           whole=True)))
        ds = build_dataset_from_cfg(node)
        assert ds[1][2].shape == (64, 3)

    def test_modelnet_synthetic_labels(self):
        cfg = ConfigDict(dict(NAME="ModelNet", DATA_PATH="/nope", N_POINTS=256,
                              NUM_CATEGORY=40, USE_NORMALS=False,
                              subset="test"))
        ds = DATASETS.build(cfg)
        _, _, (pts, label) = ds[7]
        assert pts.shape == (256, 3)
        assert label == 7 % 40

    def test_scanobjectnn_hardest(self):
        cfg = ConfigDict(dict(NAME="ScanObjectNN_hardest", ROOT="/nope",
                              subset="train"))
        ds = DATASETS.build(cfg)
        _, _, (pts, label) = ds[3]
        assert pts.shape == (2048, 3)
        assert 0 <= label < 15

    def test_fewshot(self):
        cfg = ConfigDict(dict(NAME="ModelNetFewShot", DATA_PATH="/nope",
                              N_POINTS=128, subset="train", way=5, shot=10,
                              fold=0))
        ds = DATASETS.build(cfg)
        assert len(ds) == 50
        _, _, (pts, label) = ds[0]
        assert 0 <= label < 5


class TestRealFormatParsers:
    """The real on-disk parsers (not the synthetic fallback): tiny files in
    each dataset's exact released format, loaded through the registry. This
    is the 'archives appear -> config change only' claim made concrete."""

    def test_shapenet_npy_and_split_files(self, tmp_path):
        import os
        root = tmp_path / "ShapeNet-55"
        pc = tmp_path / "shapenet_pc"
        os.makedirs(root), os.makedirs(pc)
        rng = np.random.default_rng(0)
        names = []
        for i in range(3):
            name = f"0{i:07d}-m{i}.npy"
            np.save(pc / name, rng.normal(size=(600, 3)).astype(np.float32))
            names.append(name)
        (root / "train.txt").write_text("\n".join(names[:2]) + "\n")
        (root / "test.txt").write_text(names[2] + "\n")
        ds = DATASETS.build(shapenet_cfg(DATA_PATH=str(root),
                                         PC_PATH=str(pc), npoints=128))
        assert not ds.synthetic and len(ds) == 2
        tax, mid, pts = ds[0]
        assert tax == "00000000" and mid == "m0"
        assert pts.shape == (128, 3)
        assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-5
        # whole=True concatenates test split (reference whole branch)
        ds_whole = DATASETS.build(shapenet_cfg(DATA_PATH=str(root),
                                               PC_PATH=str(pc), npoints=64,
                                               whole=True))
        assert len(ds_whole) == 3

    def test_fast_npy_reader_matches_np_load(self, tmp_path):
        """IO.get's memoized-header .npy reader (hot loader path, ~2.2x
        np.load) is value-exact and falls back for exotic layouts."""
        from act_tpu.datasets.io import IO
        cases = [np.random.randn(64, 3).astype(np.float32),
                 np.random.randn(7),
                 np.arange(24, dtype=np.int16).reshape(2, 3, 4),
                 np.float32(3.5),  # 0-d
                 np.asfortranarray(np.random.randn(5, 4))]  # fallback path
        for i, a in enumerate(cases):
            p = str(tmp_path / f"t{i}.npy")
            np.save(p, a)
            got = IO.get(p)
            np.testing.assert_array_equal(got, np.load(p))
            assert got.dtype == np.load(p).dtype

    def test_shapenet_get_batch_matches_per_item(self, tmp_path):
        """The vectorized DataLoader fast path (ShapeNet.get_batch) must be
        EXACTLY the per-item __getitem__ + default_collate path: same rng
        draw sequence, same subsample picks, bit-equal normalize."""
        import os
        from act_tpu.datasets.loader import default_collate
        root = tmp_path / "ShapeNet-55"
        pc = tmp_path / "shapenet_pc"
        os.makedirs(root), os.makedirs(pc)
        rng = np.random.default_rng(3)
        names = []
        for i in range(6):
            name = f"0{i:07d}-m{i}.npy"
            np.save(pc / name, rng.normal(size=(600, 3)).astype(np.float32))
            names.append(name)
        (root / "train.txt").write_text("\n".join(names) + "\n")
        (root / "test.txt").write_text(names[0] + "\n")
        mk = lambda: DATASETS.build(shapenet_cfg(
            DATA_PATH=str(root), PC_PATH=str(pc), npoints=128))
        idxs = np.asarray([4, 0, 2, 5])
        ds_item = mk()  # fresh rng state each (init seeds default_rng(0))
        ref = default_collate([ds_item[int(i)] for i in idxs])
        ds_fast = mk()
        tax, mid, pts = ds_fast.get_batch(idxs)
        assert list(tax) == list(ref[0]) and list(mid) == list(ref[1])
        assert pts.dtype == np.float32
        np.testing.assert_array_equal(pts, ref[2])
        # the DataLoader routes through the fast path transparently
        from act_tpu.datasets import DataLoader
        dl_fast = DataLoader(mk(), 4, shuffle=False, prefetch=0)
        b_fast = next(iter(dl_fast))
        ds_ref2 = mk()  # reference batch via per-item collate, same rng state
        b_ref = default_collate([ds_ref2[i] for i in range(4)])
        np.testing.assert_array_equal(b_fast[2], b_ref[2])
        # heterogeneous per-file point counts: get_batch falls back to the
        # per-item subsample-then-stack order (still batched normalize)
        np.save(pc / names[1], np.random.default_rng(9).normal(
            size=(300, 3)).astype(np.float32))  # resize one file
        ds_het_fast, ds_het_item = mk(), mk()
        got = ds_het_fast.get_batch(np.asarray([0, 1, 2]))
        want = default_collate([ds_het_item[i] for i in range(3)])
        np.testing.assert_allclose(got[2], want[2], rtol=0, atol=1e-6)
        assert got[2].shape == (3, 128, 3)

    def test_modelnet_txt_and_fps_cache(self, tmp_path):
        import os
        root = tmp_path / "modelnet"
        rng = np.random.default_rng(1)
        cats = ["airplane", "chair"]
        ids = []
        for c in cats:
            os.makedirs(root / c)
            for k in range(2):
                sid = f"{c}_{k:04d}"
                pts = rng.normal(size=(300, 6)).astype(np.float32)
                np.savetxt(root / c / f"{sid}.txt", pts, delimiter=",")
                ids.append(sid)
        (root / "modelnet40_shape_names.txt").write_text("\n".join(cats) + "\n")
        (root / "modelnet40_train.txt").write_text("\n".join(ids) + "\n")
        cfg = ConfigDict(dict(NAME="ModelNet", DATA_PATH=str(root),
                              N_POINTS=64, NUM_CATEGORY=40,
                              USE_NORMALS=False, subset="train"))
        ds = DATASETS.build(cfg)
        assert not ds.synthetic and len(ds) == 4
        _, _, (pts, label) = ds[0]
        assert pts.shape == (64, 3) and label in (0, 1)
        # the offline FPS cache was written and reloads identically
        cache = root / "modelnet40_train_64pts_fps.dat"
        assert cache.exists()
        ds2 = DATASETS.build(cfg)
        np.testing.assert_array_equal(
            np.asarray(ds2.list_of_points[0]), np.asarray(ds.list_of_points[0]))

    def test_scanobjectnn_h5(self, tmp_path):
        import h5py
        rng = np.random.default_rng(2)
        with h5py.File(tmp_path / "training_objectdataset.h5", "w") as f:
            f["data"] = rng.normal(size=(5, 2048, 3)).astype(np.float32)
            f["label"] = np.arange(5)
        cfg = ConfigDict(dict(NAME="ScanObjectNN", ROOT=str(tmp_path),
                              subset="train"))
        ds = DATASETS.build(cfg)
        assert not ds.synthetic and len(ds) == 5
        _, _, (pts, label) = ds[3]
        assert pts.shape == (2048, 3) and label == 3

    def test_fewshot_pkl(self, tmp_path):
        import os
        import pickle
        rng = np.random.default_rng(3)
        os.makedirs(tmp_path / "5way_10shot")
        mk = lambda n: [(rng.normal(size=(128, 6)).astype(np.float32),
                         i % 5, i % 5) for i in range(n)]
        with open(tmp_path / "5way_10shot" / "0.pkl", "wb") as f:
            pickle.dump({"train": mk(50), "test": mk(100)}, f)
        cfg = ConfigDict(dict(NAME="ModelNetFewShot", DATA_PATH=str(tmp_path),
                              N_POINTS=128, subset="test", way=5, shot=10,
                              fold=0))
        ds = DATASETS.build(cfg)
        assert not ds.synthetic and len(ds) == 100
        _, _, (pts, label) = ds[7]
        assert pts.shape == (128, 3) and label == 2


class TestLoader:
    def test_batching_and_epochs(self):
        ds = DATASETS.build(shapenet_cfg(npoints=32))
        dl = DataLoader(ds, batch_size=16, shuffle=True, drop_last=True, seed=1)
        batches = list(dl)
        assert len(batches) == len(ds) // 16
        tax, mid, pts = batches[0]
        assert pts.shape == (16, 32, 3)
        # different epoch -> different order
        dl.set_epoch(1)
        b2 = next(iter(dl))
        assert not np.allclose(b2[2], batches[0][2])

    def test_replica_sharding(self):
        ds = DATASETS.build(shapenet_cfg(npoints=32))
        seen = []
        for r in range(4):
            dl = DataLoader(ds, batch_size=8, shuffle=False, num_replicas=4,
                            rank=r, prefetch=0)
            seen.append(sum(len(b[2]) for b in dl))
        assert len(set(seen)) == 1  # equal shards


class TestTransforms:
    def setup_method(self, m):
        self.pc = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 64, 3)).astype(np.float32))
        self.key = jax.random.PRNGKey(0)

    def test_scale_and_translate_bounds(self):
        out = transforms.scale_and_translate(self.key, self.pc)
        assert out.shape == self.pc.shape
        assert not np.allclose(out, self.pc)

    def test_rotate_preserves_norm_in_xz(self):
        out = transforms.rotate_y(self.key, self.pc)
        r_in = np.asarray(self.pc[..., 0] ** 2 + self.pc[..., 2] ** 2)
        r_out = np.asarray(out[..., 0] ** 2 + out[..., 2] ** 2)
        np.testing.assert_allclose(r_in, r_out, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out[..., 1]),
                                   np.asarray(self.pc[..., 1]), atol=1e-6)

    def test_jitter_clipped(self):
        out = transforms.jitter(self.key, self.pc, std=0.01, clip=0.05)
        assert float(jnp.abs(out - self.pc).max()) <= 0.05 + 1e-6

    def test_dropout_replaces_with_first(self):
        out = transforms.random_input_dropout(self.key, self.pc, 0.9)
        first = self.pc[:, 0:1, :]
        changed = ~np.isclose(np.asarray(out), np.asarray(self.pc)).all(-1)
        out_np = np.asarray(out)
        for b in range(4):
            if changed[b].any():
                sel = out_np[b][changed[b]]
                np.testing.assert_allclose(
                    sel, np.broadcast_to(np.asarray(first[b, 0]), sel.shape),
                    atol=1e-6)

    def test_all_transforms_jit_and_shapes(self):
        for name, fn in transforms.TRANSFORMS.items():
            out = fn(self.key, self.pc)
            assert out.shape == self.pc.shape, name


class _NpyDiskDataset:
    """Realistic per-sample IO: .npy read + random permutation subsample +
    unit-sphere normalize (the reference ShapeNet __getitem__ recipe,
    datasets/ShapeNet55Dataset.py:70-108)."""

    def __init__(self, root, n_files, n_points=8192, npoints=1024):
        import os
        self.paths = []
        self.npoints = npoints
        rng = np.random.default_rng(0)
        for i in range(n_files):
            p = os.path.join(root, f"{i:05d}.npy")
            np.save(p, rng.normal(size=(n_points, 3)).astype(np.float32))
            self.paths.append(p)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        pts = np.load(self.paths[i])
        idx = np.random.permutation(pts.shape[0])[:self.npoints]
        pts = pts[idx]
        pts = pts - pts.mean(0)
        pts = pts / np.max(np.linalg.norm(pts, axis=1))
        return ("Tax", f"m{i}", pts.astype(np.float32))


class TestLoaderWorkers:
    def test_mp_loader_matches_inprocess(self, tmp_path):
        """Worker-pool batches must equal in-process batches exactly (same
        index order; per-sample np.random permutation differs, so compare on
        a deterministic dataset)."""

        class Deterministic:
            def __len__(self):
                return 37

            def __getitem__(self, i):
                return ("T", f"m{i}",
                        np.full((16, 3), float(i), dtype=np.float32))

        ds = Deterministic()
        a = DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_workers=0)
        b = DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_workers=2)
        a.set_epoch(1), b.set_epoch(1)
        batches_a = [x for _, _, x in a]
        batches_b = [x for _, _, x in b]
        b.close()
        assert len(batches_a) == len(batches_b)
        for x, y in zip(batches_a, batches_b):
            np.testing.assert_array_equal(x, y)

    @pytest.mark.slow
    def test_loader_throughput_with_real_io(self, tmp_path):
        """Throughput floor with realistic per-sample .npy IO. The bench chip
        consumes ~2-3k clouds/sec; document the margin (DESIGN.md). Slow
        marker: wall-clock floors are machine-load dependent."""
        import time
        ds = _NpyDiskDataset(str(tmp_path), n_files=512)
        results = {}
        for workers in (0, 4):
            loader = DataLoader(ds, batch_size=128, shuffle=False,
                                num_workers=workers)
            # warm-up epoch populates the page cache / forks the pool
            for _ in loader:
                pass
            t0 = time.perf_counter()
            n = 0
            for _, _, pts in loader:
                n += pts.shape[0]
            dt = time.perf_counter() - t0
            results[workers] = n / dt
            loader.close()
        print(f"loader throughput clouds/sec: {results}")
        # conservative floor — the measured pool rate is far above the
        # chip's consumption; retry once because this wall-clock floor is
        # machine-load dependent (observed one dip below under a full
        # parallel suite on the 1-core CI container)
        if results[4] <= 1000:
            loader = DataLoader(ds, batch_size=128, shuffle=False,
                                num_workers=4)
            for _ in loader:
                pass
            t0 = time.perf_counter()
            n = sum(pts.shape[0] for _, _, pts in loader)
            results[4] = n / (time.perf_counter() - t0)
            loader.close()
        assert results[4] > 1000, results


    def test_workers_draw_distinct_random_subsamples(self, tmp_path):
        """Forked workers must NOT replay identical RNG streams: per-worker
        reseeding (the torch worker_init_fn analog) gives different
        per-sample permutation draws across workers."""

        class RngDataset:
            def __init__(self):
                self.rng = np.random.default_rng(0)

            def __len__(self):
                return 16

            def __getitem__(self, i):
                # the sample VALUE is a random draw: identical worker RNG
                # state would make the k-th draw equal in every worker
                return ("T", f"m{i}", self.rng.normal(size=(4,)).astype(
                    np.float32))

        loader = DataLoader(RngDataset(), batch_size=1, shuffle=False,
                            num_workers=4)
        batches = [x for _, _, x in loader]
        loader.close()
        flat = np.concatenate(batches)
        # with 4 workers each producing 4 samples, identical streams would
        # yield only ~4 distinct values; reseeded workers yield all distinct
        assert len(np.unique(flat.round(6), axis=0)) > 8
