"""Point-cloud dataset classes.

Reference parity:
- ``ShapeNet`` (datasets/ShapeNet55Dataset.py:9-133): file-list driven .npy clouds,
  random permutation subsample to ``npoints``, unit-sphere normalize; ``whole=True``
  concatenates test+train lists.
- ``ModelNet`` (datasets/ModelNetDataset.py): txt point files, offline FPS to 8192
  cached as .dat pickle, normalize, train-time shuffle of point order.
- ``ModelNetFewShot`` (datasets/ModelNetDatasetFewShot.py): pre-generated
  {way}way_{shot}shot/{fold}.pkl splits.
- ``ScanObjectNN`` / ``ScanObjectNN_hardest`` (datasets/ScanObjectNNDataset.py):
  h5 archives, 2048 points, train-time point shuffle.

Every class returns numpy samples as ``(taxonomy_id, model_id, data)`` like the
reference, where ``data`` is ``points`` or ``(points, label)``. When the configured
data root is missing, the class serves deterministic synthetic clouds
(:mod:`act_tpu.datasets.synthetic`) so the full pipeline runs data-free.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from act_tpu.datasets.build import DATASETS
from act_tpu.datasets.io import IO
from act_tpu.datasets.synthetic import synthetic_cloud
from act_tpu.utils.logger import print_log


from act_tpu.utils.misc import pc_normalize  # single shared definition


def farthest_point_sample_np(point: np.ndarray, npoint: int) -> np.ndarray:
    """Host FPS for offline dataset caching (reference ModelNetDataset.py:29-50).

    Uses the native C++ kernel when available (act_tpu.native), ~50x the pure
    numpy loop the reference runs per cached cloud."""
    from act_tpu import native
    if native.available():
        idx = native.fps(np.ascontiguousarray(point[:, :3], np.float32), npoint)
        return point[idx]
    N, D = point.shape
    xyz = point[:, :3]
    centroids = np.zeros((npoint,), dtype=np.int64)
    distance = np.full((N,), np.inf)
    farthest = 0
    for i in range(npoint):
        centroids[i] = farthest
        centroid = xyz[farthest, :]
        dist = np.sum((xyz - centroid) ** 2, -1)
        distance = np.minimum(distance, dist)
        farthest = int(np.argmax(distance))
    return point[centroids]


class _SyntheticMixin:
    """Fallback sample generation when the real data root is absent."""
    synthetic: bool = False
    synthetic_len: int = 512

    def _maybe_synthetic(self, root: str, logger: str):
        if root and os.path.exists(root):
            return False
        print_log(f"[DATASET] data root '{root}' not found — serving "
                  f"DETERMINISTIC SYNTHETIC clouds ({self.synthetic_len} samples)",
                  logger=logger)
        self.synthetic = True
        return True


@DATASETS.register_module()
class ShapeNet(_SyntheticMixin):
    NUM_CLASSES = 55

    def __init__(self, config):
        self.data_root = config.DATA_PATH
        self.pc_path = config.get("PC_PATH", "")
        self.subset = config.subset
        self.npoints = config.N_POINTS
        self.sample_points_num = config.npoints
        self.whole = bool(config.get("whole", False))
        self.rng = np.random.default_rng(0)

        if self._maybe_synthetic(self.pc_path, "ShapeNet-55"):
            self.file_list = [
                {"taxonomy_id": f"{i % self.NUM_CLASSES:08d}",
                 "model_id": f"synthetic_{i}", "file_path": None}
                for i in range(self.synthetic_len)]
            return

        data_list_file = os.path.join(self.data_root, f"{self.subset}.txt")
        with open(data_list_file) as f:
            lines = f.readlines()
        if self.whole:
            with open(os.path.join(self.data_root, "test.txt")) as f:
                lines = f.readlines() + lines
        self.file_list = []
        for line in lines:
            line = line.strip()
            taxonomy_id = line.split("-")[0]
            model_id = line.split("-")[1].split(".")[0]
            self.file_list.append({"taxonomy_id": taxonomy_id,
                                   "model_id": model_id, "file_path": line})
        print_log(f"[DATASET] {len(self.file_list)} instances loaded",
                  logger="ShapeNet-55")

    def random_sample(self, pc: np.ndarray, num: int) -> np.ndarray:
        """Uniform subsample without replacement. choice(replace=False)
        instead of permutation(N)[:num]: same distribution (distribution-
        level substitution policy, DESIGN.md), but it only draws num values
        instead of shuffling all N — 93 → 28µs/cloud on the hot loader path
        (reference subsamples with np.random.permutation,
        datasets/ShapeNet55Dataset.py:70-108)."""
        sel = self.rng.choice(pc.shape[0], num, replace=False)
        return pc[sel]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, idx):
        sample = self.file_list[idx]
        if self.synthetic:
            pts, _ = synthetic_cloud(idx, self.npoints, self.NUM_CLASSES)
        else:
            pts = IO.get(os.path.join(self.pc_path, sample["file_path"]))
            pts = pts.astype(np.float32)
        pts = self.random_sample(pts, self.sample_points_num)
        pts = pc_normalize(pts).astype(np.float32)
        return sample["taxonomy_id"], sample["model_id"], pts

    def get_batch(self, idxs):
        """Vectorized batch assembly (DataLoader fast path).

        Same per-cloud semantics as ``__getitem__`` — np.load, uniform
        without-replacement subsample, pc_normalize — but the subsample
        gather and the normalize run ONCE over the (B, N, 3) stack instead
        of B Python passes (~110µs/cloud of interpreter+collate overhead on
        the hot pretrain loader path). The rng.choice draw sequence is
        IDENTICAL to the per-item path; the batched mean/einsum reductions
        match numpy's per-cloud pairwise order (parity test pins equality).
        """
        if self.synthetic:
            from act_tpu.datasets.loader import default_collate
            return default_collate([self[int(i)] for i in idxs])
        tax, mid, clouds = [], [], []
        for i in idxs:
            s = self.file_list[int(i)]
            tax.append(s["taxonomy_id"])
            mid.append(s["model_id"])
            clouds.append(IO.get(os.path.join(self.pc_path, s["file_path"])))
        if len({c.shape for c in clouds}) > 1:
            # heterogeneous per-file point counts can't stack pre-subsample;
            # subsample each cloud first like __getitem__ (rng draw order is
            # identical either way — one choice() per cloud, in order)
            sub = [self.random_sample(c.astype(np.float32),
                                      self.sample_points_num) for c in clouds]
            return tax, mid, np.stack(
                [pc_normalize(p).astype(np.float32) for p in sub])
        stack = np.stack(clouds).astype(np.float32, copy=False)
        B, N = stack.shape[0], stack.shape[1]
        num = self.sample_points_num
        # always draw (even num == N is a shuffle in the per-item path) so
        # the rng stream stays call-for-call aligned with __getitem__
        sel = np.stack([self.rng.choice(N, num, replace=False)
                        for _ in range(B)])
        pts = np.take_along_axis(stack, sel[..., None], axis=1)
        pts = pts - pts.mean(axis=1, keepdims=True)
        m = np.sqrt(np.einsum("bij,bij->bi", pts, pts).max(axis=1))
        pts = pts / np.maximum(m, 1e-12)[:, None, None]
        return tax, mid, pts.astype(np.float32, copy=False)


@DATASETS.register_module()
class ShapeNetImagePoint(ShapeNet):
    """Registered duplicate of ShapeNet (reference ShapeNet55Dataset.py keeps an
    identical second class under this name)."""
    pass


@DATASETS.register_module()
class ModelNet(_SyntheticMixin):
    def __init__(self, config):
        self.root = config.DATA_PATH
        self.npoints = config.N_POINTS
        self.use_normals = bool(config.get("USE_NORMALS", False))
        self.num_category = config.get("NUM_CATEGORY", 40)
        self.subset = config.subset
        split = self.subset
        self.rng = np.random.default_rng(0)

        if self._maybe_synthetic(self.root, "ModelNet"):
            self.list_of_labels = [i % self.num_category
                                   for i in range(self.synthetic_len)]
            self.list_of_points = None
            return

        catfile = os.path.join(self.root, "modelnet40_shape_names.txt")
        self.cat = [line.rstrip() for line in open(catfile)]
        self.classes = dict(zip(self.cat, range(len(self.cat))))
        shape_ids = [line.rstrip() for line in
                     open(os.path.join(self.root, f"modelnet40_{split}.txt"))]
        shape_names = ["_".join(x.split("_")[0:-1]) for x in shape_ids]
        self.datapath = [
            (shape_names[i],
             os.path.join(self.root, shape_names[i], shape_ids[i]) + ".txt")
            for i in range(len(shape_ids))]

        # offline FPS cache to .dat (reference ModelNetDataset.py:86-116)
        cache = os.path.join(
            self.root, f"modelnet{self.num_category}_{split}_{self.npoints}pts_fps.dat")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                self.list_of_points, self.list_of_labels = pickle.load(f)
        else:
            print_log(f"[DATASET] caching FPS-subsampled clouds to {cache}",
                      logger="ModelNet")
            self.list_of_points, self.list_of_labels = [], []
            for name, path in self.datapath:
                cls = self.classes[name]
                point_set = np.loadtxt(path, delimiter=",").astype(np.float32)
                point_set = farthest_point_sample_np(point_set, self.npoints)
                self.list_of_points.append(point_set)
                self.list_of_labels.append(np.array([cls]).astype(np.int32))
            with open(cache, "wb") as f:
                pickle.dump((self.list_of_points, self.list_of_labels), f)

    def __len__(self):
        return len(self.list_of_labels)

    def __getitem__(self, idx):
        if self.synthetic:
            pts, label = synthetic_cloud(idx, self.npoints, self.num_category)
        else:
            point_set = self.list_of_points[idx][:, 0:3 if not self.use_normals else 6]
            label = int(self.list_of_labels[idx][0])
            pts = point_set.copy()
            pts[:, 0:3] = pc_normalize(pts[:, 0:3])
        if self.subset == "train":
            self.rng.shuffle(pts)
        return "ModelNet", "sample", (pts.astype(np.float32), label)


@DATASETS.register_module()
class ModelNetFewShot(_SyntheticMixin):
    def __init__(self, config):
        self.root = config.DATA_PATH
        self.npoints = config.N_POINTS
        self.subset = config.subset
        self.way = config.way
        self.shot = config.shot
        self.fold = config.fold
        if self.way <= 0 or self.shot <= 0 or self.fold < 0:
            raise RuntimeError("few-shot way/shot/fold must be set "
                               "(reference ModelNetDatasetFewShot.py:39-41)")
        pkl = os.path.join(self.root, f"{self.way}way_{self.shot}shot",
                           f"{self.fold}.pkl")
        if self._maybe_synthetic(pkl, "ModelNetFewShot"):
            per = self.shot if self.subset == "train" else 20
            self.dataset = []
            for w in range(self.way):
                for s in range(per):
                    pts, _ = synthetic_cloud(w * 131 + s, self.npoints, self.way)
                    self.dataset.append((pts, w, w))
            return
        with open(pkl, "rb") as f:
            self.dataset = pickle.load(f)[self.subset]

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        points, label, _ = self.dataset[idx]
        points = points[:, :3].astype(np.float32)
        points[:, 0:3] = pc_normalize(points[:, 0:3])
        return "ModelNetFewShot", "sample", (points, int(label))


class _ScanObjectNNBase(_SyntheticMixin):
    h5_name = "objectdataset.h5"
    NUM_CLASSES = 15

    def __init__(self, config):
        self.subset = config.subset
        self.root = config.ROOT
        self.npoints = 2048
        self.rng = np.random.default_rng(0)
        prefix = "training" if self.subset == "train" else "test"
        h5 = os.path.join(self.root, f"{prefix}_{self.h5_name}")
        if self._maybe_synthetic(h5, "ScanObjectNN"):
            self.points, self.labels = None, [
                i % self.NUM_CLASSES for i in range(self.synthetic_len)]
            return
        import h5py
        with h5py.File(h5, "r") as f:
            self.points = np.array(f["data"]).astype(np.float32)
            self.labels = np.array(f["label"]).astype(int)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx):
        if self.synthetic:
            pts, label = synthetic_cloud(idx, self.npoints, self.NUM_CLASSES)
        else:
            pts = self.points[idx].copy()
            label = int(self.labels[idx])
        if self.subset == "train":
            self.rng.shuffle(pts)
        return "ScanObjectNN", "sample", (pts.astype(np.float32), label)


@DATASETS.register_module()
class ScanObjectNN(_ScanObjectNNBase):
    h5_name = "objectdataset.h5"


@DATASETS.register_module()
class ScanObjectNN_hardest(_ScanObjectNNBase):
    h5_name = "objectdataset_augmentedrot_scale75.h5"
