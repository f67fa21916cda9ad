"""Segmentation datasets: ShapeNetPart (PartNormalDataset), S3DIS blocks, and the
whole-scene sliding-window eval dataset.

Reference parity: part_segmentation/dataset.py:64-163 (category txt files + json
splits, random-choice resample), semantic_segmentation/dataset.py:72-148 (room .npy
xyzrgbl, 1m^2 random block crop with >1024-point retry, inverse-frequency
labelweights ^(1/3)), and ScannetDatasetWholeScene (:150+) for sliding-window vote
eval. Synthetic fallback serves procedurally part-labeled clouds when the archives
are absent.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from act_tpu.datasets.build import DATASETS
from act_tpu.datasets.pointcloud_datasets import pc_normalize, _SyntheticMixin
from act_tpu.utils.logger import print_log

SEG_CLASSES = {
    "Earphone": [16, 17, 18], "Motorbike": [30, 31, 32, 33, 34, 35],
    "Rocket": [41, 42, 43], "Car": [8, 9, 10, 11], "Laptop": [28, 29],
    "Cap": [6, 7], "Skateboard": [44, 45, 46], "Mug": [36, 37],
    "Guitar": [19, 20, 21], "Bag": [4, 5], "Lamp": [24, 25, 26, 27],
    "Table": [47, 48, 49], "Airplane": [0, 1, 2, 3], "Pistol": [38, 39, 40],
    "Chair": [12, 13, 14, 15], "Knife": [22, 23],
}
NUM_PART_CLASSES = 50
NUM_SHAPE_CATEGORIES = 16
S3DIS_NUM_CLASSES = 13


def _synthetic_part_sample(index: int, npoints: int):
    """Cloud with geometric 'parts': split along axes by category's part count."""
    from act_tpu.datasets.synthetic import synthetic_cloud
    cats = sorted(SEG_CLASSES)
    cat = cats[index % NUM_SHAPE_CATEGORIES]
    cls = sorted(SEG_CLASSES).index(cat)
    pts, _ = synthetic_cloud(index, npoints, NUM_SHAPE_CATEGORIES)
    parts = SEG_CLASSES[cat]
    # assign part label by z-slice
    z = pts[:, 2]
    edges = np.quantile(z, np.linspace(0, 1, len(parts) + 1)[1:-1])
    seg = parts[0] + np.searchsorted(edges, z)
    return pts.astype(np.float32), cls, seg.astype(np.int64)


class PartNormalDataset(_SyntheticMixin):
    def __init__(self, root: str, npoints: int = 2048, split: str = "train",
                 class_choice=None, normal_channel: bool = False):
        self.npoints = npoints
        self.root = root
        self.normal_channel = normal_channel
        self.split = split
        self.rng = np.random.default_rng(0)
        self.cache = {}

        if self._maybe_synthetic(os.path.join(root, "synsetoffset2category.txt"),
                                 "ShapeNetPart"):
            self.datapath = [("synthetic", i) for i in range(self.synthetic_len)]
            self.classes = {c: i for i, c in enumerate(sorted(SEG_CLASSES))}
            self.seg_classes = SEG_CLASSES
            return

        self.catfile = os.path.join(self.root, "synsetoffset2category.txt")
        self.cat = {}
        with open(self.catfile) as f:
            for line in f:
                ls = line.strip().split()
                self.cat[ls[0]] = ls[1]
        self.classes_original = dict(zip(self.cat, range(len(self.cat))))
        if class_choice is not None:
            self.cat = {k: v for k, v in self.cat.items() if k in class_choice}

        def load_ids(name):
            with open(os.path.join(self.root, "train_test_split", name)) as f:
                return set(str(d.split("/")[2]) for d in json.load(f))
        train_ids = load_ids("shuffled_train_file_list.json")
        val_ids = load_ids("shuffled_val_file_list.json")
        test_ids = load_ids("shuffled_test_file_list.json")

        self.datapath = []
        for item in self.cat:
            dir_point = os.path.join(self.root, self.cat[item])
            fns = sorted(os.listdir(dir_point))
            if split == "trainval":
                keep = lambda fn: fn[0:-4] in train_ids or fn[0:-4] in val_ids
            elif split == "train":
                keep = lambda fn: fn[0:-4] in train_ids
            elif split == "val":
                keep = lambda fn: fn[0:-4] in val_ids
            else:
                keep = lambda fn: fn[0:-4] in test_ids
            for fn in fns:
                if keep(fn):
                    self.datapath.append((item, os.path.join(dir_point, fn)))
        self.classes = {k: self.classes_original[k] for k in self.cat}
        self.seg_classes = SEG_CLASSES

    def __len__(self):
        return len(self.datapath)

    def __getitem__(self, index):
        if self.synthetic:
            pts, cls, seg = _synthetic_part_sample(index, self.npoints)
            return pts, cls, seg
        if index in self.cache:
            point_set, cls, seg = self.cache[index]
        else:
            cat, fn = self.datapath[index]
            cls = self.classes[cat]
            data = np.loadtxt(fn).astype(np.float32)
            point_set = data[:, 0:6] if self.normal_channel else data[:, 0:3]
            seg = data[:, -1].astype(np.int64)
            if len(self.cache) < 20000:
                self.cache[index] = (point_set, cls, seg)
        point_set = point_set.copy()
        point_set[:, 0:3] = pc_normalize(point_set[:, 0:3])
        choice = self.rng.choice(len(seg), self.npoints, replace=True)
        return point_set[choice], cls, seg[choice]


class S3DISDataset(_SyntheticMixin):
    def __init__(self, split: str = "train", data_root: str = "trainval_fullarea",
                 num_point: int = 2048, test_area: int = 5,
                 block_size: float = 1.0, sample_rate: float = 1.0):
        self.num_point = num_point
        self.block_size = block_size
        self.split = split
        self.rng = np.random.default_rng(0)

        if self._maybe_synthetic(data_root, "S3DIS"):
            self.labelweights = np.ones(S3DIS_NUM_CLASSES, np.float32)
            self.room_idxs = np.zeros(self.synthetic_len, np.int64)
            return

        rooms = sorted(r for r in os.listdir(data_root) if "Area_" in r)
        if split == "train":
            rooms = [r for r in rooms if f"Area_{test_area}" not in r]
        else:
            rooms = [r for r in rooms if f"Area_{test_area}" in r]

        self.room_points, self.room_labels = [], []
        self.room_coord_min, self.room_coord_max = [], []
        num_point_all = []
        labelweights = np.zeros(S3DIS_NUM_CLASSES)
        for room_name in rooms:
            room_data = np.load(os.path.join(data_root, room_name))  # N x 7
            points, labels = room_data[:, 0:6], room_data[:, 6]
            tmp, _ = np.histogram(labels, range(S3DIS_NUM_CLASSES + 1))
            labelweights += tmp
            self.room_points.append(points)
            self.room_labels.append(labels)
            self.room_coord_min.append(points[:, :3].min(0))
            self.room_coord_max.append(points[:, :3].max(0))
            num_point_all.append(labels.size)
        labelweights = labelweights.astype(np.float32)
        labelweights = labelweights / labelweights.sum()
        self.labelweights = np.power(labelweights.max() / labelweights, 1 / 3.0)
        sample_prob = np.asarray(num_point_all) / np.sum(num_point_all)
        num_iter = int(np.sum(num_point_all) * sample_rate / num_point)
        room_idxs = []
        for index in range(len(rooms)):
            room_idxs.extend([index] * int(round(sample_prob[index] * num_iter)))
        self.room_idxs = np.array(room_idxs)
        print_log(f"[S3DIS] {len(self.room_idxs)} samples in {split}",
                  logger="S3DIS")

    def __len__(self):
        return len(self.room_idxs)

    def __getitem__(self, idx):
        if self.synthetic:
            from act_tpu.datasets.synthetic import synthetic_cloud
            pts, _ = synthetic_cloud(idx, self.num_point, S3DIS_NUM_CLASSES)
            z = pts[:, 2]
            edges = np.quantile(z, np.linspace(0, 1, S3DIS_NUM_CLASSES + 1)[1:-1])
            labels = np.searchsorted(edges, z)
            return pts.astype(np.float32), labels.astype(np.int64)
        room_idx = self.room_idxs[idx]
        points = self.room_points[room_idx]
        labels = self.room_labels[room_idx]
        N = points.shape[0]
        while True:
            center = points[self.rng.choice(N)][:3]
            bmin = center - [self.block_size / 2, self.block_size / 2, 0]
            bmax = center + [self.block_size / 2, self.block_size / 2, 0]
            idxs = np.where((points[:, 0] >= bmin[0]) & (points[:, 0] <= bmax[0])
                            & (points[:, 1] >= bmin[1])
                            & (points[:, 1] <= bmax[1]))[0]
            if idxs.size > 1024:
                break
        sel = self.rng.choice(idxs, self.num_point,
                              replace=idxs.size < self.num_point)
        selected = points[sel].copy()
        selected[:, 0] -= center[0]
        selected[:, 1] -= center[1]
        return selected[:, :3].astype(np.float32), labels[sel].astype(np.int64)


class WholeSceneDataset(_SyntheticMixin):
    """Sliding-window whole-scene evaluation blocks (reference
    ScannetDatasetWholeScene, semantic_segmentation/dataset.py:150+,
    used by main_test.py for the voted S3DIS Area-5 eval)."""

    def __init__(self, root: str, num_point: int = 2048, test_area: int = 5,
                 stride: float = 0.5, block_size: float = 1.0,
                 padding: float = 0.001):
        self.num_point = num_point
        self.block_size = block_size
        self.stride = stride
        self.padding = padding
        self.rng = np.random.default_rng(0)
        if self._maybe_synthetic(root, "S3DIS-wholescene"):
            self.scene_points, self.semantic_labels = [], []
            from act_tpu.datasets.synthetic import synthetic_cloud
            for i in range(2):
                pts, _ = synthetic_cloud(i, 8192, S3DIS_NUM_CLASSES)
                pts = (pts + 1.0) * 2.0  # spread into a 4m 'room'
                z = pts[:, 2]
                edges = np.quantile(z, np.linspace(0, 1, S3DIS_NUM_CLASSES + 1)[1:-1])
                self.scene_points.append(pts.astype(np.float32))
                self.semantic_labels.append(np.searchsorted(edges, z))
            self.labelweights = np.ones(S3DIS_NUM_CLASSES, np.float32)
            return
        rooms = sorted(r for r in os.listdir(root)
                       if "Area_" in r and f"Area_{test_area}" in r)
        self.scene_points, self.semantic_labels = [], []
        labelweights = np.zeros(S3DIS_NUM_CLASSES)
        for room in rooms:
            data = np.load(os.path.join(root, room))
            self.scene_points.append(data[:, :3].astype(np.float32))
            self.semantic_labels.append(data[:, 6].astype(np.int64))
            tmp, _ = np.histogram(data[:, 6], range(S3DIS_NUM_CLASSES + 1))
            labelweights += tmp
        labelweights = labelweights.astype(np.float32) / labelweights.sum()
        self.labelweights = np.power(labelweights.max() / labelweights, 1 / 3.0)

    def __len__(self):
        return len(self.scene_points)

    def blocks_for_scene(self, index):
        """Yield (points (num_point,3) block-centered, labels, original point idx)."""
        points = self.scene_points[index]
        labels = self.semantic_labels[index]
        coord_min, coord_max = points.min(0), points.max(0)
        grid_x = int(np.ceil((coord_max[0] - coord_min[0] - self.block_size)
                             / self.stride)) + 1
        grid_y = int(np.ceil((coord_max[1] - coord_min[1] - self.block_size)
                             / self.stride)) + 1
        for ix in range(grid_x):
            for iy in range(grid_y):
                sx = coord_min[0] + ix * self.stride
                sy = coord_min[1] + iy * self.stride
                ex, ey = sx + self.block_size, sy + self.block_size
                m = ((points[:, 0] >= sx - self.padding)
                     & (points[:, 0] <= ex + self.padding)
                     & (points[:, 1] >= sy - self.padding)
                     & (points[:, 1] <= ey + self.padding))
                idxs = np.where(m)[0]
                if idxs.size == 0:
                    continue
                # cover EVERY point in the window: shuffle, pad to a multiple of
                # num_point, then emit fixed-size chunks (the reference's
                # ScannetDatasetWholeScene batching scheme)
                shuffled = self.rng.permutation(idxs)
                pad = (-len(shuffled)) % self.num_point
                if pad:
                    shuffled = np.concatenate(
                        [shuffled, self.rng.choice(idxs, pad)])
                for c in range(len(shuffled) // self.num_point):
                    sel = shuffled[c * self.num_point:(c + 1) * self.num_point]
                    block = points[sel].copy()
                    block[:, 0] -= (sx + self.block_size / 2)
                    block[:, 1] -= (sy + self.block_size / 2)
                    yield block.astype(np.float32), labels[sel], sel
