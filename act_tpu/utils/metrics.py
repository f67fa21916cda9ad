"""Reconstruction metrics: F-Score@threshold, CDL1/CDL2 (reference utils/metrics.py).

Differences from the reference: the F-score's point-cloud distances come from our
own XLA nearest-neighbor op instead of open3d (utils/metrics.py:57-76 uses
open3d.geometry.PointCloud.compute_point_cloud_distance); values agree to float
precision.
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from act_tpu import ops


class Metrics:
    ITEMS = [
        {"name": "F-Score", "eval_func": "_get_f_score", "is_greater_better": True,
         "init_value": 0.0},
        {"name": "CDL1", "eval_func": "_get_chamfer_distancel1",
         "is_greater_better": False, "init_value": 32767.0},
        {"name": "CDL2", "eval_func": "_get_chamfer_distancel2",
         "is_greater_better": False, "init_value": 32767.0},
    ]

    @classmethod
    def names(cls) -> List[str]:
        return [i["name"] for i in cls.ITEMS]

    @classmethod
    def get(cls, pred, gt) -> List[float]:
        return [getattr(cls, item["eval_func"])(pred, gt) for item in cls.ITEMS]

    @staticmethod
    def _get_f_score(pred, gt, th: float = 0.01) -> float:
        """F-Score at distance threshold (reference utils/metrics.py:57-76)."""
        pred = jnp.asarray(pred)[None] if np.ndim(pred) == 2 else jnp.asarray(pred)
        gt = jnp.asarray(gt)[None] if np.ndim(gt) == 2 else jnp.asarray(gt)
        d1, d2 = ops.chamfer_distances(pred, gt)  # squared
        d1, d2 = np.sqrt(np.asarray(d1)), np.sqrt(np.asarray(d2))
        recall = float((d2 < th).mean())
        precision = float((d1 < th).mean())
        return 2 * recall * precision / (recall + precision) if (
            recall + precision) else 0.0

    @staticmethod
    def _get_chamfer_distancel1(pred, gt) -> float:
        pred = jnp.asarray(pred)[None] if np.ndim(pred) == 2 else jnp.asarray(pred)
        gt = jnp.asarray(gt)[None] if np.ndim(gt) == 2 else jnp.asarray(gt)
        return float(ops.chamfer_distance_l1(pred, gt)) * 1000.0

    @staticmethod
    def _get_chamfer_distancel2(pred, gt) -> float:
        pred = jnp.asarray(pred)[None] if np.ndim(pred) == 2 else jnp.asarray(pred)
        gt = jnp.asarray(gt)[None] if np.ndim(gt) == 2 else jnp.asarray(gt)
        return float(ops.chamfer_distance_l2(pred, gt)) * 1000.0

    def __init__(self, metric_name: str, values):
        self._items = Metrics.items()
        self._values = [item["init_value"] for item in self._items]
        self.metric_name = metric_name
        if isinstance(values, list):
            self._values = values
        elif isinstance(values, dict):
            for k, v in values.items():
                if k in self.names():
                    self._values[self.names().index(k)] = v
        elif isinstance(values, Metrics):
            self._values = list(values._values)

    @classmethod
    def items(cls):
        return cls.ITEMS

    def state_dict(self) -> Dict[str, float]:
        return dict(zip(self.names(), self._values))

    def better_than(self, other: "Metrics") -> bool:
        if other is None:
            return True
        i = self.names().index(self.metric_name)
        _value = self._values[i]
        other_value = other._values[i]
        if self.ITEMS[i]["is_greater_better"]:
            return _value > other_value
        return _value < other_value
