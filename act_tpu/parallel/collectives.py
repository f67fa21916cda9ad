"""Host-level collective helpers for eval/logging.

The analogs of the reference's explicit collectives (utils/dist_utils.py):
``reduce_mean_scalar`` ≡ reduce_tensor (all-reduce SUM / world, :41-48);
``gather_concat`` ≡ gather_tensor (all-gather + concat along batch, :50-54).
In-step gradient reduction needs none of this — jit over the mesh handles it;
these are for host-side python (eval metrics, SVM features) in multi-process runs.
"""
from __future__ import annotations

import jax
import numpy as np


def reduce_mean_scalar(value: float) -> float:
    """Mean of a python scalar across processes."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray([value], np.float64))
    return float(np.mean(arr))


def gather_concat(array: np.ndarray) -> np.ndarray:
    """Concatenate per-process arrays along axis 0 (eval predictions/features)."""
    if jax.process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils
    out = multihost_utils.process_allgather(np.asarray(array))
    return np.concatenate(list(out), axis=0)
