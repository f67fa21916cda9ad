"""Host->device batch compression (``--h2d_dtype i16``).

On bandwidth-starved links (a tunneled chip at ~35MB/s, a congested PCIe/NIC)
the training batch transfer bounds sustained throughput: the Stage-II scan
window is 12.6MB f32, the finetune window 25MB. Shipping coordinates as int16
halves the bytes; the dequantize runs as the first (fused) op inside the
jitted step. Quantization error is ``scale / 32767`` absolute — 3.1e-5 for
unit-sphere clouds (every pretrain dataset path pc_normalizes), and max|x|-
relative for raw-coordinate datasets (ScanObjectNN) via the dynamic scale.

Opt-in: the f32 default preserves bit-parity with the reference pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_Q = 32767.0


def quantize_i16(x, scale: float | None = None):
    """Quantize a host batch to int16. Returns ``(q, scale)`` with ``scale``
    a ``np.float32`` (max|x| when not given; pass 1.0 for unit-sphere data
    to skip the host max-reduction and ship no per-window state)."""
    x = np.asarray(x)
    if scale is None:
        scale = max(float(np.abs(x).max()), 1e-12)
    q = np.clip(np.rint(x * (_Q / scale)), -32768, 32767).astype(np.int16)
    return q, np.float32(scale)


def dequantize_i16(q, scale=1.0):
    """Inverse of :func:`quantize_i16`; traced (in-jit) form."""
    s = jnp.asarray(scale, jnp.float32) * jnp.float32(1.0 / _Q)
    return q.astype(jnp.float32) * s
