"""Native (C++) host-side point-cloud ops with build-on-first-use + numpy fallback.

Builds ``pointops.cpp`` into a shared library with g++ (-O3 -fopenmp) the first
time it's needed, caches the .so next to the source keyed by a source hash, and
exposes ctypes wrappers. Every function has a numpy fallback so the package works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pointops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"_pointops_{h}.so")


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    so = _so_path()
    if not os.path.exists(so):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
               _SRC, "-o", so + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except Exception:
            # retry without openmp (single-core container)
            try:
                subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                                _SRC, "-o", so + ".tmp"],
                               check=True, capture_output=True, timeout=120)
                os.replace(so + ".tmp", so)
            except Exception:
                _build_failed = True
                return None
    lib = ctypes.CDLL(so)
    i64, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.float32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.fps_batch.argtypes = [f32p, i64, i64, i64, i64p, f32p]
    lib.normalize_batch.argtypes = [f32p, i64, i64, i64]
    lib.knn_batch.argtypes = [f32p, f32p, i64, i64, i64, i64, i64p, f32p]
    lib.num_threads.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def fps(points: np.ndarray, n_samples: int) -> np.ndarray:
    """points: (N,3) or (B,N,3) float32 -> indices (S,) / (B,S) int64."""
    single = points.ndim == 2
    pts = np.ascontiguousarray(points[None] if single else points,
                               dtype=np.float32)
    B, N, _ = pts.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((B, n_samples), np.int64)
        ws = np.empty((B, N), np.float32)
        lib.fps_batch(pts.reshape(-1), B, N, n_samples, out.reshape(-1),
                      ws.reshape(-1))
    else:  # numpy fallback
        out = np.zeros((B, n_samples), np.int64)
        for b in range(B):
            d = np.full(N, np.inf, np.float32)
            last = 0
            for s in range(1, n_samples):
                dd = ((pts[b] - pts[b, last]) ** 2).sum(-1)
                np.minimum(d, dd, out=d)
                last = int(np.argmax(d))
                out[b, s] = last
    return out[0] if single else out


def normalize(points: np.ndarray) -> np.ndarray:
    """Unit-sphere normalize xyz in place-safe copy. (B,N,C>=3) or (N,C)."""
    single = points.ndim == 2
    pts = np.ascontiguousarray(points[None] if single else points,
                               dtype=np.float32).copy()
    B, N, C = pts.shape
    lib = get_lib()
    if lib is not None:
        lib.normalize_batch(pts.reshape(-1), B, N, C)
    else:
        c = pts[..., :3].mean(axis=1, keepdims=True)
        pts[..., :3] -= c
        m = np.linalg.norm(pts[..., :3], axis=-1).max(axis=1)
        pts[..., :3] /= (m[:, None, None] + 1e-12)
    return pts[0] if single else pts


def knn(ref: np.ndarray, query: np.ndarray, k: int
        ) -> Tuple[np.ndarray, np.ndarray]:
    """ref (B,N,3), query (B,Q,3) -> (sq dists (B,Q,k), idx (B,Q,k))."""
    ref = np.ascontiguousarray(ref, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    B, N, _ = ref.shape
    Q = query.shape[1]
    lib = get_lib()
    if lib is not None:
        idx = np.empty((B, Q, k), np.int64)
        dist = np.empty((B, Q, k), np.float32)
        lib.knn_batch(ref.reshape(-1), query.reshape(-1), B, N, Q, k,
                      idx.reshape(-1), dist.reshape(-1))
        return dist, idx
    d = ((query[:, :, None, :] - ref[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1)[..., :k]
    return np.take_along_axis(d, idx, axis=-1), idx
