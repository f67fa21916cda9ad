"""File readers: .npy / .h5 / .txt point clouds (reference datasets/io.py:6-42)."""
from __future__ import annotations

import os

import numpy as np


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
        return np.load(file_path)

    @classmethod
    def _read_h5(cls, file_path: str) -> np.ndarray:
        import h5py
        with h5py.File(file_path, "r") as f:
            return f["data"][()]

    @classmethod
    def _read_txt(cls, file_path: str) -> np.ndarray:
        return np.loadtxt(file_path, delimiter=",")
