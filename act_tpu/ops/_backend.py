"""Kernel backend selection.

On TPU the Pallas kernels compile natively. On CPU (tests, dry runs) the pure-XLA
reference paths are used by default; setting ``ACT_TPU_PALLAS=interpret`` forces the
Pallas kernels through the interpreter so their logic is unit-testable off-TPU.
"""
from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """Returns 'tpu' (compile), 'interpret' (force interpreter), or 'off'."""
    env = os.environ.get("ACT_TPU_PALLAS", "").lower()
    if env == "interpret":
        return "interpret"
    if env == "off":
        return "off"
    if jax.default_backend() == "tpu":
        return "tpu"
    return "off"


def use_pallas() -> bool:
    return pallas_mode() != "off"


def interpret_flag() -> bool:
    return pallas_mode() == "interpret"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
