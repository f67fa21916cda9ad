"""Kernel backend selection.

On TPU the Pallas kernels compile natively. On CPU (tests, dry runs) the pure-XLA
reference paths are used by default; setting ``ACT_TPU_PALLAS=interpret`` forces the
Pallas kernels through the interpreter so their logic is unit-testable off-TPU.
"""
from __future__ import annotations

import contextlib
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


@contextlib.contextmanager
def pallas_override(mode: str):
    """Scope ``ACT_TPU_PALLAS`` to ``mode`` ('off'/'interpret') while tracing.

    Used by export (engine/export.py): symbolic-shape and cross-platform
    artifacts must trace the pure-XLA reference ops. Only affects functions
    traced inside the scope — already-compiled programs are untouched."""
    old = os.environ.get("ACT_TPU_PALLAS")
    os.environ["ACT_TPU_PALLAS"] = mode
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("ACT_TPU_PALLAS", None)
        else:
            os.environ["ACT_TPU_PALLAS"] = old


def interpret_flag() -> bool:
    return pallas_mode() == "interpret"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Multi-chip partitioning of Pallas kernels.
#
# A pallas_call is an opaque custom-call to GSPMD: with batch-sharded inputs
# the SPMD partitioner conservatively all-gathers them and runs the full
# kernel on every chip. All kernels here are batch-parallel (grid over rows /
# batch items), so the step factories activate ``kernel_mesh(mesh)`` while
# tracing and the op dispatchers run the kernels under ``shard_map`` over the
# 'data' axis — each chip runs its own shard, no collectives. Single-device
# meshes (and the CPU reference paths) are unaffected.
# ---------------------------------------------------------------------------

_MESH_STACK = [None]


@contextlib.contextmanager
def kernel_mesh(mesh):
    """Activate ``mesh`` for Pallas-kernel sharding while tracing a step."""
    _MESH_STACK.append(mesh)
    try:
        yield
    finally:
        _MESH_STACK.pop()


def set_default_kernel_mesh(mesh):
    """Set the process-default mesh (stack base). Runners call this once
    after building their mesh so the ad-hoc eval/infer jits (probe feat_step,
    vote logits, whole-scene eval...) — not just the step factories — shard
    their Pallas kernels on multi-chip meshes."""
    _MESH_STACK[0] = mesh


def current_kernel_mesh():
    """The active mesh, or None when kernels should run unsharded (no mesh,
    or a single-device 'data' axis). A mesh without a 'data' axis counts as
    unsharded; anything else malformed should raise, not silently disable
    kernel sharding."""
    m = _MESH_STACK[-1]
    if m is None or m.shape.get("data", 1) <= 1:
        return None
    return m


def shard_over_batch(mesh, fn, *args):
    """Run ``fn`` under shard_map with every arg/output sharded on dim 0 over
    the 'data' axis. Falls back to the unsharded call when the batch does not
    divide the axis (e.g. ragged eval remainders)."""
    n = mesh.shape["data"]
    if any(a.shape[0] % n != 0 for a in args):
        return fn(*args)
    from jax.sharding import PartitionSpec
    from jax import shard_map
    spec = PartitionSpec("data")
    return shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec,
                     check_vma=False)(*args)
