"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's NCCL DistributedDataParallel stack
(utils/dist_utils.py, DDP wraps in tools/runner_*.py): a jax.sharding.Mesh with a
('data', 'model') axis pair. ACT's models are 384-dim — data parallelism is the only
parallelism that pays (SURVEY.md §2.4) — so 'model' defaults to 1, but every train
step is written against the 2-D mesh so tensor parallelism is a mesh-shape change,
not a code change. Gradient averaging happens implicitly: batches are sharded on
'data', params are replicated, and jit inserts the psum XLA lowers onto ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-local batch pytree onto the mesh, batch axis sharded.

    Single-process: a plain device_put. Multi-process: each process holds its
    local slice of the global batch (the loader already shards the index
    space), so local arrays are assembled into one global array across hosts.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P(DATA_AXIS)), batch)
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def shard_stacked(mesh: Mesh, batch):
    """Place a K-stacked multi-step batch pytree ((K, B, ...) leaves) onto the
    mesh: scan axis K replicated, batch axis B split across 'data'.

    Sharding the LEADING axis (plain shard_batch) would split the scan axis —
    each scanned step's whole batch would live on one device and GSPMD would
    reshard it to batch-parallel inside every loop iteration.
    """
    spec = P(None, DATA_AXIS)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, spec), batch)
    s = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def initialize_distributed():
    """Multi-host initialization (the analog of init_dist, utils/dist_utils.py:9-25).

    Under a multi-host TPU launcher (JAX_COORDINATOR_ADDRESS etc. set) this wires
    the processes together; single-host it is a no-op.
    """
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
