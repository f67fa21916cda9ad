"""Tensor-parallel parameter shardings over the 'model' mesh axis.

ACT's reference is data-parallel only (SURVEY.md §2.4); the rebuild keeps DP
as the default but makes TP a *real* config change: annotate the transformer
MLP weight pair megatron-style (fc1 column-split, fc2 row-split) and let
GSPMD insert the reduce-scatter/all-reduce on ICI. The ViT-B teacher's MLPs
are ~57M of its 86M params, so TP=2 halves the dominant replicated weight
block per chip. Activations and all other params stay replicated/data-sharded
— at 384-dim student scale nothing else pays for collectives.

Usage: ``state = shard_params_tp(state_or_params, mesh)`` after building the
variables and BEFORE optimizer init (optax moments inherit shardings from the
params they are zeros_like of). Enabled by ``--mesh_model_parallel N`` in the
runners and exercised by ``__graft_entry__.dryrun_multichip``'s 2-D leg.
"""
from __future__ import annotations

import jax
import jax.tree_util as jtu
from jax.sharding import NamedSharding, PartitionSpec as P

from act_tpu.parallel.mesh import MODEL_AXIS


def tp_spec_for_path(path: str) -> P:
    """Megatron transformer shardings.

    MLP pair: fc1/c_fc column-parallel, fc2/c_proj row-parallel. Attention:
    the fused qkv kernel (C, 3C) column-parallel on its output dim, the
    output proj kernel (C, C) row-parallel on its input dim — GSPMD inserts
    the single all-reduce after each row-parallel contraction, exactly the
    megatron schedule. Biases of column-parallel weights shard with their
    output dim; row-parallel biases stay replicated (added after the
    all-reduce)."""
    if "'mlp'" in path or "'c_fc'" in path or "'c_proj'" in path:
        if ("'fc1'" in path or "'c_fc'" in path) and "'kernel'" in path:
            return P(None, MODEL_AXIS)
        if ("'fc1'" in path or "'c_fc'" in path) and "'bias'" in path:
            return P(MODEL_AXIS)
        if ("'fc2'" in path or "'c_proj'" in path) and "'kernel'" in path:
            return P(MODEL_AXIS, None)
    if "'attn'" in path:
        if "'qkv'" in path and "'kernel'" in path:
            return P(None, MODEL_AXIS)
        if "'qkv'" in path and "'bias'" in path:
            return P(MODEL_AXIS)
        if "'proj'" in path and "'kernel'" in path:
            return P(MODEL_AXIS, None)
    return P()


def tp_param_shardings(params, mesh):
    """NamedSharding pytree for ``params`` (replicated when model axis = 1).

    Specs from tp_spec_for_path describe the TRAILING (in/out feature) dims;
    scanned transformer stacks carry a leading depth axis, padded with None
    so the same rules shard both layouts."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jtu.tree_map(lambda _: NamedSharding(mesh, P()), params)

    def spec(path, leaf):
        s = tp_spec_for_path(jtu.keystr(path))
        if len(s) and leaf.ndim > len(s):
            s = P(*([None] * (leaf.ndim - len(s)) + list(s)))
        return NamedSharding(mesh, s)
    return jtu.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh):
    """device_put the param tree with TP shardings (no-op layout when the
    model axis is 1 — plain replication)."""
    sh = tp_param_shardings(params, mesh)
    return jtu.tree_map(jax.device_put, params, sh)
