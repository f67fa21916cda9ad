"""Model FLOPs/params report (reference tools/get_flops.py, mmcv-based there).

Uses XLA's own cost analysis of the compiled forward: run
``python tools/get_flops.py --config cfgs/finetune_classification/full/finetune_modelnet.yaml``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# cost analysis is backend-independent; run on CPU so the tool works without a
# (possibly remote) accelerator attached
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--npoints", type=int, default=1024)
    args = parser.parse_args()

    from act_tpu.utils.config import cfg_from_yaml_file
    from act_tpu.models import MODELS
    config = cfg_from_yaml_file(args.config)
    model = MODELS.build(config.model)
    pts = jnp.zeros((1, args.npoints, 3), jnp.float32)
    k = jax.random.PRNGKey(0)
    rngs = dict(params=k, gumbel=k, mask=k, dropout=k, droppath=k)
    variables = jax.jit(lambda: model.init(rngs, pts))()

    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(variables["params"]))

    lowered = jax.jit(lambda v, p: model.apply(v, p, rngs=rngs)).lower(
        variables, pts)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    print(f"Model:  {config.model.NAME}")
    print(f"Input:  (1, {args.npoints}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs:  {flops / 1e9:.2f} GFLOPs (XLA cost analysis, fwd)")


if __name__ == "__main__":
    main()
