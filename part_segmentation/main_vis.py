"""Visualize part-segmentation predictions (reference part_segmentation/main_vis.py).

Runs the model over test shapes and saves per-shape txt files (xyz + gt + pred)
plus rendered images colored by predicted part.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser("part segmentation visualization")
    parser.add_argument("--npoint", type=int, default=2048)
    parser.add_argument("--num_group", type=int, default=128)
    parser.add_argument("--ckpts", type=str, default=None)
    parser.add_argument("--root", type=str,
                        default="data/shapenetcore_partanno_segmentation_benchmark_v0_normal")
    parser.add_argument("--out", type=str, default="./work_dirs/part_seg/vis")
    parser.add_argument("--num_shapes", type=int, default=8)
    parser.add_argument("--smoke", action="store_true")
    return parser.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out, exist_ok=True)
    import jax
    import jax.numpy as jnp
    from act_tpu.utils.config import ConfigDict
    from act_tpu.models import MODELS
    from act_tpu.engine import checkpoint as ckpt_lib
    from act_tpu.datasets.segmentation_datasets import (PartNormalDataset,
                                                        SEG_CLASSES,
                                                        NUM_PART_CLASSES,
                                                        NUM_SHAPE_CATEGORIES)
    from act_tpu.utils.misc import get_ptcloud_img

    npoints = 256 if args.smoke else args.npoint
    ds = PartNormalDataset(args.root, npoints, split="test")
    cfg = ConfigDict(dict(NAME="PartSegTransformer", cls_dim=NUM_PART_CLASSES,
                          num_group=16 if args.smoke else args.num_group,
                          group_size=8 if args.smoke else 32))
    model = MODELS.build(cfg)
    key = jax.random.PRNGKey(0)
    rngs = dict(params=key, dropout=key, droppath=key)
    variables = jax.jit(lambda: model.init(
        rngs, jnp.zeros((1, npoints, 3), jnp.float32),
        jnp.zeros((1, NUM_SHAPE_CATEGORIES), jnp.float32)))()
    if args.ckpts:
        payload = ckpt_lib.load_checkpoint(args.ckpts)
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}

    @jax.jit
    def infer(variables, pts, one_hot):
        return model.apply(variables, pts, one_hot)

    n = min(args.num_shapes, len(ds)) if not args.smoke else 2
    for i in range(n):
        pts, cls, seg = ds[i]
        one_hot = np.eye(NUM_SHAPE_CATEGORIES, dtype=np.float32)[cls]
        logits = np.asarray(infer(variables, jnp.asarray(pts[None, :, :3]),
                                  jnp.asarray(one_hot[None])))[0]
        cat = sorted(SEG_CLASSES)[cls]
        part_range = SEG_CLASSES[cat]
        pred = np.asarray(part_range)[logits[:, part_range].argmax(-1)]
        out = np.concatenate([pts[:, :3], seg[:, None], pred[:, None]], axis=1)
        np.savetxt(os.path.join(args.out, f"{cat}_{i:03d}.txt"), out,
                   fmt="%.6f")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.imsave(os.path.join(args.out, f"{cat}_{i:03d}.jpg"),
                       get_ptcloud_img(pts[:, :3]))
        except Exception:
            pass
        acc = float((pred == seg).mean())
        print(f"{cat}_{i:03d}: acc={acc:.3f} saved")


if __name__ == "__main__":
    main()
