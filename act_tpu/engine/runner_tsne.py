"""t-SNE feature-visualization runner (reference tools/runner_tsne.py).

Extracts [cls ‖ maxpool] features from a (pretrained and/or finetuned)
PointTransformer over the test set, embeds with t-SNE (sklearn; the reference uses
openTSNE) and saves a scatter plot colored by class.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from act_tpu import ops
from act_tpu.engine import builder as engine_builder
from act_tpu.engine import checkpoint as ckpt_lib
from act_tpu.models import MODELS
from act_tpu.utils.logger import print_log
from act_tpu.utils.misc import set_random_seed


def extract_features(model, variables, loader, npoints: int):
    @jax.jit
    def feat_step(variables, pts):
        pts = ops.gather_points(pts, ops.furthest_point_sample(pts, npoints))
        return model.apply(variables, pts, method=model.extract_feature)

    feats, labels = [], []
    for tax, mid, data in loader:
        pts, label = data
        feats.append(np.asarray(feat_step(variables, jnp.asarray(pts))))
        labels.append(np.asarray(label))
    return np.concatenate(feats), np.concatenate(labels)


def tsne_net(args, config, max_batches=None):
    logger = args.log_name
    npoints = int(config.npoints)
    config.dataset.test.others.bs = config.total_bs
    _, test_loader = engine_builder.dataset_builder(args, config.dataset.test)

    model = MODELS.build(config.model)
    root_key = set_random_seed(args.seed)
    rngs = dict(params=root_key, dropout=root_key, droppath=root_key,
                mask=root_key)
    variables = jax.jit(lambda: model.init(
        rngs, jnp.zeros((2, npoints, 3), jnp.float32)))()
    if getattr(args, "ckpts", None):
        payload = ckpt_lib.load_checkpoint(args.ckpts)
        merged = ckpt_lib.merge_pretrained(
            jax.device_get(variables["params"]),
            payload.get("params", payload), logger=logger)
        variables = {**variables, "params": merged}

    if max_batches is not None:
        batches = []
        it = iter(test_loader)
        for _ in range(max_batches):
            try:
                batches.append(next(it))
            except StopIteration:
                break
        loader = batches
    else:
        loader = test_loader
    feats, labels = extract_features(model, variables, loader, npoints)
    print_log(f"[TSNE] extracted {feats.shape} features", logger=logger)

    from sklearn.manifold import TSNE
    emb = TSNE(n_components=2, init="pca",
               perplexity=min(30, max(2, len(feats) // 4))).fit_transform(feats)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=8)
    ax.set_axis_off()
    out = os.path.join(args.experiment_path, "tsne.png")
    fig.savefig(out, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print_log(f"[TSNE] saved {out}", logger=logger)
    return emb, labels
