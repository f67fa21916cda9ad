"""t-SNE feature-visualization runner (reference tools/runner_tsne.py).

Protocol parity with the reference tsne_net/tsne (:29-47, :74-151): build a
*pretrained* and a *finetuned* PointTransformer pair, FPS each test cloud to
npoints, extract [cls ‖ maxpool] features from both, report OA/mAcc from the
finetuned logits, embed the correctly-classified features with t-SNE (sklearn
here; the reference uses openTSNE) into two scatter plots, then run the
300x10-vote test on the finetuned model (:153-223).

The reference hardcodes its two ckpt paths (:36-38); here they come from
``config.ckpt_pretrained`` / ``config.ckpt_finetuned`` (or --ckpts for the
finetuned model). A single-model fallback (config.model only) is kept for
quick embedding runs.
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


def extract_features(model, variables, loader, npoints: int,
                     with_logits: bool = False):
    @jax.jit
    def feat_step(variables, pts):
        pts = ops.gather_points(pts, ops.furthest_point_sample(pts, npoints))
        feat = model.apply(variables, pts, method=model.extract_feature)
        if with_logits:
            return feat, model.apply(variables, pts)
        return feat

    feats, logits, labels = [], [], []
    for tax, mid, data in loader:
        pts, label = data
        out = feat_step(variables, jnp.asarray(pts))
        if with_logits:
            feats.append(np.asarray(out[0]))
            logits.append(np.asarray(out[1]))
        else:
            feats.append(np.asarray(out))
        labels.append(np.asarray(label))
    feats = np.concatenate(feats)
    labels = np.concatenate(labels)
    if with_logits:
        return feats, np.concatenate(logits), labels
    return feats, labels


def _build_and_load(model_cfg, ckpt_path, npoints, seed, logger):
    model = MODELS.build(model_cfg)
    key = jax.random.PRNGKey(seed or 0)
    rngs = dict(params=key, dropout=key, droppath=key, mask=key)
    variables = jax.jit(lambda: model.init(
        rngs, jnp.zeros((2, npoints, 3), jnp.float32)))()
    if ckpt_path:
        variables = ckpt_lib.merge_checkpoint_into(variables, ckpt_path,
                                                   logger=logger, tag="TSNE")
    return model, variables


def _plot(emb, labels, path, logger):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=8)
    ax.set_axis_off()
    fig.savefig(path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print_log(f"[TSNE] saved {path}", logger=logger)


def _embed(feats):
    from sklearn.manifold import TSNE
    return TSNE(n_components=2, init="pca", metric="cosine",
                perplexity=min(25, max(2, len(feats) // 4))).fit_transform(feats)


def tsne_net(args, config, max_batches=None):
    logger = args.log_name
    npoints = int(config.npoints)
    config.dataset.test.others.bs = config.total_bs
    _, test_loader = engine_builder.dataset_builder(args, config.dataset.test)
    root_key = set_random_seed(args.seed)

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

    dual = "model_pretrained" in config and "model_finetuned" in config
    if not dual:
        # single-model fallback
        model, variables = _build_and_load(
            config.model, getattr(args, "ckpts", None), npoints, args.seed,
            logger)
        feats, labels = extract_features(model, variables, loader, npoints)
        print_log(f"[TSNE] extracted {feats.shape} features", logger=logger)
        emb = _embed(feats)
        _plot(emb, labels, os.path.join(args.experiment_path, "tsne.png"),
              logger)
        return emb, labels

    # dual-model protocol (reference :29-47)
    ckpt_p = config.get("ckpt_pretrained", None)
    ckpt_f = config.get("ckpt_finetuned", None) or getattr(args, "ckpts", None)
    model_p, vars_p = _build_and_load(config.model_pretrained, ckpt_p,
                                      npoints, args.seed, logger)
    model_f, vars_f = _build_and_load(config.model_finetuned, ckpt_f,
                                      npoints, args.seed, logger)

    feats_p, labels = extract_features(model_p, vars_p, loader, npoints)
    feats_f, logits_f, _ = extract_features(model_f, vars_f, loader, npoints,
                                            with_logits=True)
    preds = np.argmax(logits_f, -1)
    correct = preds == labels
    oa = float(correct.mean()) * 100.0
    try:
        from sklearn.metrics import balanced_accuracy_score
        macc = balanced_accuracy_score(labels, preds) * 100.0
    except Exception:
        macc = float("nan")
    print_log(f"[TEST] OA={oa:.4f}  mAcc={macc:.4f}", logger=logger)

    # embed only the correctly-classified clouds (reference correct_bool)
    if correct.sum() >= 8:
        emb_p = _embed(feats_p[correct])
        emb_f = _embed(feats_f[correct])
        _plot(emb_p, labels[correct],
              os.path.join(args.experiment_path, "tsne_pretrained.png"), logger)
        _plot(emb_f, labels[correct],
              os.path.join(args.experiment_path, "tsne_finetuned.png"), logger)
    else:
        print_log("[TSNE] too few correct predictions to embed", logger=logger)
        emb_p = emb_f = None

    # 300x10-vote test on the finetuned model (reference :153-223)
    from act_tpu.engine.runner_finetune import make_vote_logits, validate_vote
    from act_tpu.engine.train_state import TrainState
    import optax
    state_f = TrainState.create(vars_f, optax.identity())
    rounds = 2 if max_batches is not None else 300
    vote_fn = make_vote_logits(model_f, npoints)
    best = 0.0
    for r in range(rounds):
        key = jax.random.fold_in(root_key, r)
        a = validate_vote(model_f, state_f, loader, npoints, key, logger,
                          times=10, vote_logits=vote_fn)
        best = max(best, a)
        print_log(f"[TEST_VOTE_time {r}]  OA={a:.4f}, best OA={best:.4f}",
                  logger=logger)
    print_log(f"[TEST_VOTE] OA={best:.4f}", logger=logger)
    return emb_p, emb_f
