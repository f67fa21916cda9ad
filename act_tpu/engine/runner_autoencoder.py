"""Stage-I dVAE autoencoder runner (reference tools/runner_autoencoder.py).

Train: Gumbel temperature cosine anneal 1 -> 0.0625 over 100k iters (get_temp,
:42-53), KLD-weight cosine ramp 0 -> 0.1 starting after a 10k-iter delay
(compute_loss, :18-40), Chamfer-L1 recon + weighted KLD; grad clip. Validation:
per-taxonomy CDL1/CDL2/F-Score table on whole-cloud reconstructions, ckpt-best on
``consider_metric`` (CDL1).
"""
from __future__ import annotations

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from act_tpu.datasets import transforms as T
from act_tpu.engine import builder as engine_builder
from act_tpu.engine import checkpoint as ckpt_lib
from act_tpu.engine.train_state import (TrainState, make_autoencoder_step,
                                        make_multi_step)
from act_tpu.models import MODELS
from act_tpu.ops._backend import set_default_kernel_mesh
from act_tpu.parallel import make_mesh, shard_batch, shard_stacked
from act_tpu.utils import AverageMeter
from act_tpu.utils.logger import print_log
from act_tpu.utils.metrics import Metrics
from act_tpu.utils.misc import bn_update_ratio, set_random_seed, cosine_anneal


def get_temp(config, n_itr: int) -> float:
    """Temperature anneal (reference :42-53)."""
    t = config.get("temp")
    if t is None:
        return 1.0
    return cosine_anneal(n_itr, float(t.start), float(t.target), int(t.ntime))


def get_kld_weight(config, n_itr: int) -> float:
    """KLD weight ramp with 10k-iter delay (reference compute_loss :18-40)."""
    k = config.get("kldweight")
    if k is None:
        return 0.0
    delay = 10000
    if n_itr < delay:
        return 0.0
    return cosine_anneal(n_itr - delay, float(k.start), float(k.target),
                         int(k.ntime))


def load_teacher_weights(variables, model_cfg, logger=None):
    """Load the pretrained 2D transformer into the teacher backbone.

    The reference downloads timm/HF weights at build time (models/dvae.py:405);
    this environment has no egress, so weights come from a local file named by
    ``model_cfg.teacher_ckpt``: a raw timm/torch state dict (.pth, converted by
    torch_convert.load_timm_vit) or an orbax dir holding a converted dVAE.
    Missing file -> loud warning (the cross-modal-teacher premise needs it).
    """
    import os
    if not model_cfg.get("visual_embed_type"):
        return variables
    path = model_cfg.get("teacher_ckpt")
    if not path or not os.path.exists(str(path)):
        print_log("[AUTOENCODER][WARNING] no teacher_ckpt provided/found — the "
                  f"frozen '{model_cfg.get('visual_embed_type')}' teacher is "
                  "RANDOMLY INITIALIZED (set model.teacher_ckpt to a local "
                  "timm .pth to reproduce the reference)", logger=logger)
        return variables
    params = jax.device_get(variables["params"])
    if str(path).endswith(".pth"):
        from act_tpu.engine import torch_convert as tc
        sd = tc.load_torch_state_dict(str(path), key="model")
        loaded, _ = tc.load_timm_vit(sd, dst="visual_embed", logger=logger)
        loaded = loaded.get("visual_embed", {})
    else:
        payload = ckpt_lib.load_checkpoint(str(path))
        loaded = payload.get("params", payload).get("visual_embed", {})
    params["visual_embed"] = ckpt_lib.merge_pretrained(
        params["visual_embed"], loaded, logger=logger)
    print_log(f"[AUTOENCODER] loaded teacher weights from {path}", logger=logger)
    return {**variables, "params": params}


def _apply_smoke(config):
    config.max_epoch = 1
    config.total_bs = 8
    m = config.model
    m.encoder_dims = 32
    m.tokens_dims = 32
    m.decoder_dims = 32
    m.num_tokens = 64
    if "visual_embed_dim" in m:
        m.visual_embed_dim = 48
        m.visual_embed_depth = 2
        m.visual_embed_heads = 4
        m.num_prompt_token = 4
    for split in config.dataset.values():
        split.others.npoints = min(int(split.others.get("npoints", 1024)), 256)
    config.npoints = min(int(config.npoints), 256)
    return config


def run_net(args, config, train_writer=None, val_writer=None):
    logger = args.log_name
    smoke = bool(getattr(args, "smoke", False))
    if smoke:
        config = _apply_smoke(config)
    mesh = make_mesh(model_parallel=getattr(args, "mesh_model_parallel", 1))
    set_default_kernel_mesh(mesh)  # shard Pallas kernels in ad-hoc eval jits too

    config.dataset.train.others.bs = config.total_bs
    config.dataset.val.others.bs = 1  # reference forces val bs=1 (main_autoencoder.py:46-47)
    _, train_loader = engine_builder.dataset_builder(args, config.dataset.train)
    _, val_loader = engine_builder.dataset_builder(args, config.dataset.val)
    steps_per_epoch = max(len(train_loader), 1)

    model = MODELS.build(config.model)
    npoints = int(config.dataset.train.others.npoints)
    root_key = set_random_seed(args.seed)  # rank-shifted: data/gumbel streams
    init_key = jax.random.PRNGKey(args.seed or 0)  # identical across processes
    sample = jnp.zeros((2, npoints, 3), jnp.float32)
    init_rngs = dict(params=init_key, gumbel=init_key, dropout=init_key,
                     droppath=init_key, mask=init_key)
    variables = jax.jit(lambda: model.init(init_rngs, sample))()

    variables = load_teacher_weights(variables, config.model, logger)

    frozen = []
    if config.model.get("freeze_visual_embed", False):
        # freeze ONLY the teacher backbone blocks/norm — prompts/proj/pos stay
        # trainable (reference dvae.py:441-444 freezes visual_embed.parameters(),
        # i.e. the timm blocks+norm submodule only)
        frozen = [f"visual_embed']['blocks_", "visual_embed']['norm"]
    trainable = engine_builder.freeze_mask_from_paths(variables["params"], frozen)
    if frozen and bool(config.model.get("frozen_bf16", True)):
        # frozen ViT backbone matmul weights in bf16 — no per-use f32->bf16
        # casts, half the HBM weight reads (mirrors runner_pretrain; norm and
        # 1-D params stay f32; trainable prompts/proj/pos untouched)
        variables = {**variables, "params": engine_builder.cast_frozen_bf16(
            variables["params"], ["visual_embed']['blocks_"])}
    # TP weight shardings over the 'model' axis (no-op replication at
    # --mesh_model_parallel 1) — BEFORE optimizer init so moments inherit
    from act_tpu.parallel.tp import shard_params_tp
    variables = {**variables,
                 "params": shard_params_tp(variables["params"], mesh)}
    tx, schedule = engine_builder.build_optimizer(
        config, variables["params"], steps_per_epoch,
        trainable if frozen else None)
    bnm = engine_builder.build_bnm_schedule(config)
    state = TrainState.create(variables, tx)

    start_epoch, start_batch = 0, 0
    best_metrics = None
    if args.resume:
        state, start_epoch, best, start_batch = ckpt_lib.resume_state(
            state, args, logger)
        if best:
            best_metrics = Metrics(config.consider_metric, best)
        # restored arrays are host numpy — re-apply the TP shardings
        state = state.replace(params=shard_params_tp(state.params, mesh))

    train_step = make_autoencoder_step(model, transform_fn=None, mesh=mesh,
                                   trainable_mask=trainable if frozen else None)
    # --scan_steps K: one host dispatch trains K steps (pretrain-runner
    # pattern). The annealed temp/kld scalars are per-step scanned inputs
    # that sit AFTER the key in the step signature -> custom `call` order.
    scan_steps = max(int(getattr(args, "scan_steps", 1) or 1), 1)
    if smoke:
        # smoke still runs exactly max_steps (=2) batches; an explicit
        # --scan_steps >1 exercises the scan path as ONE 2-step dispatch
        scan_steps = min(scan_steps, 2)
    multi_step = None
    if scan_steps > 1:
        multi_step = make_multi_step(
            train_step, scan_steps,
            call=lambda st, batch, key, extra: train_step(
                st, batch[0], key, batch[1], batch[2], *extra))

    from act_tpu.engine.preemption import GUARD
    max_steps = 2 if smoke else None
    # n_itr drives the temp/KLD anneals; includes the partial epoch on a
    # mid-epoch (preemption) resume so the schedules continue seamlessly
    n_itr = start_epoch * steps_per_epoch + start_batch
    for epoch in range(start_epoch, int(config.max_epoch)):
        # mid-epoch resume: skip the batches the preempted run consumed
        train_loader.set_epoch(
            epoch, start_batch=start_batch if epoch == start_epoch else 0)
        # scheduled BN momentum as a traced rescale ratio (reference
        # BNMomentumScheduler.step(epoch), tools/builder.py:89-93)
        bn_extra = (() if bnm is None else
                    (jnp.float32(bn_update_ratio(bnm(epoch))),))
        meters = AverageMeter(["Loss1", "Loss2"])
        t0 = time.time()
        pending = []  # host-side (pts, temp, kldw) stack for scan dispatch
        metric_pending = []  # deferred device scalars (fetched at log time)
        for idx, (tax, mid, data) in enumerate(train_loader):
            pts = data[0] if isinstance(data, (tuple, list)) else data
            temp = get_temp(config, n_itr)
            kldw = get_kld_weight(config, n_itr)
            if multi_step is not None:
                pending.append((np.asarray(pts), np.float32(temp),
                                np.float32(kldw)))
                n_itr += 1  # the anneals advance per BATCH, not per dispatch
                if len(pending) < scan_steps:
                    continue
                stacked = (
                    shard_stacked(mesh, np.stack([p for p, _, _ in pending])),
                    jnp.asarray([t for _, t, _ in pending]),
                    jnp.asarray([k for _, _, k in pending]))
                pending = []
                state, metrics = multi_step(state, stacked, root_key,
                                            *bn_extra)
            else:
                pts = shard_batch(mesh, jnp.asarray(pts))
                state, metrics = train_step(state, pts, root_key,
                                            jnp.float32(temp),
                                            jnp.float32(kldw), *bn_extra)
                n_itr += 1
            if GUARD.check(n_itr - start_epoch * steps_per_epoch - start_batch):
                # graceful preemption: durable mid-epoch ckpt-last with the
                # data cursor; --resume continues bit-exactly (test_preemption)
                next_batch = (start_batch if epoch == start_epoch else 0) \
                    + idx + 1
                ckpt_lib.save_checkpoint(
                    state, epoch, None,
                    best_metrics.state_dict() if best_metrics else None,
                    "ckpt-last", args, logger, block=True,
                    data_iter={"epoch": epoch, "next_batch": next_batch})
                print_log(f"[PREEMPT] saved mid-epoch checkpoint at epoch "
                          f"{epoch} batch {next_batch}; exiting gracefully",
                          logger=logger)
                return state
            # defer the fetch (pretrain-runner rationale): scanned metrics
            # are K-step means, so carry the step weight into the meter
            scan_eff = scan_steps if multi_step is not None else 1
            metric_pending.append((metrics["recon"], metrics["kld"], scan_eff))
            # log every ~100 batches; under scan idx only lands on dispatch
            # iterations, so fire when the window crossed a 100-batch mark
            if (idx // 100) != ((idx - scan_eff) // 100):
                for r, k, n in metric_pending:
                    meters.update([float(r) * 1000, float(k) * 1000], n=n)
                metric_pending = []
                print_log(
                    f"[Epoch {epoch}][Batch {idx + 1}/{steps_per_epoch}] "
                    f"Losses(x1000) = {[f'{v:.4f}' for v in meters.val()]} "
                    f"temp={temp:.4f} kld_w={kldw:.5f} "
                    f"lr={float(schedule(int(state.step))):.6f}", logger=logger)
                if train_writer is not None:
                    train_writer.add_scalar("Loss/Batch/Recon",
                                            meters.val(0), n_itr)
            if max_steps and idx + 1 >= max_steps:
                break
        # flush the sub-scan remainder so no batch is dropped and the anneal
        # cursor n_itr stays aligned with the actual step count
        for pts, temp, kldw in pending:
            state, metrics = train_step(
                state, shard_batch(mesh, jnp.asarray(pts)), root_key,
                jnp.float32(temp), jnp.float32(kldw), *bn_extra)
            metric_pending.append((metrics["recon"], metrics["kld"], 1))
        pending = []
        for r, k, n in metric_pending:  # drain the deferred fetches
            meters.update([float(r) * 1000, float(k) * 1000], n=n)
        metric_pending = []
        print_log(f"[Epoch {epoch}] EpochTime={time.time() - t0:.1f}s "
                  f"Losses(x1000)={[f'{v:.4f}' for v in meters.avg()]}",
                  logger=logger)

        if epoch % args.val_freq == 0:
            metrics = validate(model, state, val_loader, epoch, args, config,
                               logger=logger, max_batches=4 if smoke else None)
            if metrics.better_than(best_metrics):
                best_metrics = metrics
                ckpt_lib.save_checkpoint(state, epoch, metrics.state_dict(),
                                         best_metrics.state_dict(), "ckpt-best",
                                         args, logger)
        # --ckpt_every N thins the per-epoch ckpt-last cadence
        # (ckpt_lib.should_save_last; default 1 = reference parity)
        if ckpt_lib.should_save_last(epoch, int(config.max_epoch),
                                     getattr(args, "ckpt_every", 1)):
            ckpt_lib.save_checkpoint(
                state, epoch, None,
                best_metrics.state_dict() if best_metrics else None,
                "ckpt-last", args, logger)
    ckpt_lib.wait_for_pending_saves()  # async writes durable before return
    return state


_RECON_STEP_CACHE = {}


def _get_recon_step(model):
    """One jitted recon forward per model object — re-jitting per validate call
    would recompile every epoch."""
    fn = _RECON_STEP_CACHE.get(id(model))
    if fn is None:
        @jax.jit
        def fn(variables, pts):
            ret = model.apply(variables, pts, 1.0, True,
                              rngs=dict(gumbel=jax.random.PRNGKey(0)))
            return ret[0], ret[1]  # whole_coarse, whole_fine
        _RECON_STEP_CACHE[id(model)] = fn
    return fn


def validate(model, state, val_loader, epoch, args, config, logger=None,
             max_batches=None):
    """Per-taxonomy Chamfer/F-score table (reference validate, :219-323)."""
    variables = state.variables()
    recon_step = _get_recon_step(model)

    category_metrics = defaultdict(lambda: AverageMeter(Metrics.names()))
    n_samples = 0
    for idx, (taxonomy_ids, model_ids, data) in enumerate(val_loader):
        if max_batches and idx >= max_batches:
            break
        pts = jnp.asarray(data[0] if isinstance(data, (tuple, list)) else data)
        coarse, fine = recon_step(variables, pts)
        for b in range(pts.shape[0]):
            m = Metrics.get(np.asarray(fine[b]), np.asarray(pts[b]))
            tax = taxonomy_ids[b] if isinstance(taxonomy_ids, (list, tuple)) \
                else taxonomy_ids
            category_metrics[tax].update(m)
            n_samples += 1

    overall = AverageMeter(Metrics.names())
    print_log("============================ TEST RESULTS ============================",
              logger=logger)
    print_log("Taxonomy\t#Sample\t" + "\t".join(Metrics.names()), logger=logger)
    for tax, meter in sorted(category_metrics.items()):
        print_log(f"{tax}\t{meter.count(0)}\t" +
                  "\t".join(f"{v:.4f}" for v in meter.avg()), logger=logger)
        overall.update(meter.avg())
    vals = overall.avg()
    print_log("Overall\t\t" + "\t".join(f"{v:.4f}" for v in vals), logger=logger)
    return Metrics(config.consider_metric, dict(zip(Metrics.names(), vals)))


def validate_net(args, config, max_batches=None):
    """--val mode (reference validate_net :325-344). ``max_batches`` bounds
    the eval WITHOUT shrinking the model (unlike --smoke) so a converted
    full-scale checkpoint stays loadable — the parity protocol's smoke leg."""
    logger = args.log_name
    if getattr(args, "smoke", False):
        config = _apply_smoke(config)
    config.dataset.val.others.bs = 1
    _, val_loader = engine_builder.dataset_builder(args, config.dataset.val)
    model = MODELS.build(config.model)
    state = _load_for_eval(model, config, args, logger)
    return validate(model, state, val_loader, -1, args, config, logger=logger,
                    max_batches=max_batches)


def test_net(args, config):
    """--test mode: metrics table + qualitative reconstruction dump
    (reference test_net :346-420 saves gt/dense txt + rendered jpg to ./vis)."""
    logger = args.log_name
    smoke = getattr(args, "smoke", False)
    if smoke:
        config = _apply_smoke(config)
    config.dataset.test.others.bs = 1
    _, test_loader = engine_builder.dataset_builder(args, config.dataset.test)
    model = MODELS.build(config.model)
    state = _load_for_eval(model, config, args, logger)
    metrics = validate(model, state, test_loader, -1, args, config,
                       logger=logger, max_batches=4 if smoke else None)
    dump_reconstructions(model, state, test_loader, args, logger,
                         max_dumps=2 if smoke else 20)
    return metrics


def dump_reconstructions(model, state, loader, args, logger, max_dumps=20):
    """Save gt/dense point clouds as txt + rendered jpgs (reference :363-420)."""
    import os
    from act_tpu.utils.misc import get_ptcloud_img
    variables = state.variables()
    _full = _get_recon_step(model)
    recon_step = lambda v, p: _full(v, p)[1]  # whole_fine

    vis_dir = os.path.join(args.experiment_path, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    n = 0
    for taxonomy_ids, model_ids, data in loader:
        if n >= max_dumps:
            break
        pts = jnp.asarray(data[0] if isinstance(data, (tuple, list)) else data)
        dense = np.asarray(recon_step(variables, pts))[0]
        gt = np.asarray(pts)[0]
        tax = taxonomy_ids[0] if isinstance(taxonomy_ids, (list, tuple)) \
            else str(taxonomy_ids)
        prefix = os.path.join(vis_dir, f"{tax}_{n:03d}")
        np.savetxt(prefix + "_gt.txt", gt, fmt="%.6f")
        np.savetxt(prefix + "_dense.txt", dense, fmt="%.6f")
        try:
            import imageio
            imageio.imwrite(prefix + "_gt.jpg", get_ptcloud_img(gt))
            imageio.imwrite(prefix + "_dense.jpg", get_ptcloud_img(dense))
        except Exception:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.imsave(prefix + "_gt.jpg", get_ptcloud_img(gt))
            plt.imsave(prefix + "_dense.jpg", get_ptcloud_img(dense))
        n += 1
    print_log(f"[TEST] dumped {n} reconstructions to {vis_dir}", logger=logger)


def _load_for_eval(model, config, args, logger):
    from act_tpu.engine.builder import build_optimizer
    from act_tpu.utils.config import ConfigDict
    root_key = set_random_seed(args.seed)
    npoints = int(config.dataset.get("val", config.dataset.test).others.npoints)
    sample = jnp.zeros((1, npoints, 3), jnp.float32)
    init_rngs = dict(params=root_key, gumbel=root_key, dropout=root_key,
                     droppath=root_key, mask=root_key)
    variables = jax.jit(lambda: model.init(init_rngs, sample))()
    tx, _ = build_optimizer(config, variables["params"], 1, None)
    state = TrainState.create(variables, tx)
    if getattr(args, "ckpts", None):
        state = ckpt_lib.load_params_into(state, args.ckpts, logger)
    return state
