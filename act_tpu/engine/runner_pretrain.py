"""Stage-II pretraining runner (reference tools/runner_pretrain.py).

Flow: build ShapeNet(whole) train loader + ModelNet val/extra_train loaders, the
distillation (or PointBERT) model, optax chain with frozen-tokenizer masking, then
the jitted train step over the data mesh. The SVM linear probe (evaluate_svm,
reference :47-51 / validate :228-287) runs on cls features gathered across
processes. Checkpoint policy: ckpt-last each epoch, late-epoch snapshots
(reference :217-222).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from act_tpu.datasets import transforms as T
from act_tpu.engine import builder as engine_builder
from act_tpu.engine import checkpoint as ckpt_lib
from act_tpu.engine.train_state import (TrainState, make_multi_step,
                                        make_pretrain_step, step_rngs)
from act_tpu.models import MODELS
from act_tpu.ops._backend import set_default_kernel_mesh
from act_tpu.parallel import (make_mesh, shard_batch, shard_stacked,
                              is_main_process)
from act_tpu.utils import AverageMeter
from act_tpu.utils.logger import print_log
from act_tpu.utils.misc import bn_update_ratio, set_random_seed


from act_tpu.utils.meters import AccMetric


def evaluate_svm(train_features, train_labels, test_features, test_labels) -> float:
    """sklearn LinearSVC probe (reference evaluate_svm, runner_pretrain.py:47-51)."""
    from sklearn.svm import LinearSVC
    clf = LinearSVC()
    clf.fit(train_features, train_labels)
    pred = clf.predict(test_features)
    return float(np.sum(test_labels == pred) * 1.0 / pred.shape[0])


def load_dvae_ckpt(variables, dvae_cfg, subtree: str, logger=None,
                   allow_random: bool = False):
    """Load the frozen Stage-I dVAE tokenizer weights (reference build_tokenizer,
    models/act.py:1151-1160 loads dvae_config.ckpt strictly before freezing).

    Accepts an orbax dir (converted via tools/convert_checkpoint.py) or a torch
    .pth. A SET but missing path is an ERROR (matching the reference's strict
    load — a typo'd path must not silently distill toward a random tokenizer)
    unless ``allow_random`` (--allow_random_tokenizer, or --smoke: ckpt-free
    CI runs). An unset path warns: only meaningful for debugging.
    """
    import os
    path = dvae_cfg.get("ckpt") if hasattr(dvae_cfg, "get") else None
    if not path:
        print_log("[PRETRAIN][WARNING] dvae_config.ckpt not set — the frozen "
                  "tokenizer/teacher is RANDOMLY INITIALIZED", logger=logger)
        return variables
    if not os.path.exists(path):
        if not allow_random:
            raise FileNotFoundError(
                f"dvae_config.ckpt = '{path}' does not exist. The reference "
                f"loads the Stage-I tokenizer strictly (models/act.py:1151-"
                f"1160); pretraining against a random tokenizer is "
                f"meaningless. Fix the path, or pass --allow_random_tokenizer "
                f"to proceed anyway.")
        print_log(f"[PRETRAIN][WARNING] dvae ckpt '{path}' not found — the "
                  "frozen tokenizer/teacher is RANDOMLY INITIALIZED",
                  logger=logger)
        return variables
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))
    if path.endswith(".pth"):
        from act_tpu.engine import torch_convert as tc
        sd = tc.load_torch_state_dict(path)
        embed_type = str(dvae_cfg.get("visual_embed_type", "")).lower()
        name = str(dvae_cfg.get("NAME", "")).lower()
        arch = ("clip" if embed_type.startswith("clip")
                else "bert" if "bert" in name else "vit")
        if arch == "bert":
            sd = tc.fuse_bert_qkv(sd)
        loaded_params, loaded_bs = tc.convert_state_dict(
            sd, tc.dvae_rules("", teacher_arch=arch), logger=logger)
    else:
        payload = ckpt_lib.load_checkpoint(path)
        loaded_params = payload.get("params", payload)
        loaded_bs = payload.get("batch_stats", {}) or {}
        loaded_params, loaded_bs = ckpt_lib.fold_legacy_encoder_bias(
            loaded_params, loaded_bs)
    params[subtree] = ckpt_lib.merge_pretrained(params[subtree], loaded_params,
                                                logger=logger)
    if batch_stats.get(subtree) and loaded_bs:
        batch_stats[subtree] = ckpt_lib.merge_pretrained(
            batch_stats[subtree], loaded_bs, logger=logger)
    print_log(f"[PRETRAIN] loaded frozen dVAE tokenizer from {path}",
              logger=logger)
    out = {**variables, "params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _apply_smoke(config):
    """Shrink for --smoke: 2 steps, tiny model dims, tiny datasets."""
    config.max_epoch = 1
    config.total_bs = 8
    tc = config.model.get("transformer_config")
    if tc is not None:
        tc.depth = 2
        tc.embed_dim = 32
        tc.encoder_dims = 32
        tc.num_heads = 4
        tc.decoder_depth = 1
        tc.decoder_num_heads = 4
        tc.cls_dim = 32
        if tc.get("register_shallow_hook", -1) >= tc.depth:
            tc.register_shallow_hook = 1
    dc = config.model.get("dvae_config", config.model)
    dc.encoder_dims = 32
    dc.tokens_dims = 32
    dc.decoder_dims = 32
    dc.num_tokens = 64
    dc.visual_embed_dim = 48
    dc.visual_embed_depth = 2
    dc.visual_embed_heads = 4
    dc.num_prompt_token = 4
    for split in config.dataset.values():
        split.others.npoints = min(int(split.others.get("npoints", 1024)), 256)
    return config


def run_net(args, config, train_writer=None, val_writer=None):
    logger = args.log_name
    smoke = bool(getattr(args, "smoke", False))
    if smoke:
        config = _apply_smoke(config)

    mesh = make_mesh(model_parallel=getattr(args, "mesh_model_parallel", 1))
    set_default_kernel_mesh(mesh)  # shard Pallas kernels in ad-hoc eval jits too

    # datasets -----------------------------------------------------------
    config.dataset.train.others.bs = config.total_bs
    train_dataset, train_loader = engine_builder.dataset_builder(
        args, config.dataset.train)
    extra_loader = val_loader = None
    if "val" in config.dataset:
        config.dataset.val.others.bs = config.total_bs * 2
        _, val_loader = engine_builder.dataset_builder(args, config.dataset.val)
    if "extra_train" in config.dataset:
        config.dataset.extra_train.others.bs = config.total_bs * 2
        _, extra_loader = engine_builder.dataset_builder(
            args, config.dataset.extra_train)

    # model + optimizer --------------------------------------------------
    model = MODELS.build(config.model)
    npoints = int(config.dataset.train.others.npoints)
    sample = jnp.zeros((2, npoints, 3), jnp.float32)
    root_key = set_random_seed(args.seed)  # rank-shifted: data/augment streams
    # params MUST be identical across processes (they are treated as
    # replicated) -> init from the unshifted seed
    init_key = jax.random.PRNGKey(args.seed or 0)
    init_rngs = dict(params=init_key, gumbel=init_key, mask=init_key,
                     dropout=init_key, droppath=init_key)
    variables = jax.jit(lambda: model.init(init_rngs, sample))()

    is_pointbert = config.model.NAME == "ACT_PointBERT"
    tokenizer_name = "dvae" if is_pointbert else "dvae_tokenizer"
    variables = load_dvae_ckpt(
        variables, config.model.dvae_config, tokenizer_name, logger,
        allow_random=bool(getattr(args, "allow_random_tokenizer", False))
        or smoke)
    if is_pointbert:
        # MoCo momentum encoder starts as a copy of the query encoder
        # (reference models/act.py:939-942)
        params = dict(variables["params"])
        params["transformer_k"] = jax.tree_util.tree_map(
            lambda x: x, params["transformer_q"])
        variables = {**variables, "params": params}

    frozen = ["dvae_tokenizer"] if not is_pointbert else ["dvae", "transformer_k"]
    trainable = engine_builder.freeze_mask_from_paths(variables["params"], frozen)
    if bool(config.model.get("frozen_bf16", True)):
        # frozen tokenizer/teacher matmul weights in bf16: no per-use f32->
        # bf16 casts, half the HBM reads (transformer_k stays f32 — its EMA
        # mixes with f32 query params every step)
        variables = {**variables, "params": engine_builder.cast_frozen_bf16(
            variables["params"], [tokenizer_name])}

    # tensor-parallel weight shardings over the 'model' mesh axis (megatron
    # MLP pair; no-op replication when --mesh_model_parallel is 1). Must run
    # BEFORE optimizer init so optax moments inherit the shardings.
    from act_tpu.parallel.tp import shard_params_tp
    variables = {**variables,
                 "params": shard_params_tp(variables["params"], mesh)}

    steps_per_epoch = max(len(train_loader), 1)
    tx, schedule = engine_builder.build_optimizer(
        config, variables["params"], steps_per_epoch, trainable)
    bnm = engine_builder.build_bnm_schedule(config)
    state = TrainState.create(variables, tx)

    start_epoch, start_batch = 0, 0
    best_metrics = AccMetric(0.0)
    if args.resume:
        state, start_epoch, best, start_batch = ckpt_lib.resume_state(
            state, args, logger)
        if best:
            best_metrics = AccMetric(best.get("acc", 0.0))
    elif getattr(args, "start_ckpts", None):
        state = ckpt_lib.load_params_into(state, args.start_ckpts, logger)
    if args.resume or getattr(args, "start_ckpts", None):
        # restored arrays are host numpy — re-apply the TP weight shardings
        # (opt-state moments get resharded by GSPMD on the first step)
        state = state.replace(params=shard_params_tp(state.params, mesh))

    # dataset-dependent pre-transform (reference runner_pretrain.py:129-135):
    # ShapeNet clouds arrive already subsampled to npoints; ModelNet clouds are
    # raw 8192-pt and get FPS'd to npoints on device before the augments.
    # Branch on the actual dataset class (registry names match the
    # reference's) rather than probing config shapes.
    train_ds_name = type(train_dataset).__name__
    if train_ds_name == "ModelNet":
        def pretrain_transform(key, pts):
            from act_tpu import ops
            pts = ops.gather_points(pts, ops.furthest_point_sample(pts, npoints))
            return T.scale_and_translate(key, pts)
    else:
        pretrain_transform = T.scale_and_translate

    train_step = make_pretrain_step(
        model, transform_fn=pretrain_transform, mesh=mesh,
        loss_is_tuple=is_pointbert,
        ema_momentum=float(config.model.m) if is_pointbert else None,
        trainable_mask=trainable)
    # --h2d_dtype i16: ship batches as int16 (half the H2D bytes) and
    # dequantize as the first op inside the jitted step. Every pretrain
    # dataset path pc_normalizes clouds to the unit sphere, so |x| <= 1 and
    # the quantization error is <= 1/32767 ~ 3.1e-5 absolute — measured for
    # bandwidth-starved links (e.g. the ~35MB/s axon tunnel, where the
    # 12.6MB f32 scan window IS the sustained-throughput roofline).
    h2d_dtype = str(getattr(args, "h2d_dtype", "f32") or "f32")
    if h2d_dtype == "i16":
        from act_tpu.engine import h2d

        def quantize_h2d(x):
            # fixed scale 1.0: every pretrain dataset path pc_normalizes to
            # the unit sphere, so no per-window scale needs shipping
            return h2d.quantize_i16(x, scale=1.0)[0]
        base_step = train_step

        # jitted so the single-step (scan_steps=1 / remainder) path stays ONE
        # dispatch — eager astype+mul would cost two extra ~25ms tunnel round
        # trips per step; inside make_multi_step's jit the inner jit inlines
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, pts, key, *extra):  # noqa: F811
            return base_step(state, h2d.dequantize_i16(pts), key, *extra)
    else:
        quantize_h2d = None
    scan_steps = max(int(getattr(args, "scan_steps", 1) or 1), 1)
    if smoke:
        # smoke still runs exactly max_steps (=2) batches; an explicit
        # --scan_steps >1 exercises the scan path as ONE 2-step dispatch
        scan_steps = min(scan_steps, 2)
    multi_step = (make_multi_step(train_step, scan_steps)
                  if scan_steps > 1 else None)

    # feature-extraction step for the SVM probe; FPS to the protocol npoints
    # first (reference validate, runner_pretrain.py:241,255: misc.fps(points,
    # npoints)) — probing raw 8192-pt ModelNet clouds would be a different
    # protocol AND 8x the eval FLOPs
    val_npoints = int(config.dataset.val.others.npoints) if val_loader else npoints

    @jax.jit
    def feat_step(variables, pts):
        from act_tpu import ops
        if pts.shape[1] != val_npoints:
            pts = ops.gather_points(
                pts, ops.furthest_point_sample(pts, val_npoints))
        return model.apply(variables, pts, noaug=True,
                           rngs=dict(gumbel=root_key, mask=root_key))

    print_log(f"[PRETRAIN] {config.model.NAME}: {steps_per_epoch} steps/epoch, "
              f"{int(config.max_epoch)} epochs, mesh={mesh.shape}", logger=logger)

    from act_tpu.utils.profiling import TraceContext
    from act_tpu.engine.preemption import GUARD
    trace = TraceContext()
    max_steps = 2 if smoke else None
    n_step = 0
    for epoch in range(start_epoch, int(config.max_epoch)):
        # mid-epoch resume: skip the batches the preempted run consumed
        train_loader.set_epoch(
            epoch, start_batch=start_batch if epoch == start_epoch else 0)
        # scheduled BN momentum enters the jitted step as a traced rescale
        # ratio (reference BNMomentumScheduler.step(epoch), builder.py:89-93)
        bn_extra = (() if bnm is None else
                    (jnp.float32(bn_update_ratio(bnm(epoch))),))
        meters = AverageMeter(["Loss"])
        batch_time = AverageMeter()
        epoch_start = time.time()
        tic = time.time()
        pending = []  # host-side stack for scanned multi-step dispatch
        loss_pending = []  # deferred device loss scalars (fetched at log time)
        for idx, (tax, mid, data) in enumerate(train_loader):
            pts = data[0] if isinstance(data, (tuple, list)) else data
            if multi_step is not None:
                pending.append(np.asarray(pts))
                if len(pending) < scan_steps:
                    continue
                # device_put straight from the numpy stack: jnp.asarray first
                # would place on the default device and then reshard
                hostb = np.stack(pending)
                if quantize_h2d is not None:
                    hostb = quantize_h2d(hostb)
                stacked = shard_stacked(mesh, hostb)
                pending = []
                state, metrics = multi_step(state, stacked, root_key,
                                            *bn_extra)
                n_step += scan_steps
            else:
                pts = np.asarray(pts)
                if quantize_h2d is not None:
                    pts = quantize_h2d(pts)
                pts = shard_batch(mesh, pts)
                state, metrics = train_step(state, pts, root_key, *bn_extra)
                n_step += 1
            trace.step(n_step)
            if GUARD.check(n_step):
                # graceful preemption: durable mid-epoch ckpt-last carrying
                # the data cursor, then return — --resume continues at the
                # exact next batch, bit-identically (test_preemption.py)
                next_batch = (start_batch if epoch == start_epoch else 0) \
                    + idx + 1
                ckpt_lib.save_checkpoint(
                    state, epoch, None, best_metrics.state_dict(),
                    "ckpt-last", args, logger, block=True,
                    data_iter={"epoch": epoch, "next_batch": next_batch})
                print_log(f"[PREEMPT] saved mid-epoch checkpoint at epoch "
                          f"{epoch} batch {next_batch}; exiting gracefully",
                          logger=logger)
                trace.close()
                return state
            # defer the loss fetch: float(...) here would block the host on
            # a device round trip EVERY dispatch (25ms over a tunneled chip),
            # serializing the loader against the device. Keep the tiny device
            # scalar and materialize at the logging cadence — dispatch stays
            # async and host IO overlaps device compute (jax dispatch is
            # asynchronous; the queue is bounded by the loader prefetch).
            loss_pending.append(
                (metrics["loss"],
                 scan_steps if multi_step is not None else 1))
            batch_time.update(time.time() - tic)
            tic = time.time()
            # log every ~100 batches. Under multi_step this line only runs on
            # dispatch iterations (idx = k*scan_steps - 1), where idx % 100
            # can be unsatisfiable (e.g. scan_steps=8: idx always odd) -- so
            # fire whenever the dispatched window crossed a 100-batch mark.
            scan_eff = scan_steps if multi_step is not None else 1
            if (idx // 100) != ((idx - scan_eff) // 100):
                for l, n in loss_pending:
                    meters.update([float(l)], n=n)
                loss_pending = []
                loss = meters.val(0)
                lr = float(schedule(int(state.step)))
                print_log(
                    f"[Epoch {epoch}][Batch {idx + 1}/{steps_per_epoch}] "
                    f"BatchTime={batch_time.avg():.3f}s Loss={meters.avg(0):.4f} "
                    f"lr={lr:.6f}", logger=logger)
                if train_writer is not None:
                    train_writer.add_scalar("Loss/Batch/Loss", loss, int(state.step))
                    train_writer.add_scalar("Loss/Batch/LR", lr, int(state.step))
            if max_steps and idx + 1 >= max_steps:
                break
        # flush the sub-scan remainder so no batch is dropped and the
        # step-based LR schedule stays aligned with the epoch loop
        for pts in pending:
            if quantize_h2d is not None:
                pts = quantize_h2d(pts)
            sharded = shard_batch(mesh, pts)
            state, metrics = train_step(state, sharded, root_key, *bn_extra)
            n_step += 1
            meters.update([float(metrics["loss"])])
        pending = []
        for l, n in loss_pending:  # drain the deferred loss fetches
            meters.update([float(l)], n=n)
        loss_pending = []
        print_log(f"[Epoch {epoch}] EpochTime={time.time() - epoch_start:.3f}s "
                  f"Loss={meters.avg(0):.4f}", logger=logger)

        if val_loader is not None and extra_loader is not None and not smoke \
                and (epoch % args.val_freq == 0):
            metrics = validate(state, model, feat_step, extra_loader, val_loader,
                               epoch, args, config, logger=logger)
            if metrics.better_than(best_metrics):
                best_metrics = metrics
                ckpt_lib.save_checkpoint(state, epoch,
                                         {"acc": metrics.acc},
                                         best_metrics.state_dict(),
                                         "ckpt-best", args, logger)

        # --ckpt_every N thins the per-epoch ckpt-last cadence
        # (ckpt_lib.should_save_last; default 1 = reference parity)
        if ckpt_lib.should_save_last(epoch, int(config.max_epoch),
                                     getattr(args, "ckpt_every", 1)):
            ckpt_lib.save_checkpoint(state, epoch, None,
                                     best_metrics.state_dict(), "ckpt-last",
                                     args, logger)
        if epoch % 25 == 0 and epoch >= 250:
            ckpt_lib.save_checkpoint(state, epoch, None,
                                     best_metrics.state_dict(),
                                     f"ckpt-epoch-{epoch:03d}", args, logger)
    ckpt_lib.wait_for_pending_saves()  # async writes durable before return
    trace.close()
    return state


def validate(state, model, feat_step, extra_train_loader, test_loader, epoch,
             args, config, logger=None):
    """SVM linear probe on cls features (reference validate, :228-287)."""
    print_log(f"[VALIDATION] epoch {epoch} SVM probe", logger=logger)
    variables = jax.device_get(state.variables())

    def collect(loader):
        feats, labels = [], []
        for tax, mid, data in loader:
            pts, label = data
            f = feat_step(variables, jnp.asarray(pts))
            feats.append(np.asarray(f))
            labels.append(np.asarray(label))
        return np.concatenate(feats), np.concatenate(labels)

    from act_tpu.parallel import gather_concat
    train_f, train_l = collect(extra_train_loader)
    test_f, test_l = collect(test_loader)
    train_f, train_l = gather_concat(train_f), gather_concat(train_l)
    test_f, test_l = gather_concat(test_f), gather_concat(test_l)
    acc = evaluate_svm(train_f, train_l, test_f, test_l) * 100.0
    print_log(f"[VALIDATION] epoch {epoch} linear-probe acc = {acc:.4f}",
              logger=logger)
    return AccMetric(acc)


def test_net(args, config):  # reference test_net is a stub (:290)
    raise NotImplementedError("pretrain test mode is not defined (matches reference)")
