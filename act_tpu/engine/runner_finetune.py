"""Finetune / test runner for classification (reference tools/runner_finetune.py).

Train: FPS-resample trick (1024->fps 1200->random 1024 etc, reference :141-157),
rotation augment, CE+acc, grad clip 10. Validate: FPS to npoints, overall accuracy
+ balanced accuracy (sklearn), cross-process gather. Vote: N rounds of FPS-subset
resample + augment, mean logits (reference validate_vote :300-365, test :386-432).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from act_tpu import ops
from act_tpu.datasets import transforms as T
from act_tpu.engine import builder as engine_builder
from act_tpu.engine import checkpoint as ckpt_lib
from act_tpu.engine.train_state import (TrainState, make_finetune_step,
                                        make_multi_step, step_rngs)
from act_tpu.models import MODELS
from act_tpu.models.point_transformer import trainable_mask
from act_tpu.ops._backend import set_default_kernel_mesh
from act_tpu.parallel import make_mesh, shard_batch, shard_stacked
from act_tpu.utils import AverageMeter
from act_tpu.utils.logger import print_log
from act_tpu.utils.misc import bn_update_ratio, set_random_seed


from act_tpu.utils.meters import AccMetric


def _point_all(npoints: int) -> int:
    """FPS oversample count (reference runner_finetune.py:143-151)."""
    return {1024: 1200, 2048: 2400, 4096: 4800, 8192: 8192}.get(npoints, npoints)


def _apply_smoke(config):
    config.max_epoch = 1
    config.total_bs = 8
    config.model.depth = 2
    config.model.embed_dim = 32
    config.model.encoder_dims = 32
    config.model.num_heads = 4
    config.npoints = min(int(config.npoints), 256)
    return config


def build_state(args, config, logger, steps_per_epoch, mesh=None):
    model = MODELS.build(config.model)
    npoints = int(config.npoints)
    root_key = set_random_seed(args.seed)  # rank-shifted: data/augment streams
    # params must be identical across processes: init from the unshifted seed
    init_key = jax.random.PRNGKey(args.seed or 0)
    sample = jnp.zeros((2, npoints, 3), jnp.float32)
    init_rngs = dict(params=init_key, mask=init_key, dropout=init_key,
                     droppath=init_key)
    variables = jax.jit(lambda: model.init(init_rngs, sample))()

    if mesh is not None:
        # TP weight shardings over the 'model' axis (no-op replication at
        # model_parallel=1) — BEFORE optimizer init so moments inherit them
        from act_tpu.parallel.tp import shard_params_tp
        variables = {**variables,
                     "params": shard_params_tp(variables["params"], mesh)}

    transfer = config.model.get("transfer_type", "full")
    trainable = trainable_mask(variables["params"], transfer)
    # one mask for BOTH the optimizer (set_to_zero) and the step's
    # stop_gradient so the two can never diverge
    frozen_mask = trainable if transfer != "full" else None
    tx, schedule = engine_builder.build_optimizer(
        config, variables["params"], steps_per_epoch, frozen_mask)
    bnm = engine_builder.build_bnm_schedule(config)
    state = TrainState.create(variables, tx)

    if getattr(args, "ckpts", None) and not args.resume:
        # THE shared pretrained-load path (strip prefix + legacy folds +
        # merge params/batch_stats) — see checkpoint.merge_checkpoint_into
        merged = ckpt_lib.merge_checkpoint_into(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.ckpts, logger=logger, tag="FINETUNE")
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        if mesh is not None:
            # merged arrays are host numpy — re-apply the TP shardings
            from act_tpu.parallel.tp import shard_params_tp
            state = state.replace(
                params=shard_params_tp(state.params, mesh))
    return model, state, schedule, root_key, frozen_mask, bnm


def run_net(args, config, train_writer=None, val_writer=None):
    logger = args.log_name
    smoke = bool(getattr(args, "smoke", False))
    if smoke:
        config = _apply_smoke(config)
    if int(config.model.get("cls_dim", 0)) <= 0:
        # few-shot configs leave cls_dim unset; it equals the N-way count
        config.model.cls_dim = int(getattr(args, "way", 0))
    mesh = make_mesh(model_parallel=getattr(args, "mesh_model_parallel", 1))
    set_default_kernel_mesh(mesh)  # shard Pallas kernels in ad-hoc eval jits too
    npoints = int(config.npoints)

    config.dataset.train.others.bs = config.total_bs
    config.dataset.val.others.bs = config.total_bs * 2
    _, train_loader = engine_builder.dataset_builder(args, config.dataset.train)
    _, val_loader = engine_builder.dataset_builder(args, config.dataset.val)
    steps_per_epoch = max(len(train_loader), 1)

    model, state, schedule, root_key, frozen_mask, bnm = build_state(
        args, config, logger, steps_per_epoch, mesh=mesh)

    def train_transform(key, pts):
        k1, k2 = jax.random.split(key)
        pts = ops.fps_subsample(pts, _point_all(npoints), npoints, k1)
        return T.rotate_y(k2, pts)  # reference train default (:19-29)

    train_step = make_finetune_step(model, transform_fn=train_transform,
                                    mesh=mesh, trainable_mask=frozen_mask)
    # --h2d_dtype i16: ship train batches as int16 with a DYNAMIC per-batch
    # scale (finetune clouds aren't unit-sphere — ScanObjectNN ships raw
    # coordinates); the scale rides the scan as a (K,) replicated input and
    # the dequantize fuses into the jitted step (see engine/h2d.py). The
    # finetune scan window is 25MB f32 at B=32/N=8192 — bigger than the
    # pretrain window, so transfer-bound links gain even more.
    h2d_dtype = str(getattr(args, "h2d_dtype", "f32") or "f32")
    if h2d_dtype == "i16":
        from act_tpu.engine import h2d
        quantize_h2d = h2d.quantize_i16
        base_step = train_step
        from functools import partial as _partial

        @_partial(jax.jit, donate_argnums=(0,))
        def train_step(state, pts, label, scale, key, *extra):  # noqa: F811
            return base_step(state, h2d.dequantize_i16(pts, scale), label,
                             key, *extra)
    else:
        quantize_h2d = None
    # --scan_steps K: one host dispatch trains K steps via lax.scan (same
    # tunnel/dispatch amortization the pretrain runner ships; batches are
    # (pts, label[, scale]) tuples, handled by make_multi_step's default body)
    scan_steps = max(int(getattr(args, "scan_steps", 1) or 1), 1)
    if smoke:
        # smoke still runs exactly max_steps (=2) batches; an explicit
        # --scan_steps >1 exercises the scan path as ONE 2-step dispatch
        scan_steps = min(scan_steps, 2)
    multi_step = (make_multi_step(train_step, scan_steps)
                  if scan_steps > 1 else None)

    @jax.jit
    def infer_step(variables, pts):
        pts = ops.gather_points(pts, ops.furthest_point_sample(pts, npoints))
        return model.apply(variables, pts)

    start_epoch, start_batch, best_metrics = 0, 0, AccMetric(0.0)
    vote_fn = None
    if args.resume:
        state, start_epoch, best, start_batch = ckpt_lib.resume_state(
            state, args, logger)
        if best:
            best_metrics = AccMetric(best.get("acc", 0.0))
        # restored arrays are host numpy — re-apply the TP shardings
        # (like runner_pretrain/autoencoder do on their resume paths)
        from act_tpu.parallel.tp import shard_params_tp
        state = state.replace(params=shard_params_tp(state.params, mesh))

    from act_tpu.engine.preemption import GUARD
    max_steps = 2 if smoke else None
    n_step = 0
    for epoch in range(start_epoch, int(config.max_epoch)):
        # mid-epoch resume: skip the batches the preempted run consumed
        train_loader.set_epoch(
            epoch, start_batch=start_batch if epoch == start_epoch else 0)
        # scheduled BN momentum as a traced rescale ratio (reference
        # BNMomentumScheduler.step(epoch), tools/builder.py:89-93)
        bn_extra = (() if bnm is None else
                    (jnp.float32(bn_update_ratio(bnm(epoch))),))
        meters = AverageMeter(["loss", "acc"])
        t0 = time.time()
        pending = []  # host-side stack for scanned multi-step dispatch
        metric_pending = []  # deferred device scalars (fetched at epoch end)
        for idx, (tax, mid, data) in enumerate(train_loader):
            pts, label = data
            if multi_step is not None:
                if quantize_h2d is not None:
                    q, s = quantize_h2d(pts)
                    pending.append((q, np.asarray(label), s))
                else:
                    pending.append((np.asarray(pts), np.asarray(label)))
                if len(pending) < scan_steps:
                    continue
                # batch-axis columns shard over 'data'; the (K,) per-step
                # scale vector rides replicated (autoencoder temp/kld
                # precedent — a 1-D scan input can't take P(None, 'data'))
                stacked = tuple(
                    shard_stacked(mesh, arr) if arr.ndim > 1
                    else jnp.asarray(arr)
                    for arr in (np.stack(col) for col in zip(*pending)))
                pending = []
                state, metrics = multi_step(state, stacked, root_key,
                                            *bn_extra)
                n_step += scan_steps
            else:
                if quantize_h2d is not None:
                    q, s = quantize_h2d(pts)
                    state, metrics = train_step(
                        state, shard_batch(mesh, q),
                        shard_batch(mesh, np.asarray(label)),
                        jnp.float32(s), root_key, *bn_extra)
                else:
                    state, metrics = train_step(
                        state, shard_batch(mesh, np.asarray(pts)),
                        shard_batch(mesh, np.asarray(label)), root_key,
                        *bn_extra)
                n_step += 1
            if GUARD.check(n_step):
                # graceful preemption: durable mid-epoch ckpt-last with the
                # data cursor; --resume continues bit-exactly (test_preemption)
                next_batch = (start_batch if epoch == start_epoch else 0) \
                    + idx + 1
                ckpt_lib.save_checkpoint(
                    state, epoch, None, best_metrics.state_dict(),
                    "ckpt-last", args, logger, block=True,
                    data_iter={"epoch": epoch, "next_batch": next_batch})
                print_log(f"[PREEMPT] saved mid-epoch checkpoint at epoch "
                          f"{epoch} batch {next_batch}; exiting gracefully",
                          logger=logger)
                return state
            # defer the fetch: float(...) per dispatch would block the host
            # on a device round trip (the pretrain runner's rationale);
            # scanned metrics are K-step means, so carry the step weight
            metric_pending.append(
                (metrics["loss"], metrics["acc"],
                 scan_steps if multi_step is not None else 1))
            if max_steps and idx + 1 >= max_steps:
                break
        # flush the sub-scan remainder so no batch is dropped and the
        # step-based LR schedule stays aligned with the epoch loop
        for item in pending:
            if quantize_h2d is not None:
                q, label, s = item
                state, metrics = train_step(
                    state, shard_batch(mesh, q), shard_batch(mesh, label),
                    jnp.float32(s), root_key, *bn_extra)
            else:
                pts, label = item
                state, metrics = train_step(
                    state, shard_batch(mesh, jnp.asarray(pts)),
                    shard_batch(mesh, jnp.asarray(label)), root_key,
                    *bn_extra)
            n_step += 1
            metric_pending.append((metrics["loss"], metrics["acc"], 1))
        pending = []
        for l, a, n in metric_pending:  # drain the deferred fetches
            meters.update([float(l), float(a)], n=n)
        metric_pending = []
        lr = float(schedule(int(state.step)))
        print_log(f"[Epoch {epoch}] time={time.time() - t0:.1f}s "
                  f"loss={meters.avg(0):.4f} acc={meters.avg(1):.2f} lr={lr:.6f}",
                  logger=logger)

        if epoch % args.val_freq == 0:
            acc = validate(model, state, val_loader, infer_step, logger)
            better = acc.better_than(best_metrics)
            if better:
                best_metrics = acc
                ckpt_lib.save_checkpoint(state, epoch, acc.state_dict(),
                                         best_metrics.state_dict(), "ckpt-best",
                                         args, logger)
            # vote eval gate (reference runner_finetune.py:235:
            # acc > 92.1 or (better and acc > 91))
            vote_gate = acc.acc > 92.1 or (better and acc.acc > 91.0)
            if getattr(args, "vote", False) and vote_gate and not smoke:
                if vote_fn is None:
                    vote_fn = make_vote_logits(model, npoints)
                vote_acc = validate_vote(model, state, val_loader, npoints,
                                         root_key, logger, times=10,
                                         vote_logits=vote_fn)
                if vote_acc > best_metrics.acc:
                    ckpt_lib.save_checkpoint(state, epoch,
                                             {"acc": vote_acc},
                                             best_metrics.state_dict(),
                                             "ckpt-best_vote", args, logger)
        # --ckpt_every N thins the per-epoch ckpt-last cadence
        # (ckpt_lib.should_save_last; default 1 = reference parity)
        if ckpt_lib.should_save_last(epoch, int(config.max_epoch),
                                     getattr(args, "ckpt_every", 1)):
            ckpt_lib.save_checkpoint(state, epoch, None,
                                     best_metrics.state_dict(),
                                     "ckpt-last", args, logger)
    ckpt_lib.wait_for_pending_saves()  # async writes durable before return
    return state


def _gather_eval(model, state, loader, infer_step):
    from act_tpu.parallel import gather_concat
    variables = state.variables()
    preds, labels = [], []
    for tax, mid, data in loader:
        pts, label = data
        logits = infer_step(variables, jnp.asarray(pts))
        preds.append(np.asarray(jnp.argmax(logits, -1)))
        labels.append(np.asarray(label))
    # concat local shard, then across processes (reference gather_tensor)
    return gather_concat(np.concatenate(preds)), gather_concat(
        np.concatenate(labels))


def validate(model, state, loader, infer_step, logger) -> AccMetric:
    preds, labels = _gather_eval(model, state, loader, infer_step)
    oa = float((preds == labels).mean()) * 100.0
    try:
        from sklearn.metrics import balanced_accuracy_score
        macc = balanced_accuracy_score(labels, preds) * 100.0
    except Exception:
        macc = float("nan")
    print_log(f"[VALIDATION] OA = {oa:.4f}  mAcc = {macc:.4f}", logger=logger)
    return AccMetric(oa)


def make_vote_logits(model, npoints):
    """Build the jitted vote forward ONCE — defining it inside validate_vote
    would recompile the full model on every call (test --vote runs 300 rounds;
    remote compiles cost minutes each)."""

    @jax.jit
    def vote_logits(variables, pts, keys):
        """All vote rounds in one program: scan over per-vote keys, summing
        softmaxed logits (one dispatch per batch instead of `times`).

        keys (times, 2) -> (B, C) summed probs; keys (R, times, 2) -> (R, B, C)
        — an outer scan over R test-vote rounds with the identical per-round
        body, so the 300-round test protocol (reference runner_finetune.py
        :425-432) pays one tunnel dispatch per R-chunk instead of per round.
        """

        def one_vote(acc, key):
            k1, k2 = jax.random.split(key)
            p = ops.fps_subsample(pts, _point_all(npoints), npoints, k1)
            p = T.scale_and_translate(k2, p)
            return acc + jax.nn.softmax(model.apply(variables, p), axis=-1), None

        def one_round(_, round_keys):
            # first vote establishes the accumulator shape, scan adds the rest
            first, _ = one_vote(0.0, round_keys[0])
            acc, _ = jax.lax.scan(one_vote, first, round_keys[1:])
            return None, acc

        if keys.ndim == 3:
            _, accs = jax.lax.scan(one_round, None, keys)
            return accs
        _, acc = one_round(None, keys)
        return acc

    return vote_logits


def validate_vote(model, state, loader, npoints, root_key, logger,
                  times: int = 10, vote_logits=None) -> float:
    """Mean-logit voting over FPS-subset resamples + scale/translate augment
    (reference validate_vote, :300-365)."""
    from act_tpu.parallel import gather_concat
    variables = state.variables()
    if vote_logits is None:
        vote_logits = make_vote_logits(model, npoints)

    preds, labels = [], []
    for i, (tax, mid, data) in enumerate(loader):
        pts, label = data
        pts = jnp.asarray(pts)
        keys = jax.random.split(jax.random.fold_in(root_key, i), times)
        acc_logits = vote_logits(variables, pts, keys)
        preds.append(np.asarray(jnp.argmax(acc_logits, -1)))
        labels.append(np.asarray(label))
    # gather across processes before scoring (reference gathers test_pred/
    # test_label with dist_utils.gather_tensor, runner_finetune.py:347-350)
    preds = gather_concat(np.concatenate(preds))
    labels = gather_concat(np.concatenate(labels))
    acc = float((preds == labels).mean()) * 100.0 if len(preds) else 0.0
    print_log(f"[VOTE] acc = {acc:.4f} ({times} votes)", logger=logger)
    return acc


def test_net(args, config):
    logger = args.log_name
    smoke = bool(getattr(args, "smoke", False))
    if smoke:
        config = _apply_smoke(config)
    mesh = make_mesh(model_parallel=getattr(args, "mesh_model_parallel", 1))
    set_default_kernel_mesh(mesh)
    npoints = int(config.npoints)
    config.dataset.test.others.bs = config.total_bs * 2
    _, test_loader = engine_builder.dataset_builder(args, config.dataset.test)
    model, state, schedule, root_key, _, _ = build_state(args, config, logger,
                                                         1, mesh=mesh)

    @jax.jit
    def infer_step(variables, pts):
        pts = ops.gather_points(pts, ops.furthest_point_sample(pts, npoints))
        return model.apply(variables, pts)

    acc = validate(model, state, test_loader, infer_step, logger)
    print_log(f"[TEST] OA = {acc.acc:.4f}", logger=logger)
    if getattr(args, "vote", False):
        # best-of-N vote rounds (reference test :425-432 runs 300), with the
        # rounds scanned into chunked dispatches: per round the sequential
        # protocol paid one ~25ms tunnel dispatch per test batch (~7.5s pure
        # dispatch overhead per full run); chunking 50 rounds into one scanned
        # program cuts that 50x with per-round accuracies unchanged
        # (tests/test_engine.py TestVoteRoundsScan pins equality)
        rounds = 2 if smoke else 300
        accs = test_vote_rounds(model, state, test_loader, npoints, root_key,
                                logger, rounds=rounds)
        best = 0.0
        for r, a in enumerate(accs):
            best = max(best, float(a))
            print_log(f"[TEST_VOTE] round {r} acc={a:.4f} best={best:.4f}",
                      logger=logger)
        acc.vote = best  # best-of-rounds vote OA (tools/parity_protocol.py)
    return acc


def test_vote_rounds(model, state, loader, npoints, root_key, logger,
                     rounds: int, times: int = 10, round_chunk: int = 50,
                     vote_logits=None) -> np.ndarray:
    """Per-round vote accuracies for the best-of-N test protocol (reference
    runner_finetune.py:425-432), rounds batched into scanned dispatches.

    Key schedule is identical to running ``validate_vote`` once per round with
    ``fold_in(root_key, r)``: per (round r, batch i) the vote keys are
    ``split(fold_in(fold_in(root_key, r), i), times)``. Returns (rounds,) OA%.
    """
    from act_tpu.parallel import gather_concat
    variables = state.variables()
    if vote_logits is None:
        vote_logits = make_vote_logits(model, npoints)
    round_chunk = max(1, min(round_chunk, rounds))

    preds_batches, label_batches = [], []
    for i, (tax, mid, data) in enumerate(loader):
        pts, label = data
        pts = jnp.asarray(pts)
        per_batch = []
        for c0 in range(0, rounds, round_chunk):
            rs = range(c0, min(c0 + round_chunk, rounds))
            keys = jnp.stack([jax.random.split(
                jax.random.fold_in(jax.random.fold_in(root_key, r), i), times)
                for r in rs])  # (Rc, times, 2)
            acc_logits = vote_logits(variables, pts, keys)  # (Rc, b, C)
            per_batch.append(np.asarray(jnp.argmax(acc_logits, -1)))
        preds_batches.append(np.concatenate(per_batch, axis=0))  # (rounds, b)
        label_batches.append(np.asarray(label))
    if not preds_batches:
        return np.zeros((rounds,), np.float64)
    # (n_local, rounds) so the cross-process gather concatenates samples on
    # axis 0 exactly like the per-round protocol does
    preds = gather_concat(np.concatenate(preds_batches, axis=1).T)
    labels = gather_concat(np.concatenate(label_batches))
    return (preds == labels[:, None]).mean(axis=0) * 100.0
