"""Checkpoint save/load (reference tools/builder.py:97-173, utils/checkpoint.py).

Orbax-backed: each checkpoint dir holds {params, batch_stats, buffers, opt_state,
epoch, metrics, best_metrics}. Naming follows the reference: ckpt-last, ckpt-best,
ckpt-epoch-NNN inside the experiment dir; save happens on process 0 only. A
``load_torch_checkpoint`` converter ingests the reference's released .pth files
(key surgery mirrored from models/act.py:829-867).
"""
from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from act_tpu.utils.logger import print_log


def _ckpt_path(experiment_path: str, name: str) -> str:
    return os.path.abspath(os.path.join(experiment_path, name))


# One in-flight background write at a time: the serialization + disk IO of a
# checkpoint (seconds for a full TrainState) overlaps with the next training
# epoch instead of stalling it (the reference's torch.save blocks the loop,
# tools/runner_pretrain.py via builder.save_checkpoint). The device->host
# fetch stays synchronous in save_checkpoint: the train step donates the
# TrainState buffers (donate_argnums), so they must be read before the runner
# dispatches another step.
_pending_lock = threading.Lock()
_pending: list = []  # [thread] of at most one
_write_error: list = []  # first exception raised by a background write


def wait_for_pending_saves():
    """Block until the in-flight checkpoint write (if any) is durable.

    Re-raises an exception from the background writer, so a failed save
    cannot pass silently. Called automatically before every save/restore;
    non-daemon threads also drain at interpreter exit."""
    with _pending_lock:
        pending = list(_pending)
        _pending.clear()
    for t in pending:
        t.join()
    if _write_error:
        raise _write_error.pop()


def should_save_last(epoch: int, max_epoch: int, ckpt_every: int = 1) -> bool:
    """Per-epoch ckpt-last cadence shared by the training runners.

    Default ``ckpt_every=1`` saves every epoch (reference parity: the torch
    runners save ckpt-last unconditionally, tools/runner_pretrain.py:217).
    ``--ckpt_every N`` saves every Nth epoch counted from the first (epochs
    N-1, 2N-1, ...); the FINAL epoch always saves so a completed run is
    always resumable. On a tunneled chip each save is a ~250MB synchronous
    D2H (the step donates the TrainState, so buffers must be fetched before
    the next dispatch) — at 33MB/s that shadows a whole short epoch.
    """
    ckpt_every = max(int(ckpt_every or 1), 1)
    return ((epoch + 1) % ckpt_every == 0) or (epoch == int(max_epoch) - 1)


def save_checkpoint(state, epoch: int, metrics: Optional[Dict],
                    best_metrics: Optional[Dict], prefix: str,
                    args, logger=None, block: bool = False,
                    data_iter: Optional[Dict] = None):
    """prefix: 'ckpt-last' / 'ckpt-best' / 'ckpt-epoch-NNN'.

    The write happens on a background thread (see wait_for_pending_saves);
    pass ``block=True`` to return only once the checkpoint is on disk.
    ``data_iter={'next_batch': k}`` marks a MID-epoch (preemption) save:
    resume restarts epoch ``epoch`` at batch ``k`` instead of epoch+1."""
    if jax.process_index() != 0:
        return
    path = _ckpt_path(args.experiment_path, prefix)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "buffers": jax.device_get(state.buffers),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "metrics": dict(metrics or {}),
        "best_metrics": dict(best_metrics or {}),
    }
    if data_iter:
        payload["data_iter"] = {k: int(v) for k, v in data_iter.items()}
    wait_for_pending_saves()  # one write in flight; same-path overwrite safe

    def _write():
        try:
            ocp.PyTreeCheckpointer().save(path, payload, force=True)
            print_log(f"Saved checkpoint at {path}", logger=logger)
        except BaseException as e:  # surfaced by the next wait/save
            _write_error.append(e)

    t = threading.Thread(target=_write, name=f"ckpt-write-{prefix}",
                         daemon=False)
    with _pending_lock:
        _pending.append(t)
    t.start()
    if block:
        wait_for_pending_saves()


def load_checkpoint(path: str) -> Dict[str, Any]:
    wait_for_pending_saves()
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restructure_like(target, loaded):
    """Rebuild a raw orbax restore (dicts/lists only) into ``target``'s
    container types. PyTreeCheckpointer.restore without an item template
    erases NamedTuples — an optax opt_state (ScaleByAdamState, MultiStepsState,
    MaskedState, ...) comes back as nested dicts keyed by field name, and the
    first tx.update after resume crashes on ``state.mu``. The target tree
    (freshly tx.init'd) supplies the containers; the loaded tree supplies the
    leaves."""
    if isinstance(target, tuple) and hasattr(target, "_fields"):  # NamedTuple
        if isinstance(loaded, dict):
            vals = [restructure_like(getattr(target, f), loaded[f])
                    for f in target._fields]
        else:  # some orbax versions store namedtuples positionally
            vals = [restructure_like(getattr(target, f), loaded[i])
                    for i, f in enumerate(target._fields)]
        return type(target)(*vals)
    if isinstance(target, (tuple, list)):
        if loaded is None and not target:  # empty containers drop to None
            return type(target)()
        return type(target)(restructure_like(t, l)
                            for t, l in zip(target, loaded))
    if isinstance(target, dict):
        if loaded is None and not target:
            return type(target)()
        return {k: restructure_like(target[k], loaded[k]) for k in target}
    return loaded


def resume_state(state, args, logger=None):
    """Reload ckpt-last + epoch + best metrics (reference resume_model,
    tools/builder.py:97-131). Returns (state, start_epoch, best_metrics,
    start_batch) — start_batch > 0 only for a mid-epoch (preemption)
    checkpoint carrying a data_iter cursor, in which case start_epoch is the
    INTERRUPTED epoch and iteration resumes at its start_batch-th batch."""
    wait_for_pending_saves()  # an in-flight write is invisible to exists()
    path = _ckpt_path(args.experiment_path, "ckpt-last")
    if not os.path.exists(path):
        print_log(f"[RESUME] no checkpoint at {path}", logger=logger)
        return state, 0, None, 0
    payload = load_checkpoint(path)
    params, batch_stats = payload["params"], payload["batch_stats"]
    opt_state = payload["opt_state"]
    same_tree = lambda a, b: (jax.tree_util.tree_structure(a)
                              == jax.tree_util.tree_structure(b))
    if not same_tree(params, state.params):
        # Legacy formats, migrated on the fly with the optimizer moments
        # reinitialized (their tree mirrors the old layout; pruning inside an
        # arbitrary optax state is not worth the fragility, ADVICE r2):
        # 1. per-block transformer params from before the scanned stacks
        # 2. conv biases from before GroupEncoder/FoldingDecoder dropped
        #    theirs — folded into the BN running means (exact)
        target_params = jax.device_get(state.params)
        params = adapt_block_layout(params, target_params)
        batch_stats = adapt_block_layout(
            batch_stats, jax.device_get(state.batch_stats))
        params, batch_stats = fold_legacy_encoder_bias(params, batch_stats)
        if not same_tree(params, state.params):
            raise ValueError(
                f"resume checkpoint at {path} has an incompatible param tree "
                "even after the legacy-bias fold — it was saved by a "
                "different model config")
        opt_state = state.tx.init(jax.tree_util.tree_map(np.asarray, params))
        print_log("[RESUME] legacy pre-bias-fold checkpoint: folded conv "
                  "biases into BN means and REINITIALIZED optimizer moments",
                  logger=logger)
    else:
        # raw orbax restore erased the optax NamedTuple containers — rebuild
        # them from the live opt_state tree (see restructure_like)
        try:
            opt_state = restructure_like(state.opt_state, opt_state)
        except (KeyError, IndexError, TypeError) as e:
            raise ValueError(
                f"resume checkpoint at {path}: optimizer state does not match "
                f"the live optimizer structure ({e!r}) — was it saved with a "
                "different optimizer config?") from e
    state = state.replace(
        params=params, batch_stats=batch_stats,
        buffers=payload["buffers"], opt_state=opt_state,
        step=payload["step"])
    data_iter = payload.get("data_iter") or {}
    start_batch = int(data_iter.get("next_batch", 0))
    if start_batch > 0:
        start_epoch = int(payload["epoch"])  # re-enter the interrupted epoch
        print_log(f"[RESUME] resumed MID-epoch {start_epoch} at batch "
                  f"{start_batch} (preemption checkpoint)", logger=logger)
    else:
        start_epoch = int(payload["epoch"]) + 1
        print_log(f"[RESUME] resumed at epoch {start_epoch}", logger=logger)
    return state, start_epoch, payload.get("best_metrics"), start_batch


def load_params_into(state, path: str, logger=None):
    payload = load_checkpoint(path)
    params = adapt_block_layout(payload["params"],
                                jax.device_get(state.params))
    bs = payload.get("batch_stats", state.batch_stats)
    return state.replace(params=params, batch_stats=bs)


def strip_student_prefix(src: dict) -> dict:
    """Lift ``ACT_encoder``/``base_model`` subtrees to the top level — the
    pytree analog of the reference's load_model_from_ckpt key surgery
    (models/act.py:841-848: keys starting with 'ACT_encoder.'/'base_model.'
    have the prefix stripped). A Stage-II pretrain checkpoint roots the
    student at ACT_encoder/*, while PointTransformer expects encoder/blocks/…
    at top level; without this, finetune silently trains from random init.

    Lifted keys take PRECEDENCE over same-named top-level siblings (e.g. a
    cls_loss=True pretrain ckpt holds both ACT_encoder/cls_pos and the
    distill-level cls_pos; the reference's assignment surgery overwrites the
    sibling with the stripped value)."""
    out = {}
    for k, v in src.items():
        if not (k in ("ACT_encoder", "base_model") and isinstance(v, dict)):
            out[k] = v
    for k, v in src.items():
        if k in ("ACT_encoder", "base_model") and isinstance(v, dict):
            out.update(v)
    return out


def fold_legacy_encoder_bias(params: dict, batch_stats: dict):
    """Compatibility shim for flax checkpoints saved before GroupEncoder's
    conv1/conv3 and FoldingDecoder's final1/final2 dropped their biases: fold
    each legacy bias into the adjacent BN running_mean (rm' = rm - b, exact
    in eval) and remove the bias so merge_pretrained doesn't silently drop it
    while keeping the stale mean. Mutates + returns (params, batch_stats)."""
    def walk(p, bs):
        if not isinstance(p, dict):
            return
        for conv, bn in (("conv1", "bn1"), ("conv3", "bn2"),
                         ("final1", "fbn1"), ("final2", "fbn2")):
            node = p.get(conv)
            if (isinstance(node, dict) and "bias" in node
                    and isinstance(bs, dict) and bn in bs
                    and "mean" in bs.get(bn, {})):
                bias = np.asarray(node.pop("bias"))
                bs[bn]["mean"] = np.asarray(bs[bn]["mean"]) - bias
        for k, v in p.items():
            if isinstance(v, dict):
                walk(v, bs.get(k, {}) if isinstance(bs, dict) else {})
    walk(params, batch_stats if isinstance(batch_stats, dict) else {})
    return params, batch_stats


def merge_checkpoint_into(variables: dict, ckpt_path: str, logger=None,
                          tag: str = "CKPT", strip: bool = True) -> dict:
    """THE pretrained-weights load path: load + strip the pretrain student
    prefix + fold legacy encoder biases + merge params and batch_stats into
    inited ``variables``. Shared by the finetune/t-SNE runners and the
    serving export so the merge semantics cannot drift between them
    (reference load_model_from_ckpt, models/act.py:829-867).

    ``strip=False`` when the TARGET itself roots the student at
    ACT_encoder/* (loading a pretrain ckpt back into the pretrain model,
    e.g. the feature-extractor export) — lifting the prefix there would
    orphan every student tensor."""
    loaded = load_checkpoint(ckpt_path)
    src = loaded.get("params", loaded)
    loaded_bs = loaded.get("batch_stats", {}) or {}
    if strip:
        src = strip_student_prefix(src)
        loaded_bs = strip_student_prefix(loaded_bs)
    src, loaded_bs = fold_legacy_encoder_bias(src, loaded_bs)
    params = merge_pretrained(jax.device_get(variables["params"]), src,
                              logger=logger)
    out = {**variables, "params": params}
    # restore BatchNorm running statistics too — evaluating with init stats
    # (mean 0 / var 1) silently wrecks --test accuracy
    if loaded_bs and variables.get("batch_stats"):
        out["batch_stats"] = merge_pretrained(
            jax.device_get(variables["batch_stats"]), loaded_bs,
            logger=logger)
    print_log(f"[{tag}] loaded ckpt {ckpt_path}", logger=logger)
    return out


def adapt_block_layout(loaded, target):
    """Convert between the two transformer-stack param layouts at the load
    boundary: per-block subtrees ``blocks_0..blocks_{D-1}`` (torch-converted
    checkpoints, legacy flax checkpoints, unscanned stacks) and the scanned
    stacked layout ``blocks`` with a leading depth axis (models/common.py
    TransformerEncoder/Decoder ``scan=True``). The TARGET tree decides the
    direction per node; unrelated keys pass through untouched so
    report_key_diff still sees genuine mismatches."""
    if not isinstance(target, dict) or not isinstance(loaded, dict):
        return loaded

    def run_len(d):
        n = 0
        while f"blocks_{n}" in d:
            n += 1
        return n

    out, handled = {}, set()
    if ("blocks" in target and "blocks" not in loaded and "blocks_0" in loaded
            and isinstance(target["blocks"], dict)
            and "blocks_0" in target["blocks"]):
        # flat-legacy per-block subtrees into an UNSCANNED nested encoder
        # scope ({'blocks': {'blocks_0': ...}} — e.g. pre-refactor
        # SegBackbone checkpoints): re-nest, don't stack
        n = run_len(loaded)
        out["blocks"] = {f"blocks_{i}": loaded[f"blocks_{i}"]
                         for i in range(n)}
        handled.update(f"blocks_{i}" for i in range(n))
    elif ("blocks" in target and "blocks" not in loaded
            and "blocks_0" in loaded and isinstance(target["blocks"], dict)):
        n = run_len(loaded)
        subs = [loaded[f"blocks_{i}"] for i in range(n)]
        try:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *subs)
            tgt = target["blocks"]
            # pre-scan SegBackbone laid blocks_i flat in its own scope; the
            # scanned layout nests them under a TransformerEncoder scope
            if (isinstance(tgt, dict) and set(tgt) == {"blocks"}
                    and "blocks" not in stacked):
                stacked = {"blocks": stacked}
            out["blocks"] = stacked
            handled.update(f"blocks_{i}" for i in range(n))
        except ValueError:
            pass  # ragged structures: leave as-is, the key report will show
    if "blocks_0" in target and "blocks" in loaded and "blocks" not in target:
        n = run_len(target)
        stacked = loaded["blocks"]
        depth = min(np.asarray(x).shape[0] for x in
                    jax.tree_util.tree_leaves(stacked)) if n else 0
        if n and n == depth:
            for i in range(n):
                out[f"blocks_{i}"] = jax.tree_util.tree_map(
                    lambda x: np.asarray(x)[i], stacked)
            handled.add("blocks")
    for k, v in loaded.items():
        if k in handled or k in out:
            continue
        out[k] = adapt_block_layout(v, target.get(k)) \
            if isinstance(target.get(k), dict) else v
    return out


# ---------------------------------------------------------------------------
# missing/unexpected key reports (reference utils/checkpoint.py:13-44)
# ---------------------------------------------------------------------------

def flatten_keys(tree, prefix="") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_keys(v, f"{prefix}{k}." if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def report_key_diff(expected_params, loaded_params, logger=None):
    exp = set(flatten_keys(expected_params))
    got = set(flatten_keys(loaded_params))
    missing = sorted(exp - got)
    unexpected = sorted(got - exp)
    if missing:
        print_log("missing keys:\n  " + "\n  ".join(missing), logger=logger)
    if unexpected:
        print_log("unexpected keys:\n  " + "\n  ".join(unexpected), logger=logger)
    return missing, unexpected


def merge_pretrained(params, loaded, logger=None):
    """Copy leaves from ``loaded`` into ``params`` wherever paths+shapes match
    (strict=False load with missing/unexpected reporting). Per-block vs
    scanned-stacked transformer layouts are adapted to the target first."""
    loaded = adapt_block_layout(loaded, params)
    flat_new = flatten_keys(loaded)
    merged_count = 0

    def visit(dst, prefix=""):
        nonlocal merged_count
        for k in list(dst.keys()):
            p = f"{prefix}{k}"
            if isinstance(dst[k], dict):
                visit(dst[k], p + ".")
            elif p in flat_new and np.shape(flat_new[p]) == np.shape(dst[k]):
                dst[k] = np.asarray(flat_new[p], dtype=np.asarray(dst[k]).dtype)
                merged_count += 1

    params = jax.tree_util.tree_map(np.asarray, params)
    visit(params)
    report_key_diff(params, loaded, logger=logger)
    print_log(f"[CKPT] merged {merged_count} matching tensors", logger=logger)
    return params
