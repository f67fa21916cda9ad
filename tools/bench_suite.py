"""Multi-workload benchmark suite on the real chip -> BENCHMARKS.md.

bench.py is the driver-facing headline (Stage-II pretrain, one JSON line);
this suite covers the rest of the framework's hot paths so regressions
anywhere are visible:

  - stage2_pretrain : ACT_PointDistillation train step (same as bench.py)
  - stage2_pointbert: ACT_PointBERT train step (MoCo queue + EMA + mixup,
                      the alternate Stage-II graph; B=128, K=16384)
  - stage1_dvae     : ACTPromptedDiscreteVAEwithVIT train step (B=64, N=1024)
  - finetune_cls    : PointTransformer train step incl. the FPS-resample
                      augment from 8192 points (B=32, scan_hardest config)
  - finetune_infer  : eval forward incl. FPS to npoints (B=64)
  - partseg_step    : ShapeNetPart train step (B=16, N=2048, G=128)
  - semseg_step     : S3DIS train step (B=32, N=2048, G=128)
  - semseg_eval     : whole-scene sliding-window block forward (batched)
  - op microbenches : FPS / kNN / whole-cloud Chamfer kernels

Timing protocol (see CLAUDE.md): the tunnel caches identical dispatches and
block_until_ready returns before device completion, so every measured call
varies its inputs, chains K iterations with a data dependence inside one
program, fetches a scalar to host, and reports (t(K_big) - t(K_small)) /
(K_big - K_small).

Usage: python tools/bench_suite.py [--out BENCHMARKS.md]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _diff_time(make_fn, arg_maker, n_small=2, n_big=22, reps=5):
    """Per-iteration seconds via the two-length chained-loop protocol.

    arg_maker(i) must return DEVICE-RESIDENT args (generate on device and
    probe-fetch a scalar first) — a host->device transfer inside the timed
    call costs ~1s/33MB through the tunnel and swamps the measurement.
    min-of-reps suppresses transient tunnel hiccups."""
    best = {}
    for n in (n_small, n_big):
        fn = make_fn(n)
        _ = fn(*arg_maker(0))          # compile + warm
        ts = []
        for r in range(1, reps + 1):
            t0 = time.time()           # fresh args -> not tunnel-cached
            _ = fn(*arg_maker(1000 * n + r))
            ts.append(time.time() - t0)
        best[n] = min(ts)
    return max(best[n_big] - best[n_small], 1e-9) / (n_big - n_small)


def _device_normal(shape):
    """Returns mk(i) -> device-resident normal batch, materialized."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(seed):
        key = jax.random.wrap_key_data(
            jnp.stack([seed, seed ^ jnp.uint32(0x9E3779B9),
                       jnp.uint32(1), jnp.uint32(2)]), impl="rbg")
        return jax.random.normal(key, shape, jnp.float32)

    def mk(i):
        x = gen(jnp.uint32(i))
        _ = float(x.sum())  # force on-device materialization before timing
        return x

    return mk


def bench_train_step(step, state, batch_maker, extra=()):  # -> sec/step
    import jax
    import jax.numpy as jnp

    def make_fn(n):
        @jax.jit
        def many(state, batch, key):
            def body(carry, _):
                st, b = carry
                st, metrics = step(st, b, key, *extra)
                # data dependence: perturb the batch with the loss
                b = b * (1.0 + 1e-20 * metrics["loss"])
                return (st, b), metrics["loss"]
            (state, _), losses = jax.lax.scan(body, (state, batch), None,
                                              length=n)
            return losses.sum()
        return lambda *a: float(many(*a))

    def arg_maker(i):
        import jax
        return (state, batch_maker(i), jax.random.PRNGKey(i))

    return _diff_time(make_fn, arg_maker)


def setup_pretrain():
    import jax, jax.numpy as jnp
    import __graft_entry__ as ge
    from act_tpu.models import MODELS
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import TrainState, make_pretrain_step
    from act_tpu.engine.builder import (build_optimizer, cast_frozen_bf16,
                                        freeze_mask_from_paths)
    from act_tpu.datasets import transforms as T
    from act_tpu.utils.config import ConfigDict
    B = 128
    cfg = ge._pretrain_cfg(tiny=False)
    model = MODELS.build(cfg)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, 1024, 3)), jnp.float32)
    variables = jax.jit(lambda: model.init(ge._rngs(), pts))()
    tcfg = ConfigDict(dict(
        optimizer=dict(type="AdamW", kwargs=dict(lr=1e-3, weight_decay=0.05)),
        scheduler=dict(type="CosLR", kwargs=dict(epochs=300, initial_epochs=10)),
        step_per_update=1))
    trainable = freeze_mask_from_paths(variables["params"], ["dvae_tokenizer"])
    variables = {**variables, "params": cast_frozen_bf16(
        variables["params"], ["dvae_tokenizer"])}
    tx, _ = build_optimizer(tcfg, variables["params"], 100, trainable)
    state = replicate(mesh, TrainState.create(variables, tx))
    step = make_pretrain_step(model, transform_fn=T.scale_and_translate,
                              mesh=mesh, trainable_mask=trainable)
    mk = _device_normal((B, 1024, 3))
    return step, state, mk, (), B


def setup_pointbert():
    """ACT_PointBERT Stage-II at Point-BERT's published pretrain scale
    (reference models/act.py:913-1095; no yaml ships in the reference — the
    hyperparameters mirror Point-BERT's: B=128, MoCo K=16384, m=0.999,
    T=0.07, mask_ratio [0.25, 0.45], dvae+cutmix losses)."""
    import jax, jax.numpy as jnp
    import __graft_entry__ as ge
    from act_tpu.models import MODELS
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import TrainState, make_pretrain_step
    from act_tpu.engine.builder import (build_optimizer, cast_frozen_bf16,
                                        freeze_mask_from_paths)
    from act_tpu.datasets import transforms as T
    from act_tpu.utils.config import ConfigDict
    B = 128
    cfg = ge._pretrain_cfg(tiny=False)
    cfg.NAME = "ACT_PointBERT"
    cfg.m, cfg.T, cfg.K = 0.999, 0.07, 16384
    cfg.transformer_config.mask_ratio = [0.25, 0.45]
    cfg.transformer_config.moco_loss = False
    cfg.transformer_config.dvae_loss = True
    cfg.transformer_config.cutmix_loss = True
    model = MODELS.build(cfg)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, 1024, 3)), jnp.float32)
    variables = jax.jit(lambda: model.init(ge._rngs(), pts))()
    tcfg = ConfigDict(dict(
        optimizer=dict(type="AdamW", kwargs=dict(lr=1e-3, weight_decay=0.05)),
        scheduler=dict(type="CosLR", kwargs=dict(epochs=300, initial_epochs=10)),
        step_per_update=1))
    trainable = freeze_mask_from_paths(variables["params"],
                                       ["'dvae'", "transformer_k"])
    variables = {**variables,
                 "params": cast_frozen_bf16(variables["params"], ["'dvae'"])}
    tx, _ = build_optimizer(tcfg, variables["params"], 100, trainable)
    state = replicate(mesh, TrainState.create(variables, tx))
    step = make_pretrain_step(model, transform_fn=T.scale_and_translate,
                              mesh=mesh, loss_is_tuple=True,
                              ema_momentum=float(cfg.m),
                              trainable_mask=trainable)
    mk = _device_normal((B, 1024, 3))
    return step, state, mk, (), B


def setup_dvae():
    import jax, jax.numpy as jnp
    from act_tpu.models import MODELS
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import TrainState, make_autoencoder_step
    from act_tpu.engine import builder as engine_builder
    from act_tpu.utils.config import cfg_from_yaml_file
    cfg = cfg_from_yaml_file(
        "cfgs/autoencoder/act_dvae_with_pretrained_transformer.yaml")
    B, N = int(cfg.total_bs), int(cfg.npoints)
    model = MODELS.build(cfg.model)
    mesh = make_mesh()
    k = jax.random.PRNGKey(0)
    rngs = dict(params=k, gumbel=k, dropout=k, droppath=k, mask=k)
    sample = jnp.zeros((2, N, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(rngs, sample))()
    frozen = ["visual_embed']['blocks_", "visual_embed']['norm"]
    trainable = engine_builder.freeze_mask_from_paths(variables["params"],
                                                      frozen)
    variables = {**variables, "params": engine_builder.cast_frozen_bf16(
        variables["params"], ["visual_embed']['blocks_"])}
    tx, _ = engine_builder.build_optimizer(cfg, variables["params"], 100,
                                           trainable)
    state = replicate(mesh, TrainState.create(variables, tx))
    step = make_autoencoder_step(model, transform_fn=None, mesh=mesh,
                                 trainable_mask=trainable)
    mk = _device_normal((B, N, 3))
    extra = (jnp.float32(1.0), jnp.float32(0.0))  # temperature, kld_weight
    return step, state, mk, extra, B


def setup_finetune():
    import jax, jax.numpy as jnp
    from act_tpu import ops
    from act_tpu.models import MODELS
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import TrainState, make_finetune_step
    from act_tpu.engine import builder as engine_builder
    from act_tpu.datasets import transforms as T
    from act_tpu.utils.config import cfg_from_yaml_file
    cfg = cfg_from_yaml_file(
        "cfgs/finetune_classification/full/finetune_scan_hardest.yaml")
    B, npoints = int(cfg.total_bs), int(cfg.npoints)
    model = MODELS.build(cfg.model)
    mesh = make_mesh()
    k = jax.random.PRNGKey(0)
    rngs = dict(params=k, dropout=k, droppath=k, mask=k, gumbel=k)
    sample = jnp.zeros((2, npoints, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(rngs, sample))()
    tx, _ = engine_builder.build_optimizer(cfg, variables["params"], 100)
    state = replicate(mesh, TrainState.create(variables, tx))
    from act_tpu.engine.runner_finetune import _point_all
    point_all = _point_all(npoints)

    def train_transform(key, pts):
        k1, k2 = jax.random.split(key)
        pts = ops.fps_subsample(pts, point_all, npoints, k1)
        return T.rotate_y(k2, pts)

    raw_step = make_finetune_step(model, transform_fn=train_transform,
                                  mesh=mesh)
    # adapt to (state, batch, key) with labels folded into the batch tuple
    def step(st, pts, key):
        labels = jnp.zeros((pts.shape[0],), jnp.int32)
        return raw_step(st, pts, labels, key)

    mk = _device_normal((B, 8192, 3))
    return step, state, mk, (), B, model, npoints


def bench_infer(model, state, npoints, B=64):
    import jax, jax.numpy as jnp
    from act_tpu import ops

    def make_fn(n):
        @jax.jit
        def many(variables, pts):
            def body(carry, _):
                p = carry
                sub = ops.gather_points(
                    p, ops.furthest_point_sample(p, npoints))
                logits = model.apply(variables, sub)
                p = p + 1e-6 * logits.sum()  # real dependence (see bench_op)
                return p, logits.sum()
            _, sums = jax.lax.scan(body, pts, None, length=n)
            return sums.sum()
        return lambda *a: float(many(*a))

    variables = state.variables()
    gen = _device_normal((B, 8192, 3))
    mk = lambda i: (variables, gen(i))
    return _diff_time(make_fn, mk), B


def setup_partseg():
    """ShapeNetPart train step at the reference CLI defaults
    (part_segmentation/main.py: B=16, npoint=2048, num_group=128)."""
    import jax, jax.numpy as jnp
    from act_tpu.models import MODELS
    from act_tpu.models.segmentation import nll_seg_loss
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import TrainState, step_rngs, \
        _with_kernel_mesh
    from act_tpu.utils.config import ConfigDict
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    B, N = 16, 2048
    cfg = ConfigDict(dict(NAME="PartSegTransformer", cls_dim=50,
                          num_group=128, group_size=32, dtype="bf16"))
    model = MODELS.build(cfg)
    mesh = make_mesh()
    k = jax.random.PRNGKey(0)
    one_hot = jnp.zeros((B, 16), jnp.float32).at[:, 0].set(1.0)
    seg = jnp.zeros((B, N), jnp.int32)
    variables = jax.jit(lambda: model.init(
        dict(params=k, dropout=k, droppath=k), jnp.zeros((2, N, 3)),
        one_hot[:2]))()
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(2e-4))
    state = replicate(mesh, TrainState.create(variables, tx))

    def train_step(state, pts, key):
        from act_tpu.parallel import DATA_AXIS
        pts = jax.lax.with_sharding_constraint(
            pts, NamedSharding(mesh, P(DATA_AXIS)))
        rngs = step_rngs(key, state.step)
        rngs.pop("augment")

        def loss_fn(params):
            log_probs, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, one_hot, train=True, rngs=rngs,
                mutable=["batch_stats"])
            return nll_seg_loss(log_probs, seg), new_vars
        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return (state.replace(batch_stats=new_vars["batch_stats"]),
                {"loss": loss})

    step = jax.jit(_with_kernel_mesh(train_step, mesh))
    mk = _device_normal((B, N, 3))
    return step, state, mk, (), B


def setup_semseg():
    """S3DIS train step at the reference CLI defaults
    (semantic_segmentation/main.py: B=32, npoint=2048, num_group=128)."""
    import jax, jax.numpy as jnp
    from act_tpu.models import MODELS
    from act_tpu.models.segmentation import nll_seg_loss
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import TrainState, step_rngs, \
        _with_kernel_mesh
    from act_tpu.utils.config import ConfigDict
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    B, N, C = 32, 2048, 13
    cfg = ConfigDict(dict(NAME="SemSegTransformer", cls_dim=C,
                          num_group=128, group_size=32, dtype="bf16"))
    model = MODELS.build(cfg)
    mesh = make_mesh()
    k = jax.random.PRNGKey(0)
    seg = jnp.zeros((B, N), jnp.int32)
    weights = jnp.ones((C,), jnp.float32)
    variables = jax.jit(lambda: model.init(
        dict(params=k, dropout=k, droppath=k), jnp.zeros((2, N, 3))))()
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(2e-4))
    state = replicate(mesh, TrainState.create(variables, tx))

    def train_step(state, pts, key):
        from act_tpu.parallel import DATA_AXIS
        pts = jax.lax.with_sharding_constraint(
            pts, NamedSharding(mesh, P(DATA_AXIS)))
        rngs = step_rngs(key, state.step)
        rngs.pop("augment")

        def loss_fn(params):
            log_probs, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, train=True, rngs=rngs, mutable=["batch_stats"])
            return nll_seg_loss(log_probs, seg, weights), new_vars
        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return (state.replace(batch_stats=new_vars["batch_stats"]),
                {"loss": loss})

    step = jax.jit(_with_kernel_mesh(train_step, mesh))
    mk = _device_normal((B, N, 3))
    return step, state, mk, (), B, model


def bench_semseg_wholescene(model, state, B=16, N=2048):
    """Whole-scene vote eval device leg: the batched sliding-window block
    forward (runner_segmentation.whole_scene_eval batches eval_bs blocks
    per dispatch; reference main_test.py:99-124 runs one block per forward)."""
    import jax, jax.numpy as jnp

    def make_fn(n):
        @jax.jit
        def many(variables, pts):
            def body(carry, _):
                p = carry
                logits = model.apply(variables, p)
                p = p + 1e-6 * logits.sum()  # real dependence (see bench_op)
                return p, logits.sum()
            _, sums = jax.lax.scan(body, pts, None, length=n)
            return sums.sum()
        return lambda *a: float(many(*a))

    variables = state.variables()
    gen = _device_normal((B, N, 3))
    mk = lambda i: (variables, gen(i))
    return _diff_time(make_fn, mk), B


def bench_op(op_fn, shape_args, label):
    import jax, jax.numpy as jnp

    def make_fn(n):
        @jax.jit
        def many(x):
            def body(carry, _):
                out = op_fn(carry)
                # real data dependence: the op output perturbs the next
                # iteration's input (1e-20-style epsilons fold to identity
                # and XLA then hoists the loop-invariant op out of the scan)
                return carry + 1e-6 * out.astype(carry.dtype), out
            _, outs = jax.lax.scan(body, x, None, length=n)
            return outs.sum()
        return lambda *a: float(many(*a))

    gen = _device_normal(shape_args)
    mk = lambda i: (gen(i),)
    # ops can be sub-0.1ms: longer chains lift them out of dispatch noise
    return _diff_time(make_fn, mk, n_small=2, n_big=102)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCHMARKS.md")
    ap.add_argument("--only", default=None,
                    help="comma-separated workload keys (pretrain,pointbert,"
                         "dvae,finetune,partseg,semseg,ops) — skipped rows "
                         "keep their previous values from --out if it exists")
    args = ap.parse_args()
    KNOWN = {"pretrain", "pointbert", "dvae", "finetune", "partseg",
             "semseg", "ops"}
    only = set(args.only.split(",")) if args.only else None
    if only is not None and only - KNOWN:
        raise SystemExit(f"unknown --only keys {sorted(only - KNOWN)}; "
                         f"valid: {sorted(KNOWN)}")

    def want(key):
        return only is None or key in only

    prev_rows, prev_dev = {}, None
    if only is not None and os.path.exists(args.out):
        with open(args.out) as f:
            for ln in f:
                m = re.match(r"# Benchmarks \((\w+),", ln)
                if m:
                    prev_dev = m.group(1)
                if ln.startswith("|") and "|---" not in ln:
                    name = ln.split("|")[1].strip()
                    prev_rows[name] = ln.rstrip("\n")

    import jax
    from act_tpu import ops
    lines = []
    dev = jax.devices()[0].platform
    if prev_dev is not None and prev_dev != dev:
        # an --only run must not relabel kept rows measured on a different
        # platform (e.g. a CPU session rewriting TPU numbers as "cpu")
        raise SystemExit(
            f"--only would mix platforms: {args.out} holds {prev_dev} rows "
            f"but this session runs on {dev}. Re-run without --only, or on "
            f"the {prev_dev} backend.")
    lines.append(f"# Benchmarks ({dev}, single chip)\n")
    lines.append("Measured with chained-dependency K-step programs, fresh "
                 "inputs per dispatch (tools/bench_suite.py).\n")
    lines.append("| workload | batch | ms/step | items/sec/chip |")
    lines.append("|---|---|---|---|")

    def row(name, sec, B):
        lines.append(f"| {name} | {B} | {sec * 1000:.2f} | {B / sec:,.0f} |")
        print(lines[-1], flush=True)

    def keep(name):
        """Re-emit the previous row for a workload skipped via --only."""
        if name in prev_rows:
            lines.append(prev_rows[name])
            print(lines[-1], "(kept)", flush=True)
        else:
            print(f"WARNING: no previous row for {name!r} in {args.out}; "
                  f"it will be MISSING from the regenerated table",
                  file=sys.stderr, flush=True)

    if want("pretrain"):
        step, state, mk, extra, B = setup_pretrain()
        row("Stage-II pretrain step (ACT_PointDistillation)",
            bench_train_step(step, state, mk, extra), B)
    else:
        keep("Stage-II pretrain step (ACT_PointDistillation)")

    if want("pointbert"):
        step, state, mk, extra, B = setup_pointbert()
        row("Stage-II PointBERT step (MoCo K=16384 + mixup)",
            bench_train_step(step, state, mk, extra), B)
    else:
        keep("Stage-II PointBERT step (MoCo K=16384 + mixup)")

    if want("dvae"):
        step, state, mk, extra, B = setup_dvae()
        row("Stage-I dVAE step (prompted ViT-B teacher)",
            bench_train_step(step, state, mk, extra), B)
    else:
        keep("Stage-I dVAE step (prompted ViT-B teacher)")

    if want("finetune"):
        step, state, mk, extra, B, model, npoints = setup_finetune()
        row("Finetune cls step (incl. 8192-pt FPS resample)",
            bench_train_step(step, state, mk, extra), B)

        sec, Bi = bench_infer(model, state, npoints)
        row("Finetune inference (FPS to npoints + forward)", sec, Bi)
    else:
        keep("Finetune cls step (incl. 8192-pt FPS resample)")
        keep("Finetune inference (FPS to npoints + forward)")

    if want("partseg"):
        step, state, mk, extra, B = setup_partseg()
        row("PartSeg train step (ShapeNetPart, G=128)",
            bench_train_step(step, state, mk, extra), B)
    else:
        keep("PartSeg train step (ShapeNetPart, G=128)")

    if want("semseg"):
        step, state, mk, extra, B, smodel = setup_semseg()
        row("SemSeg train step (S3DIS, G=128)",
            bench_train_step(step, state, mk, extra), B)

        sec, Bi = bench_semseg_wholescene(smodel, state)
        row("SemSeg whole-scene eval forward (batched blocks)", sec, Bi)
    else:
        keep("SemSeg train step (S3DIS, G=128)")
        keep("SemSeg whole-scene eval forward (batched blocks)")

    lines.append("")
    lines.append("Sustained (loader-fed) Stage-II pretrain — "
                 "tools/bench_sustained.py over a\nsynthetic ShapeNet-shaped "
                 "file tree through the production DataLoader +\nrunner "
                 "(65-step profile epochs, steady-epoch min; attribution in "
                 "DESIGN.md\nround 5). This 1-core host feeds a ~35MB/s "
                 "tunneled chip; co-located hosts\nare bound by max(loader, "
                 "device) instead.")
    lines.append("")
    sus_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_sustained_last.json")
    try:
        with open(sus_path) as f:
            sus = json.load(f)
    except Exception:
        sus = {}
    if sus:
        if sus.get("ts"):
            # stale-but-attributed (bench.py convention): the sustained legs
            # come from the last bench_sustained run, not this suite run
            lines.append(f"(legs measured by tools/bench_sustained.py, "
                         f"last run {sus['ts']})")
            lines.append("")
        lines.append("| leg | clouds/sec | notes |")
        lines.append("|---|---|---|")
        if sus.get("loader"):
            lines.append(f"| loader-only assembly (1 thread) | "
                         f"{sus['loader']:,.0f} | get_batch fast path + "
                         f"memoized-header npy reads |")
        if sus.get("e2e_f32"):
            lines.append(f"| end-to-end sustained, f32 H2D | "
                         f"{sus['e2e_f32']:,.0f} | link-bound: 12.6MB f32 "
                         f"per 8-step scan window |")
        if sus.get("e2e_i16"):
            lines.append(f"| end-to-end sustained, --h2d_dtype i16 | "
                         f"{sus['e2e_i16']:,.0f} | halved H2D bytes; loss "
                         f"curve matches f32 |")
        lines.append("| device-only (bench.py, inputs resident) | see above "
                     "| the ceiling the loader must feed |")
    else:
        lines.append("(run tools/bench_sustained.py to fill this table)")
    lines.append("")
    lines.append("| op | shape | ms/call |")
    lines.append("|---|---|---|")

    def oprow(name, shape, sec):
        lines.append(f"| {name} | {shape} | {sec * 1000:.3f} |")
        print(lines[-1], flush=True)

    if want("ops"):
        oprow("furthest_point_sample", "(128, 1024) -> 64",
              bench_op(lambda x: ops.furthest_point_sample(x, 64).sum() * 1.0,
                       (128, 1024, 3), "fps"))
        oprow("knn (group)", "(128, 64, 1024) k=32",
              bench_op(lambda x: ops.knn(x, x[:, :64], 32)[1].sum() * 1.0,
                       (128, 1024, 3), "knn"))
        oprow("chamfer_distance_l1", "(32, 2048) vs (32, 2048)",
              bench_op(lambda x: ops.chamfer_distance_l1(x, x[:, ::-1] + 0.01),
                       (32, 2048, 3), "chamfer"))
    else:
        keep("furthest_point_sample")
        keep("knn (group)")
        keep("chamfer_distance_l1")

    out = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(out)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
