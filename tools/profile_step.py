"""Profile the Stage-II pretrain step on the real chip and print a device-time
breakdown by framework op (the source of DESIGN.md's "measured performance
anatomy" tables).

Usage:
    python tools/profile_step.py            # framework_op_stats, top 40 rows
    PROFILE_TOOL=hlo_stats python tools/profile_step.py

Captures a jax.profiler trace of a few multi-step dispatches of the exact
bench program (bench.py shapes), converts the xplane with xprof's
``framework_op_stats``/``hlo_stats`` tool, and prints rows sorted by total
self time. ~25ms tunnel dispatch cost is invisible here — this is
device-side time only.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_workload(trace_dir: str, workload: str, steps: int = 3) -> None:
    """Profile any bench_suite workload: PROFILE_WORKLOAD=dvae|finetune."""
    import jax
    import jax.numpy as jnp
    import tools.bench_suite as bs
    if workload == "dvae":
        step, state, mk, extra, B = bs.setup_dvae()
    elif workload == "finetune":
        step, state, mk, extra, B, _, _ = bs.setup_finetune()
    else:
        raise SystemExit(f"unknown workload {workload}")
    key = jax.random.PRNGKey(0)
    for i in range(2):
        state, metrics = step(state, mk(i), key, *extra)
    _ = float(metrics["loss"])
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, metrics = step(state, mk(10 + i), key, *extra)
        _ = float(metrics["loss"])


def capture(trace_dir: str, steps: int = 3) -> None:
    import jax
    import bench

    # warm up (compile) outside the trace, then trace a few dispatches
    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__ as ge
    from act_tpu.models import MODELS
    from act_tpu.parallel import make_mesh, replicate
    from act_tpu.engine.train_state import (TrainState, make_pretrain_step,
                                            make_multi_step)
    from act_tpu.engine.builder import (build_optimizer, cast_frozen_bf16,
                                        freeze_mask_from_paths)
    from act_tpu.datasets import transforms as T
    from act_tpu.utils.config import ConfigDict
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    K = int(os.environ.get("BENCH_SCAN_STEPS", "8"))
    cfg = ge._pretrain_cfg(tiny=False)
    model = MODELS.build(cfg)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(batch, 1024, 3)), dtype=jnp.float32)
    variables = jax.jit(lambda: model.init(ge._rngs(), pts))()
    train_cfg = ConfigDict(dict(
        optimizer=dict(type="AdamW", kwargs=dict(lr=1e-3, weight_decay=0.05)),
        scheduler=dict(type="CosLR", kwargs=dict(epochs=300, initial_epochs=10)),
        step_per_update=1))
    trainable = freeze_mask_from_paths(variables["params"], ["dvae_tokenizer"])
    variables = {**variables,
                 "params": cast_frozen_bf16(variables["params"],
                                            ["dvae_tokenizer"])}
    tx, _ = build_optimizer(train_cfg, variables["params"], 100, trainable)
    state = replicate(mesh, TrainState.create(variables, tx))
    step = make_pretrain_step(model, transform_fn=T.scale_and_translate,
                              mesh=mesh)
    multi = make_multi_step(step, K)
    stacked = jnp.asarray(rng.normal(size=(K, batch, 1024, 3)),
                          dtype=jnp.float32)
    stacked = jax.device_put(stacked, NamedSharding(mesh, P(None, "data")))
    key = jax.random.PRNGKey(0)

    with mesh:
        for _ in range(2):
            state, metrics = multi(state, stacked, key)
        jax.block_until_ready(metrics["loss"])
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                state, metrics = multi(state, stacked, key)
            jax.block_until_ready(metrics["loss"])


def report(trace_dir: str, tool: str, top: int) -> None:
    from xprof.convert import raw_to_tool_data as conv
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = conv.xspace_to_tool_data(paths, tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    try:
        rows = json.loads(data)
    except Exception:
        print(data[:4000])
        return
    # framework_op_stats/hlo_stats deliver gviz-style {cols, rows} tables
    if isinstance(rows, list):
        table = rows[0] if rows else {}
    else:
        table = rows
    cols = [c.get("label") or c.get("id") for c in table.get("cols", [])]
    out = []
    for r in table.get("rows", []):
        out.append([c.get("v") for c in r.get("c", [])])
    # find a self-time column to sort by
    key_idx = None
    for i, c in enumerate(cols):
        if c and "self" in str(c).lower() and "time" in str(c).lower():
            key_idx = i
            break
    if key_idx is not None:
        out.sort(key=lambda r: -(r[key_idx] or 0))
    print("\t".join(str(c) for c in cols))
    for r in out[:top]:
        print("\t".join(str(v) for v in r))


def main():
    tool = os.environ.get("PROFILE_TOOL", "framework_op_stats")
    top = int(os.environ.get("PROFILE_TOP", "40"))
    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="act_tpu_prof_")
    if not os.environ.get("PROFILE_REPORT_ONLY"):
        wl = os.environ.get("PROFILE_WORKLOAD", "pretrain")
        if wl == "pretrain":
            capture(trace_dir)
        else:
            capture_workload(trace_dir, wl)
    print(f"# trace: {trace_dir}", file=sys.stderr)
    report(trace_dir, tool, top)


if __name__ == "__main__":
    main()
