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
    """Profile any bench_suite workload:
    PROFILE_WORKLOAD=pointbert|dvae|finetune|partseg|semseg."""
    import jax
    import jax.numpy as jnp
    import tools.bench_suite as bs
    if workload == "pointbert":
        step, state, mk, extra, B = bs.setup_pointbert()
    elif workload == "dvae":
        step, state, mk, extra, B = bs.setup_dvae()
    elif workload == "finetune":
        step, state, mk, extra, B, _, _ = bs.setup_finetune()
    elif workload == "partseg":
        step, state, mk, extra, B = bs.setup_partseg()
    elif workload == "semseg":
        step, state, mk, extra, B, _ = bs.setup_semseg()
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
    """Profile the Stage-II pretrain multi-step program (bench.py shapes),
    reusing the bench_suite setup so the profiled program IS the bench
    program."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import tools.bench_suite as bs
    from act_tpu.engine.train_state import make_multi_step
    from jax.sharding import NamedSharding, PartitionSpec as P
    from act_tpu.parallel import make_mesh

    step, state, mk, extra, batch = bs.setup_pretrain()
    K = int(os.environ.get("BENCH_SCAN_STEPS", "8"))
    multi = make_multi_step(step, K)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.normal(size=(K, batch, 1024, 3)),
                          dtype=jnp.float32)
    stacked = jax.device_put(stacked, NamedSharding(mesh, P(None, "data")))
    key = jax.random.PRNGKey(0)

    with mesh:
        for _ in range(2):
            state, metrics = multi(state, stacked, key)
        _ = float(metrics["loss"])
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                state, metrics = multi(state, stacked, key)
            _ = float(metrics["loss"])


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
