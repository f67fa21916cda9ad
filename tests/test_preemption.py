"""Preemption-tolerant training (beyond reference: tools/builder.py resume is
epoch-granular — a preempted run there loses the whole in-flight epoch).

Contract pinned here:
- SIGTERM sets the guard flag (no exception, prior handler restored on
  uninstall);
- the loader's ``set_epoch(e, start_batch=k)`` yields exactly the batches an
  uninterrupted iteration would yield from position k (both worker paths);
- a preemption save carries the data cursor and ``resume_state`` re-enters the
  interrupted epoch at the right batch;
- the resumed run is BIT-EXACT with an uninterrupted one: per-step RNG folds
  ``state.step`` (train_state.step_rngs), loader order is a pure function of
  (seed, epoch), and state.step is checkpointed;
- the real finetune runner path (save + [PREEMPT] exit + mid-epoch [RESUME])
  works end-to-end through the CLI (slow).
"""
import os
import signal
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from act_tpu.datasets.loader import DataLoader
from act_tpu.engine import checkpoint as ckpt_lib
from act_tpu.engine.preemption import PreemptionGuard
from act_tpu.engine.train_state import TrainState, make_finetune_step
from act_tpu.models import MODELS
from act_tpu.utils.config import ConfigDict


class _ClsDataset:
    """Tiny deterministic (pts, label) dataset for loader tests."""

    def __init__(self, n=24, npts=32):
        rng = np.random.default_rng(7)
        self.x = rng.normal(size=(n, npts, 3)).astype(np.float32)
        self.y = (np.arange(n) % 4).astype(np.int32)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return ("syn", str(i), (self.x[i], self.y[i]))


class TestGuard:
    def test_sigterm_sets_flag(self):
        g = PreemptionGuard().install()
        try:
            assert not g.requested
            os.kill(os.getpid(), signal.SIGTERM)
            # synchronous delivery to the main thread on linux
            assert g.requested
        finally:
            g.uninstall()
        # after uninstall the old disposition is back
        assert signal.getsignal(signal.SIGTERM) != g._on_signal

    def test_preempt_at_step_env(self, monkeypatch):
        monkeypatch.setenv("ACT_TPU_PREEMPT_AT_STEP", "3")
        g = PreemptionGuard()
        assert not g.check(2)
        assert g.check(3)
        assert g.requested


class TestLoaderStartBatch:
    @pytest.mark.parametrize("num_workers", [0, 2])
    def test_skip_matches_full_iteration(self, num_workers):
        ds = _ClsDataset()
        full = DataLoader(ds, batch_size=4, shuffle=True, seed=11,
                          num_workers=num_workers)
        full.set_epoch(2)
        ref = list(full)
        part = DataLoader(ds, batch_size=4, shuffle=True, seed=11,
                          num_workers=num_workers)
        part.set_epoch(2, start_batch=3)
        got = list(part)
        assert len(got) == len(ref) - 3
        for (_, _, (xa, ya)), (_, _, (xb, yb)) in zip(ref[3:], got):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
        full.close()
        part.close()

    def test_next_epoch_resets_cursor(self):
        ds = _ClsDataset()
        ld = DataLoader(ds, batch_size=4, shuffle=True, seed=11)
        ld.set_epoch(0, start_batch=5)
        assert len(list(ld)) == len(ld) - 5
        ld.set_epoch(1)  # runner passes start_batch=0 for later epochs
        assert len(list(ld)) == len(ld)


def _tiny_cls_state():
    cfg = ConfigDict(dict(NAME="PointTransformer", embed_dim=16, depth=1,
                          drop_path_rate=0.0, cls_dim=4, num_heads=2,
                          group_size=4, num_group=4, encoder_dims=16,
                          transfer_type="full"))
    model = MODELS.build(cfg)
    key = jax.random.PRNGKey(0)
    rngs = dict(params=key, mask=key, dropout=key, droppath=key)
    variables = model.init(rngs, jnp.zeros((2, 32, 3)))
    tx = optax.adamw(1e-3)
    return model, TrainState.create(variables, tx), tx


class TestMidEpochResumeBitExact:
    def test_resume_matches_uninterrupted(self, tmp_path):
        """Preempt after batch k of epoch 0, resume, finish 2 epochs -> final
        params/opt moments BIT-EQUAL to the uninterrupted run (the runner's
        loop protocol: set_epoch(start_batch), step RNG folded on state.step)."""

        class A:
            experiment_path = str(tmp_path)

        ds = _ClsDataset()
        key = jax.random.PRNGKey(42)
        model, state, tx = _tiny_cls_state()
        step = make_finetune_step(model)

        def run_epochs(state, start_epoch, start_batch, epochs=2):
            ld = DataLoader(ds, batch_size=4, shuffle=True, seed=5)
            for epoch in range(start_epoch, epochs):
                ld.set_epoch(epoch, start_batch=start_batch
                             if epoch == start_epoch else 0)
                for _, _, (pts, label) in ld:
                    state, _ = step(state, jnp.asarray(pts),
                                    jnp.asarray(label), key)
            return state

        # uninterrupted reference
        ref = run_epochs(state, 0, 0)

        # preempted run: 2 batches of epoch 0, mid-epoch save, fresh resume
        _, state_b, _ = _tiny_cls_state()
        ld = DataLoader(ds, batch_size=4, shuffle=True, seed=5)
        ld.set_epoch(0)
        it = iter(ld)
        for _ in range(2):
            _, _, (pts, label) = next(it)
            state_b, _ = step(state_b, jnp.asarray(pts),
                              jnp.asarray(label), key)
        ckpt_lib.save_checkpoint(state_b, 0, None, None, "ckpt-last", A(),
                                 block=True,
                                 data_iter={"epoch": 0, "next_batch": 2})

        _, fresh, _ = _tiny_cls_state()
        fresh, start_epoch, _, start_batch = ckpt_lib.resume_state(fresh, A())
        assert (start_epoch, start_batch) == (0, 2)
        assert int(fresh.step) == 2
        resumed = run_epochs(fresh, start_epoch, start_batch)

        for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(ref.opt_state),
                        jax.tree_util.tree_leaves(resumed.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(ref.step) == int(resumed.step)

    def test_epoch_end_save_has_no_cursor(self, tmp_path):
        """A normal epoch-end save still resumes at epoch+1, batch 0."""

        class A:
            experiment_path = str(tmp_path)

        _, state, _ = _tiny_cls_state()
        ckpt_lib.save_checkpoint(state, 3, None, None, "ckpt-last", A(),
                                 block=True)
        _, fresh, _ = _tiny_cls_state()
        fresh, start_epoch, _, start_batch = ckpt_lib.resume_state(fresh, A())
        assert (start_epoch, start_batch) == (4, 0)


@pytest.mark.slow
class TestRunnerPreemptionE2E:
    def test_finetune_preempt_then_resume(self, tmp_path):
        """Real CLI: ACT_TPU_PREEMPT_AT_STEP=1 stops the smoke finetune after
        one optimizer step with a mid-epoch ckpt; --resume re-enters the
        interrupted epoch at batch 1 and completes."""
        def run(*flags, preempt_at=None):
            env = {**os.environ, "JAX_PLATFORMS": "cpu"}
            env.pop("ACT_TPU_PREEMPT_AT_STEP", None)
            if preempt_at is not None:
                env["ACT_TPU_PREEMPT_AT_STEP"] = str(preempt_at)
            code = (
                "import jax; jax.config.update('jax_platforms','cpu');"
                "import sys; sys.argv=['main.py',%s];"
                "import main as m; m.main()" % (
                    ",".join(repr(f) for f in flags)))
            r = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                               env=env, capture_output=True, text=True,
                               timeout=540)
            assert r.returncode == 0, r.stderr[-2000:]

        exp = "ci_preempt"
        flags = ("--config",
                 "cfgs/finetune_classification/full/finetune_scan_hardest.yaml",
                 "--exp_name", exp, "--smoke", "--finetune_model")
        run(*flags, preempt_at=1)
        exp_dir = ("work_dirs/finetune_scan_hardest/full/" + exp)
        ckpt = os.path.join("/root/repo", exp_dir, "ckpt-last")
        assert os.path.exists(ckpt)
        payload = ckpt_lib.load_checkpoint(ckpt)
        assert payload["data_iter"] == {"epoch": 0, "next_batch": 1}

        run("--config", "cfgs/finetune_classification/full/"
            "finetune_scan_hardest.yaml", "--exp_name", exp, "--smoke",
            "--finetune_model", "--resume")
        payload = ckpt_lib.load_checkpoint(ckpt)
        # the resumed run finished the epoch and saved a normal epoch-end ckpt
        assert "data_iter" not in payload or not payload["data_iter"]
