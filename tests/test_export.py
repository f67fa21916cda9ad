"""AOT serving export (act_tpu/engine/export.py) — beyond-reference feature.

The artifact must reproduce the in-process eval forward exactly, support a
symbolic batch dimension, and roundtrip through serialize/deserialize with no
model code in scope (the deserialized callable is pure StableHLO).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from act_tpu.utils.config import ConfigDict


def tiny_config(cls_dim=6, npoints=128):
    return ConfigDict(dict(
        model=ConfigDict(dict(
            NAME="PointTransformer", embed_dim=32, depth=2,
            drop_path_rate=0.0, cls_dim=cls_dim, num_heads=4, group_size=8,
            num_group=16, encoder_dims=32, transfer_type="full")),
        npoints=npoints))


class TestExportClassifier:
    def test_fixed_batch_matches_direct_apply(self, rng):
        from act_tpu.engine import export as ex
        config = tiny_config()
        exp = ex.export_classifier(config, batch=4)
        model, variables = ex.load_variables(config, None, seed=0)
        infer = ex.build_infer_fn(model, variables, int(config.npoints))
        pts = jnp.asarray(rng.normal(size=(4, 128, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(exp.call(pts)),
                                   np.asarray(infer(pts)),
                                   rtol=1e-5, atol=1e-5)

    def test_symbolic_batch_two_sizes(self, rng):
        from act_tpu.engine import export as ex
        config = tiny_config()
        exp = ex.export_classifier(config, batch=None)
        model, variables = ex.load_variables(config, None, seed=0)
        infer = ex.build_infer_fn(model, variables, int(config.npoints))
        for B in (2, 5):
            pts = jnp.asarray(rng.normal(size=(B, 128, 3)).astype(np.float32))
            got = np.asarray(exp.call(pts))
            assert got.shape == (B, 6)
            np.testing.assert_allclose(got, np.asarray(infer(pts)),
                                       rtol=1e-5, atol=1e-5)

    def test_serialize_roundtrip_and_sidecar(self, rng, tmp_path):
        from act_tpu.engine import export as ex
        config = tiny_config()
        exp = ex.export_classifier(config, batch=3)
        dst = str(tmp_path / "model.actx")
        ex.save_exported(exp, dst, meta={"npoints": 128, "with_fps": True})
        fn = ex.load_exported(dst)
        pts = rng.normal(size=(3, 128, 3)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(fn(pts)),
                                      np.asarray(exp.call(jnp.asarray(pts))))
        side = json.loads((tmp_path / "model.actx.json").read_text())
        assert side["magic"] == "act-tpu-export-v1"
        assert side["platforms"] == ["cpu"]

    def test_export_with_checkpoint_weights(self, rng, tmp_path):
        """Exported logits must reflect the loaded checkpoint, not init."""
        from act_tpu.engine import export as ex
        import orbax.checkpoint as ocp
        config = tiny_config()
        model, variables = ex.load_variables(config, None, seed=0)
        bumped = jax.tree_util.tree_map(lambda x: x + 0.05,
                                        variables["params"])
        ckpt = str(tmp_path / "ckpt-best")
        ocp.PyTreeCheckpointer().save(ckpt, {
            "params": jax.device_get(bumped),
            "batch_stats": jax.device_get(variables.get("batch_stats", {}))},
            force=True)
        exp = ex.export_classifier(config, ckpt_path=ckpt, batch=2)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        infer0 = ex.build_infer_fn(model, variables, int(config.npoints))
        infer1 = ex.build_infer_fn(
            model, {**variables, "params": bumped}, int(config.npoints))
        got = np.asarray(exp.call(pts))
        assert not np.allclose(got, np.asarray(infer0(pts)))
        np.testing.assert_allclose(got, np.asarray(jax.jit(infer1)(pts)),
                                   rtol=1e-5, atol=1e-5)

    def test_dvae_recon_export(self, rng):
        """Stage-I serving export reproduces the autoencoder eval forward
        (hard assignment, pinned gumbel) and keeps the batch dim symbolic."""
        from act_tpu.engine import export as ex
        from tests.test_models import tiny_dvae_cfg
        config = ConfigDict(dict(model=tiny_dvae_cfg(NAME="DiscreteVAE"),
                                 npoints=128))
        exp = ex.export_dvae_recon(config, batch=None)
        model, variables = ex.load_variables(config, None, seed=0)
        for B in (1, 3):
            pts = jnp.asarray(rng.normal(size=(B, 128, 3)).astype(np.float32))
            direct = model.apply(variables, pts, 1.0, True,
                                 rngs=dict(gumbel=jax.random.PRNGKey(0)))[1]
            got = np.asarray(exp.call(pts))
            assert got.shape == (B, 128, 3)
            np.testing.assert_allclose(got, np.asarray(direct),
                                       rtol=1e-5, atol=1e-5)

    def test_cross_platform_artifact(self, rng, tmp_path):
        """--platforms cpu,tpu from a CPU host: one artifact lowered for both
        (the pure-XLA trace is portable; no TPU needed at export time)."""
        from act_tpu.engine import export as ex
        config = tiny_config()
        exp = ex.export_classifier(config, batch=2, platforms=["cpu", "tpu"])
        assert tuple(exp.platforms) == ("cpu", "tpu")
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        assert np.asarray(exp.call(pts)).shape == (2, 6)
        dst = str(tmp_path / "xplat.actx")
        ex.save_exported(exp, dst, meta={})
        fn = ex.load_exported(dst)
        np.testing.assert_array_equal(np.asarray(fn(pts)),
                                      np.asarray(exp.call(pts)))

    def test_features_export(self, rng):
        """Pretrain embedding extractor (SVM-probe forward): symbolic batch,
        FPS engages when n_in != npoints, matches the direct noaug apply."""
        from act_tpu.engine import export as ex
        from tests.test_models import tiny_pretrain_cfg
        config = ConfigDict(dict(model=tiny_pretrain_cfg(), npoints=128))
        exp = ex.export_features(config, batch=None, n_in=160)
        model, variables = None, None
        from act_tpu.models import MODELS
        model = MODELS.build(config.model)
        key = jax.random.PRNGKey(0)
        rngs = dict(params=key, mask=key, dropout=key, droppath=key,
                    gumbel=key)
        variables = jax.device_get(jax.jit(lambda: model.init(
            rngs, jnp.zeros((2, 128, 3), jnp.float32)))())
        from act_tpu import ops as aops

        def direct(pts):
            pts = aops.gather_points(
                pts, aops.furthest_point_sample(pts, 128))
            return model.apply(variables, pts, noaug=True,
                               rngs=dict(gumbel=key, mask=key))
        pts = jnp.asarray(rng.normal(size=(3, 160, 3)).astype(np.float32))
        got = np.asarray(exp.call(pts))
        assert got.ndim == 2 and got.shape[0] == 3
        np.testing.assert_allclose(got, np.asarray(jax.jit(direct)(pts)),
                                   rtol=1e-5, atol=1e-5)

    def test_dvae_tokenize_export(self, rng):
        """Tokenizer export: (B, N, 3) -> (B, G) int codebook ids matching
        the direct forward_tokenizer path."""
        from act_tpu.engine import export as ex
        from act_tpu import ops as aops
        from tests.test_models import tiny_dvae_cfg
        config = ConfigDict(dict(model=tiny_dvae_cfg(NAME="DiscreteVAE"),
                                 npoints=128))
        exp = ex.export_dvae_tokenize(config, batch=None)
        model, variables = ex.load_variables(config, None, seed=0)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        got = np.asarray(exp.call(pts))
        assert got.shape == (2, 16) and np.issubdtype(got.dtype, np.integer)
        nbr, center = aops.group_points(pts, 16, 8)
        direct = model.apply(variables, nbr, center,
                             method=model.forward_tokenizer)
        np.testing.assert_array_equal(got, np.asarray(direct))

    def test_symbolic_export_forces_xla_path(self, rng, monkeypatch):
        """From a Pallas-enabled host (real TPU, or interpret mode here) a
        symbolic-batch export must trace the pure-XLA reference ops — the
        Pallas kernels' tiling math needs concrete batch sizes (regression:
        InconclusiveDimensionOperation on a real-TPU host, 2026-08-18)."""
        from act_tpu.engine import export as ex
        monkeypatch.setenv("ACT_TPU_PALLAS", "interpret")
        config = tiny_config()
        exp = ex.export_classifier(config, batch=None, n_in=160)
        # env restored for the comparison trace below by computing it eagerly
        monkeypatch.setenv("ACT_TPU_PALLAS", "off")
        model, variables = ex.load_variables(config, None, seed=0)
        infer = ex.build_infer_fn(model, variables, int(config.npoints))
        pts = jnp.asarray(rng.normal(size=(3, 160, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(exp.call(pts)),
                                   np.asarray(jax.jit(infer)(pts)),
                                   rtol=1e-5, atol=1e-5)

    def test_http_server(self, rng, tmp_path):
        """tools/serve_http.py: /predict runs the artifact, /healthz reports
        the sidecar meta, malformed input is a 400 not a crash."""
        import http.client
        import threading
        from act_tpu.engine import export as ex
        from tools.serve_http import serve

        config = tiny_config()
        exp = ex.export_classifier(config, batch=None)
        dst = str(tmp_path / "m.actx")
        ex.save_exported(exp, dst, meta={"kind": "classifier", "n_in": 128})
        server = serve(dst, port=0)  # ephemeral port
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("GET", "/healthz")
            h = json.loads(conn.getresponse().read())
            assert h["ok"] and h["kind"] == "classifier"

            pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
            conn.request("POST", "/predict",
                         body=json.dumps({"points": pts.tolist()}),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 200
            out = json.loads(r.read())
            got = np.asarray(out["logits"], np.float32)
            assert got.shape == (2, 6)
            np.testing.assert_allclose(
                got, np.asarray(exp.call(jnp.asarray(pts))), rtol=1e-4,
                atol=1e-4)
            assert out["argmax"] == got.argmax(-1).tolist()

            conn.request("POST", "/predict",
                         body=json.dumps({"points": [[1.0, 2.0]]}))
            assert conn.getresponse().status == 400
        finally:
            server.shutdown()

    def test_http_server_tokenize(self, rng, tmp_path):
        """A 'tokenize' artifact serves integer codebook ids under the
        'tokens' key (not 'recon' — ADVICE r3)."""
        import http.client
        import threading
        from act_tpu.engine import export as ex
        from tests.test_models import tiny_dvae_cfg
        from tools.serve_http import serve

        config = ConfigDict(dict(model=tiny_dvae_cfg(NAME="DiscreteVAE"),
                                 npoints=128))
        exp = ex.export_dvae_tokenize(config, batch=None)
        dst = str(tmp_path / "tok.actx")
        ex.save_exported(exp, dst, meta={"kind": "tokenize", "n_in": 128})
        server = serve(dst, port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
            conn.request("POST", "/predict",
                         body=json.dumps({"points": pts.tolist()}),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 200
            out = json.loads(r.read())
            tokens = np.asarray(out["tokens"])
            assert tokens.shape == (2, 16)
            assert np.issubdtype(tokens.dtype, np.integer)
            np.testing.assert_array_equal(
                tokens, np.asarray(exp.call(jnp.asarray(pts))))
        finally:
            server.shutdown()

    def test_segmentation_export_semseg(self, rng):
        """Semseg artifact: symbolic batch, (B, N, 3) -> (B, N, 13) per-point
        log-probs equal to the direct eval forward (VERDICT r4 missing #4 —
        the whole-scene protocol's forward, reference main_test.py:54-139)."""
        from act_tpu.engine import export as ex
        from act_tpu.models import MODELS

        exp = ex.export_segmentation("semseg", npoint=128, num_group=16,
                                     batch=None, dtype="f32")
        pts = jnp.asarray(rng.normal(size=(3, 128, 3)).astype(np.float32))
        got = np.asarray(exp.call(pts))
        assert got.shape == (3, 128, 13)
        np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)

        # same seed -> same init -> the artifact must match a direct apply
        cfg = ConfigDict(dict(NAME="SemSegTransformer", cls_dim=13,
                              num_group=16, group_size=32, dtype="f32"))
        model = MODELS.build(cfg)
        key = jax.random.PRNGKey(0)
        variables = model.init(dict(params=key, dropout=key, droppath=key),
                               jnp.zeros((2, 128, 3), jnp.float32))
        direct = np.asarray(model.apply(variables, pts))
        np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-5)

    def test_segmentation_export_partseg_two_inputs(self, rng):
        """Partseg artifact takes (points, object one-hot) — the head's
        16-way label conv (reference part_segmentation/models/pt.py:213-215);
        the label input must actually steer the output."""
        from act_tpu.engine import export as ex

        exp = ex.export_segmentation("partseg", npoint=128, num_group=16,
                                     batch=2, dtype="f32")
        assert [tuple(a.shape) for a in exp.in_avals] == \
            [(2, 128, 3), (2, 16)]
        pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
        oh_a = np.eye(16, dtype=np.float32)[[0, 0]]
        oh_b = np.eye(16, dtype=np.float32)[[7, 7]]
        out_a = np.asarray(exp.call(jnp.asarray(pts), jnp.asarray(oh_a)))
        out_b = np.asarray(exp.call(jnp.asarray(pts), jnp.asarray(oh_b)))
        assert out_a.shape == (2, 128, 50)
        assert not np.allclose(out_a, out_b)  # label conv is live

    def test_http_server_segmentation(self, rng, tmp_path):
        """A partseg 'segmentation' artifact serves per-point labels; the
        cls_label request field accepts int ids; missing cls_label is a 400."""
        import http.client
        import threading
        from act_tpu.engine import export as ex
        from tools.serve_http import serve

        exp = ex.export_segmentation("partseg", npoint=128, num_group=16,
                                     batch=None, dtype="f32")
        dst = str(tmp_path / "seg.actx")
        ex.save_exported(exp, dst, meta={"kind": "segmentation",
                                         "seg_task": "partseg", "n_in": 128})
        server = serve(dst, port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
            conn.request("POST", "/predict",
                         body=json.dumps({"points": pts.tolist(),
                                          "cls_label": [0, 7],
                                          "return_log_probs": True}),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 200
            out = json.loads(r.read())
            labels = np.asarray(out["labels"])
            lp = np.asarray(out["log_probs"], np.float32)
            assert labels.shape == (2, 128) and lp.shape == (2, 128, 50)
            oh = np.eye(16, dtype=np.float32)[[0, 7]]
            direct = np.asarray(exp.call(jnp.asarray(pts), jnp.asarray(oh)))
            np.testing.assert_allclose(lp, direct, rtol=1e-4, atol=1e-4)
            np.testing.assert_array_equal(labels, direct.argmax(-1))

            conn.request("POST", "/predict",
                         body=json.dumps({"points": pts.tolist()}))
            assert conn.getresponse().status == 400  # cls_label required

            # out-of-range ids are a 400, not a silent np.eye wraparound
            conn.request("POST", "/predict",
                         body=json.dumps({"points": pts.tolist(),
                                          "cls_label": [-1, 3]}))
            assert conn.getresponse().status == 400
        finally:
            server.shutdown()

    @pytest.mark.slow
    @pytest.mark.parametrize("task", ["partseg", "semseg"])
    def test_cli_segmentation(self, tmp_path, task):
        """--kind segmentation through the real CLI (export + run), no yaml."""
        import subprocess
        import sys as _sys
        dst = str(tmp_path / f"{task}.actx")
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [_sys.executable, "tools/export_model.py", "export", "--kind",
             "segmentation", "--seg_task", task, "--dst", dst, "--smoke",
             "--batch", "2"],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        r = subprocess.run(
            [_sys.executable, "tools/export_model.py", "run", "--src", dst,
             "--batch", "2"],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "log_probs (2, 128," in r.stdout, r.stdout[-400:]

    @pytest.mark.slow
    def test_cli_end_to_end(self, tmp_path):
        import subprocess
        import sys as _sys
        dst = str(tmp_path / "m.actx")
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [_sys.executable, "tools/export_model.py", "export", "--config",
             "cfgs/finetune_classification/full/finetune_scan_hardest.yaml",
             "--dst", dst, "--smoke", "--batch", "sym", "--n_in", "300"],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        # run must honor the recorded n_in (artifact expects (b, 300, 3))
        r = subprocess.run(
            [_sys.executable, "tools/export_model.py", "run", "--src", dst,
             "--batch", "3"],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "logits (3," in r.stdout

    @pytest.mark.slow
    @pytest.mark.parametrize("kind,config,marker", [
        ("features", "cfgs/pretrain/pretrain_act_distill.yaml", "features (2,"),
        ("tokenize",
         "cfgs/autoencoder/act_dvae_with_pretrained_transformer.yaml",
         "tokens (2,"),
        ("dvae",
         "cfgs/autoencoder/act_dvae_with_pretrained_transformer.yaml",
         "recon (2,"),
    ])
    def test_cli_other_kinds(self, tmp_path, kind, config, marker):
        """Every export kind works through the real CLI (export + run)."""
        import subprocess
        import sys as _sys
        dst = str(tmp_path / f"{kind}.actx")
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [_sys.executable, "tools/export_model.py", "export", "--config",
             config, "--kind", kind, "--dst", dst, "--smoke"],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        r = subprocess.run(
            [_sys.executable, "tools/export_model.py", "run", "--src", dst,
             "--batch", "2"],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        assert marker in r.stdout, r.stdout[-400:]
