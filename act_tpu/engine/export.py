"""AOT model export for serving (beyond the reference).

The PyTorch reference has no deployment story: serving a finetuned
PointTransformer means dragging the whole training repo (model code, CUDA
extensions, .pth checkpoints) into the serving image. Here an eval forward —
classifier logits, pretrain embedding features, discrete dVAE codebook ids,
or the Stage-I reconstruction — is jitted, lowered, and serialized with
``jax.export`` into a single self-contained StableHLO artifact: weights are
baked in as constants, the batch dimension can stay symbolic, and the artifact
reloads anywhere jax runs (CPU or TPU) with no model code, config, or
checkpoint on the serving side.

Portability note: symbolic-batch and cross-platform exports always trace the
pure-XLA reference ops (the Pallas kernels' tiling math needs concrete shapes,
and a ``tpu_custom_call`` is not portable) — such artifacts run anywhere.
Only a fixed-batch, TPU-only export from a TPU host keeps the native Pallas
kernels: faster, but its stability across runtime versions is not guaranteed
(the export is tagged accordingly).
"""
from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

from act_tpu import ops
from act_tpu.models import MODELS
from act_tpu.ops._backend import pallas_mode, pallas_override

MAGIC = "act-tpu-export-v1"


def load_variables(config, ckpt_path: Optional[str], seed: int = 0,
                   logger=None, strip: bool = True):
    """Init the model and merge a checkpoint through the shared load path
    (checkpoint.merge_checkpoint_into — the same one the finetune/t-SNE
    runners use, so exported weights cannot drift from what --test saw).
    ``strip=False`` when the target model itself roots the student at
    ACT_encoder/* (the pretrain feature-extractor export)."""
    from act_tpu.engine import checkpoint as ckpt_lib

    model = MODELS.build(config.model)
    npoints = int(config.npoints)
    key = jax.random.PRNGKey(seed)
    sample = jnp.zeros((2, npoints, 3), jnp.float32)
    rngs = dict(params=key, mask=key, dropout=key, droppath=key, gumbel=key)
    variables = jax.jit(lambda: model.init(rngs, sample))()
    variables = jax.device_get(variables)

    if ckpt_path:
        variables = ckpt_lib.merge_checkpoint_into(
            variables, ckpt_path, logger=logger, tag="EXPORT", strip=strip)
    return model, variables


def build_infer_fn(model, variables, npoints: int, with_fps: bool = True):
    """The serving forward: (B, N, 3) points -> (B, cls_dim) logits.

    ``with_fps`` prepends the reference eval protocol's FPS resample to
    ``npoints`` (runner_finetune.infer_step); with it off the input must
    already be (B, npoints, 3).
    """
    def infer(pts):
        if with_fps:
            pts = ops.gather_points(pts,
                                    ops.furthest_point_sample(pts, npoints))
        return model.apply(variables, pts)
    return infer


def _export_specs(infer, specs: Sequence[jax.ShapeDtypeStruct],
                  concrete_batch: bool,
                  platforms: Optional[Sequence[str]]) -> "jexport.Exported":
    """Lower + export ``infer`` over the given input specs.

    Symbolic-batch exports must trace the pure-XLA reference ops (the
    Pallas kernels' tiling math needs concrete batch sizes), and so must
    cross-platform artifacts (tpu_custom_call is not portable) and
    interpret-mode hosts (a debugging device, not a serving path).
    """
    cross = platforms is not None and set(platforms) != {"tpu"}
    keep_pallas = (pallas_mode() == "tpu" and concrete_batch and not cross)

    if keep_pallas:
        # Pallas kernels serialize as tpu_custom_calls; opt out of the
        # stability guarantee explicitly (see module docstring).
        disabled = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        return jexport.export(jax.jit(infer), platforms=platforms,
                              disabled_checks=disabled)(*specs)
    with pallas_override("off"):
        return jexport.export(jax.jit(infer), platforms=platforms)(*specs)


def _export_point_fn(infer, n_in: int, batch: Optional[int],
                     platforms: Optional[Sequence[str]]) -> "jexport.Exported":
    """Lower + export a (B, n_in, 3) -> array function. ``batch=None`` keeps
    the batch dimension symbolic (any B at call time)."""
    if batch is None:
        shape = jexport.symbolic_shape(f"b, {n_in}, 3")
    else:
        shape = (int(batch), n_in, 3)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    return _export_specs(infer, [spec], batch is not None, platforms)


def export_classifier(config, ckpt_path: Optional[str] = None,
                      batch: Optional[int] = None, n_in: Optional[int] = None,
                      with_fps: bool = True,
                      platforms: Optional[Sequence[str]] = None,
                      seed: int = 0, logger=None) -> "jexport.Exported":
    """Serving classifier: (B, n_in, 3) points -> (B, cls_dim) logits.
    ``n_in`` is the input point count (defaults to config.npoints)."""
    model, variables = load_variables(config, ckpt_path, seed=seed,
                                      logger=logger)
    npoints = int(config.npoints)
    n_in = int(n_in or npoints)
    if not with_fps and n_in != npoints:
        raise ValueError(f"--no-fps requires n_in == npoints ({npoints})")
    infer = build_infer_fn(model, variables, npoints, with_fps=with_fps)
    return _export_point_fn(infer, n_in, batch, platforms)


def export_features(config, ckpt_path: Optional[str] = None,
                    batch: Optional[int] = None, n_in: Optional[int] = None,
                    platforms: Optional[Sequence[str]] = None,
                    seed: int = 0, logger=None) -> "jexport.Exported":
    """Embedding extractor for a pretrain checkpoint: (B, n_in, 3) ->
    (B, D) cls features — the SVM-probe forward (runner_pretrain.feat_step:
    optional FPS resample + noaug eval). The checkpoint loads WITHOUT the
    student-prefix strip: the pretrain model itself roots the student at
    ACT_encoder/*."""
    model, variables = load_variables(config, ckpt_path, seed=seed,
                                      logger=logger, strip=False)
    npoints = int(config.npoints)
    n_in = int(n_in or npoints)
    key = jax.random.PRNGKey(seed)

    def feats(pts):
        if n_in != npoints:
            pts = ops.gather_points(pts,
                                    ops.furthest_point_sample(pts, npoints))
        return model.apply(variables, pts, noaug=True,
                           rngs=dict(gumbel=key, mask=key))
    return _export_point_fn(feats, n_in, batch, platforms)


def export_dvae_tokenize(config, ckpt_path: Optional[str] = None,
                         batch: Optional[int] = None,
                         platforms: Optional[Sequence[str]] = None,
                         seed: int = 0, logger=None) -> "jexport.Exported":
    """Discrete tokenizer: (B, npoints, 3) cloud -> (B, G) int32 codebook
    ids — the deterministic argmax labels (dvae.forward_tokenizer, reference
    dvae.py:578-582). The encode half of the codec; useful for preparing
    BERT-style token targets offline."""
    model, variables = load_variables(config, ckpt_path, seed=seed,
                                      logger=logger)
    n_in = int(config.npoints)
    num_group = int(config.model.num_group)
    group_size = int(config.model.group_size)

    def tokenize(pts):
        nbr, center = ops.group_points(pts, num_group, group_size)
        return model.apply(variables, nbr, center,
                           method=model.forward_tokenizer)
    return _export_point_fn(tokenize, n_in, batch, platforms)


def export_dvae_recon(config, ckpt_path: Optional[str] = None,
                      batch: Optional[int] = None,
                      platforms: Optional[Sequence[str]] = None,
                      seed: int = 0, logger=None) -> "jexport.Exported":
    """Stage-I serving: (B, npoints, 3) cloud -> (B, G*M, 3) reconstruction —
    the autoencoder eval forward (hard codebook assignment at temperature 1
    with a pinned gumbel draw, runner_autoencoder._get_recon_step)."""
    model, variables = load_variables(config, ckpt_path, seed=seed,
                                      logger=logger)
    n_in = int(config.npoints)

    def recon(pts):
        ret = model.apply(variables, pts, 1.0, True,
                          rngs=dict(gumbel=jax.random.PRNGKey(0)))
        return ret[1]  # whole_fine
    return _export_point_fn(recon, n_in, batch, platforms)


def export_segmentation(task: str, npoint: int = 2048,
                        ckpt_path: Optional[str] = None,
                        batch: Optional[int] = None, num_group: int = 128,
                        dtype: str = "bf16",
                        platforms: Optional[Sequence[str]] = None,
                        seed: int = 0, logger=None) -> "jexport.Exported":
    """Dense-prediction serving: per-point class log-probs.

    ``task='semseg'``: (B, npoint, 3) scene block -> (B, npoint, 13) S3DIS
    log-probs — the whole-scene vote protocol's forward (reference
    semantic_segmentation/main_test.py:54-139; one exported artifact serves
    every sliding-window block). ``task='partseg'``: (points, cls_label_one_hot
    (B, 16)) -> (B, npoint, 50) ShapeNetPart log-probs (the head consumes the
    object-category one-hot, reference part_segmentation/models/pt.py:213-215).

    Checkpoints load through the same path as whole_scene_eval: orbax dirs
    from the seg runners or torch-converted releases (adapt_block_layout
    handles either transformer-stack layout).
    """
    from act_tpu.engine import checkpoint as ckpt_lib
    from act_tpu.utils.config import ConfigDict

    if task not in ("partseg", "semseg"):
        raise ValueError(f"task must be partseg|semseg, got {task!r}")
    with_label = task == "partseg"
    cls_dim = 50 if with_label else 13
    n_cat = 16  # ShapeNetPart object categories
    cfg = ConfigDict(dict(
        NAME="PartSegTransformer" if with_label else "SemSegTransformer",
        cls_dim=cls_dim, num_group=int(num_group), group_size=32,
        dtype=dtype))
    model = MODELS.build(cfg)
    key = jax.random.PRNGKey(seed)
    rngs = dict(params=key, dropout=key, droppath=key)
    sample = [jnp.zeros((2, npoint, 3), jnp.float32)]
    if with_label:
        sample.append(jnp.zeros((2, n_cat), jnp.float32))
    variables = jax.jit(lambda: model.init(rngs, *sample))()
    variables = jax.device_get(variables)
    if ckpt_path:
        payload = ckpt_lib.load_checkpoint(ckpt_path)
        params = ckpt_lib.adapt_block_layout(
            payload.get("params", payload), variables["params"])
        ckpt_lib.report_key_diff(variables["params"], params, logger=logger)
        variables = {"params": params,
                     "batch_stats": payload.get("batch_stats",
                                                variables.get("batch_stats",
                                                              {}))}

    def infer(*inputs):
        return model.apply(variables, *inputs)

    if batch is None:
        b = jexport.symbolic_shape("b")[0]
        shapes = [(b, npoint, 3)] + ([(b, n_cat)] if with_label else [])
    else:
        shapes = [(int(batch), npoint, 3)] + (
            [(int(batch), n_cat)] if with_label else [])
    specs = [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes]
    return _export_specs(infer, specs, batch is not None, platforms)


def save_exported(exp: "jexport.Exported", dst: str, meta: dict) -> None:
    """One artifact file + a small json sidecar for humans/servers."""
    data = exp.serialize()
    with open(dst, "wb") as f:
        f.write(data)
    side = {"magic": MAGIC, "bytes": len(data),
            "in_shape": [str(d) for d in exp.in_avals[0].shape],
            "in_shapes": [[str(d) for d in a.shape] for a in exp.in_avals],
            "out_shape": [str(d) for d in exp.out_avals[0].shape],
            "platforms": list(exp.platforms), **meta}
    with open(dst + ".json", "w") as f:
        json.dump(side, f, indent=1)


def load_exported(src: str):
    """Deserialize an artifact; returns a callable (B, N, 3) -> output
    (logits / features / token ids / reconstruction, per the export kind)."""
    with open(src, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))

    def call(pts, *extra):
        # multi-input artifacts (partseg: points + object one-hot) take the
        # extra operands positionally
        args = [jnp.asarray(pts, jnp.float32)]
        args += [jnp.asarray(e, jnp.float32) for e in extra]
        return exp.call(*args)
    call.exported = exp
    return call
