"""act_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
RunpeiDong/ACT (ICLR 2023): two-stage cross-modal self-supervised pretraining for 3D
point clouds, plus downstream classification / few-shot / part- and semantic-segmentation.

Layer map (see SURVEY.md for the reference analysis this was built to):

- ``act_tpu.ops``       — the irregular point-cloud kernel substrate (FPS, kNN grouping,
                          Chamfer distance, 3-NN feature interpolation) as Pallas TPU
                          kernels with pure-XLA reference implementations.
- ``act_tpu.utils``     — registry / config (_base_ YAML merge) / logger / meters / misc.
- ``act_tpu.datasets``  — ShapeNet55, ModelNet, ScanObjectNN, few-shot, ShapeNetPart,
                          S3DIS loaders + vmapped batch augmentations.
- ``act_tpu.models``    — flax.linen model zoo: DiscreteVAE (+ prompted ViT/BERT teacher),
                          ACT distillation / PointBERT pretrainers, PointTransformer
                          classifier, segmentation heads.
- ``act_tpu.parallel``  — device-mesh construction and sharding helpers (DP today; the
                          mesh API is 2-D so TP is a config change).
- ``act_tpu.engine``    — functional train steps, optimizer/scheduler builders, runners,
                          orbax checkpointing + torch-checkpoint converter.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when site customization imported jax before this
# process could set the env var (the config value latches at jax import time).
import os as _os

if "JAX_PLATFORMS" in _os.environ:
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
