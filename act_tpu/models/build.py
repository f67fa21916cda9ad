"""The MODELS registry (reference models/build.py)."""
from act_tpu.utils.registry import Registry

MODELS = Registry("model")


def build_model_from_cfg(cfg, **kwargs):
    """cfg: config node with a NAME key -> unbound flax module instance."""
    return MODELS.build(cfg, **kwargs)
