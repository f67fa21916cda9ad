"""DATASETS registry (reference datasets/build.py:4-14)."""
from act_tpu.utils.registry import Registry

DATASETS = Registry("dataset")


def build_dataset_from_cfg(cfg, default_args=None):
    """cfg: merged dataset node ({_base_: <file cfg>, others: {...}}) or a flat
    node with NAME. The reference merges `_base_` + `others` before dispatch."""
    from act_tpu.utils.config import ConfigDict
    if "_base_" in cfg:
        merged = ConfigDict(cfg["_base_"])
        merged.update(cfg.get("others", {}))
    else:
        merged = ConfigDict(cfg)
    if default_args:
        merged.update(default_args)
    return DATASETS.build(merged)
