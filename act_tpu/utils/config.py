"""YAML config system with ``_base_`` includes and attribute access.

Replicates the public config surface of the reference (``utils/config.py:18-63``):
``cfg_from_yaml_file`` resolves recursive ``_base_`` includes relative to the repo
root, merges leaf-over-base, and returns an attribute-accessible dict. The same YAML
files that drive the reference drive this framework.
"""
from __future__ import annotations

import os
import shutil
from typing import Any

import yaml


class ConfigDict(dict):
    """A dict with attribute access (stand-in for easydict.EasyDict)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = {} if d is None else dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any):
        self[name] = _wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, _wrap(value))

    def __delattr__(self, name: str):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def copy(self) -> "ConfigDict":
        return ConfigDict({k: v for k, v in self.items()})


def _wrap(v: Any) -> Any:
    from collections.abc import Mapping
    if isinstance(v, Mapping) and not isinstance(v, ConfigDict):
        # covers plain dicts and flax FrozenDicts alike
        return ConfigDict({k: x for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def as_cfg(d) -> "ConfigDict":
    """Coerce any Mapping (e.g. a flax FrozenDict that linen made out of a module's
    config attribute) back into an attribute-accessible ConfigDict."""
    if isinstance(d, ConfigDict):
        return d
    return ConfigDict({k: v for k, v in d.items()})


def merge_new_config(config: ConfigDict, new_config: dict) -> ConfigDict:
    """Merge ``new_config`` into ``config``; resolves ``_base_`` includes first.

    Mirrors reference ``utils/config.py:18-35``: a ``_base_`` key is replaced by the
    loaded base file's contents, then sibling keys override recursively.
    """
    for key, val in new_config.items():
        if key == "_base_":
            with open(val) as f:
                base = yaml.safe_load(f)
            config[key] = ConfigDict()
            merge_new_config(config[key], base)
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config.get(key), dict):
                config[key] = ConfigDict()
            merge_new_config(config[key], val)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file: str) -> ConfigDict:
    config = ConfigDict()
    with open(cfg_file) as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config=config, new_config=new_config)
    return config


def get_config(args, logger=None) -> ConfigDict:
    """Load the experiment config; on ``--resume`` re-read the snapshot saved in the
    experiment dir (reference ``utils/config.py:47-58``)."""
    if getattr(args, "resume", False):
        cfg_path = os.path.join(args.experiment_path, "config.yaml")
        if not os.path.exists(cfg_path):
            if logger is not None:
                logger.error(f"Failed to resume: {cfg_path} not found")
            raise FileNotFoundError(cfg_path)
        args.config = cfg_path
    config = cfg_from_yaml_file(args.config)
    if not getattr(args, "resume", False) and getattr(args, "local_rank", 0) == 0 \
            and getattr(args, "experiment_path", None):
        save_experiment_config(args, config, logger)
    return config


def save_experiment_config(args, config, logger=None):
    config_path = os.path.join(args.experiment_path, "config.yaml")
    os.makedirs(args.experiment_path, exist_ok=True)
    shutil.copy2(args.config, config_path)
    if logger is not None:
        logger.info(f"Copied config to {config_path}")


def log_args_to_file(args, pre="args", logger=None):
    for key, val in args.__dict__.items():
        if logger is not None:
            logger.info(f"{pre}.{key} : {val}")


def log_config_to_file(cfg, pre="cfg", logger=None):
    for key, val in cfg.items():
        if isinstance(cfg[key], ConfigDict):
            if logger is not None:
                logger.info(f"{pre}.{key} = ConfigDict()")
            log_config_to_file(cfg[key], pre=f"{pre}.{key}", logger=logger)
            continue
        if logger is not None:
            logger.info(f"{pre}.{key} : {val}")
