"""TensorBoard writers + environment dump.

Reference parity: TensorBoardX writers created per train/val in main.py:36-37 and
fed per-batch scalars/images by the runners; env dump via mmcv collect_env
(utils/logger.py:132-141). Writers are created on process 0 only; elsewhere a
no-op stub is returned.
"""
from __future__ import annotations

import os
import platform
import sys


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


def get_writer(path: str):
    import jax
    if jax.process_index() != 0:
        return _NullWriter()
    try:
        from torch.utils.tensorboard import SummaryWriter
        os.makedirs(path, exist_ok=True)
        return SummaryWriter(path)
    except Exception:
        return _NullWriter()


def collect_env() -> dict:
    import jax
    env = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "CPU": platform.processor() or platform.machine(),
        "JAX": jax.__version__,
        "jax.devices": str(jax.devices()),
        "backend": jax.default_backend(),
        "process_count": jax.process_count(),
    }
    try:
        import flax
        import optax
        env["flax"] = flax.__version__
        env["optax"] = optax.__version__
    except Exception:
        pass
    return env


def basic_log(args, config, logger=None):
    """Env + args + config dump at startup (reference utils/logger.py:132-146)."""
    from act_tpu.utils.logger import print_log
    from act_tpu.utils.config import log_args_to_file, log_config_to_file
    for k, v in collect_env().items():
        print_log(f"{k}: {v}", logger=logger)
    log_args_to_file(args, "args", logger=logger)
    log_config_to_file(config, "config", logger=logger)
