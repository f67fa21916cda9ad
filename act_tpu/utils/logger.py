"""Process-aware logging (reference parity: ``utils/logger.py``).

``get_logger`` creates a named logger whose FileHandler is attached only on process 0;
non-zero processes are silenced to ERROR — the JAX-native analog of the reference's
rank-gated mmcv logger (``utils/logger.py:32-104``). ``print_log`` dispatches a message
to a logger by name / logger object / ``None`` (plain print) / ``'silent'``.
"""
from __future__ import annotations

import logging
from typing import Optional, Union

logger_initialized = {}


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_logger(name: str, log_file: Optional[str] = None,
               log_level: int = logging.INFO, file_mode: str = "w") -> logging.Logger:
    logger = logging.getLogger(name)
    if name in logger_initialized:
        return logger
    # avoid duplicate handlers from ancestor loggers
    for logger_name in logger_initialized:
        if name.startswith(logger_name):
            return logger

    handlers: list = [logging.StreamHandler()]
    rank = _process_index()
    if rank == 0 and log_file is not None:
        handlers.append(logging.FileHandler(log_file, file_mode))

    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    for handler in handlers:
        handler.setFormatter(formatter)
        handler.setLevel(log_level)
        logger.addHandler(handler)

    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    logger_initialized[name] = True
    return logger


def get_root_logger(log_file: Optional[str] = None, log_level: int = logging.INFO,
                    name: str = "act_tpu") -> logging.Logger:
    return get_logger(name=name, log_file=log_file, log_level=log_level)


def print_log(msg: str, logger: Union[logging.Logger, str, None] = None,
              level: int = logging.INFO):
    if logger is None:
        print(msg)
    elif isinstance(logger, logging.Logger):
        logger.log(level, msg)
    elif logger == "silent":
        pass
    elif isinstance(logger, str):
        get_logger(logger).log(level, msg)
    else:
        raise TypeError(f"logger must be a Logger, str, 'silent' or None, got {type(logger)}")
