"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via XLA's host-platform device-count
override (the TPU-world substitute for a fake distributed backend). Pallas
kernels run in interpreter mode on CPU; the driver's bench run exercises the
compiled kernels on real TPU hardware.
"""
import os

if os.environ.get("ACT_TPU_TEST_TPU", "0") != "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    # jax may already be imported (site customization); the config value latched
    # from the env at import time, so update it through the config API too.
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
