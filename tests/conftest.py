"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without a TPU pod (SURVEY.md §4.4).

The axon TPU plugin registers itself at interpreter startup (sitecustomize)
and force-sets jax_platforms="axon,cpu", so JAX_PLATFORMS env alone is not
enough — we re-select cpu via jax.config after import. XLA_FLAGS must be
set before the CPU client initializes (it is lazy, so this is safe here).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
