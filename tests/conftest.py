"""Test harness: force the CPU backend with a virtual 8-device mesh so
sharding tests run anywhere (real-TPU validation happens via bench.py on
hardware).

Note: this environment pre-imports jax via sitecustomize and pins the 'axon'
TPU platform through jax.config, so overriding the JAX_PLATFORMS env var is
not enough — we must update the config directly (backends are created lazily,
at first use, which is after conftest import)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
