"""Test harness: force the CPU backend with a virtual 8-device mesh so
sharding tests run anywhere (real-TPU validation happens via bench.py on
hardware).

Note: this environment pre-imports jax via sitecustomize and pins the 'axon'
TPU platform through jax.config, so overriding the JAX_PLATFORMS env var is
not enough — we must update the config directly (backends are created lazily,
at first use, which is after conftest import)."""

import os

# `GIP_TPU_TESTS=1 python -m pytest tests/ -m tpu` runs the on-hardware
# tier (tests/test_tpu.py) against the real platform: skip the CPU forcing
# so Pallas kernels run compiled on the chip (VERDICT r3 #5)
RUN_TPU = os.environ.get("GIP_TPU_TESTS", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    # single-core hosts starve the 8 per-device SPMD threads; XLA's default
    # 40 s collective rendezvous timeout then ABORTS the process mid-test
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip the CPU XLA compiles that
# dominate the heavy tests (cold-run cost unchanged)
os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
# threshold 0: the suite's cost is hundreds of SMALL eager/pjit compiles
# (~30 ms each, 20 s total in the heaviest test alone) that a 1.0 s
# threshold never caches
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
