"""Test configuration: run the JAX parts on a virtual 8-device CPU mesh.

Real TPU hardware in this environment exposes a single chip; multi-chip
sharding logic is validated against XLA's host-platform device emulation,
exactly as the driver's dryrun does.  Must run before jax is imported.

Override with ZKLAIM_TEST_PLATFORM=tpu to run the suite on the real chip
(used for the heavy E2E parity module, which is TPU-scale work; see
tests/test_e2e_parity.py).
"""

import os

_PLATFORM = os.environ.get("ZKLAIM_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if _PLATFORM == "cpu":
    # The axon TPU plugin registers itself at interpreter startup
    # (sitecustomize) and overrides JAX_PLATFORMS from the environment;
    # the config API wins.
    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU LoadedExecutable.serialize segfaults on some large MSM /
    # prove executables; never write the persistent cache on CPU.
    jax.config.update("jax_enable_compilation_cache", False)

# Wide-limb field kernels are compile-time heavy (a point-add graph is ~8k
# StableHLO lines); persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zklaim")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(20260817)
