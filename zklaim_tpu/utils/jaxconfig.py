"""Shared JAX runtime configuration.

Call setup_cache() early in any entry point (CLI, bench, tests): the
wide-limb field kernels are compile-time heavy, so persisting compiled
executables across processes is a large win on both CPU and TPU.
"""

from __future__ import annotations

import jax

CACHE_DIR = "/root/.cache/jax_zklaim"


def setup_cache(cache_dir: str = CACHE_DIR) -> None:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """Route to host CPU even when a TPU plugin hijacks the platform list."""
    jax.config.update("jax_platforms", "cpu")
