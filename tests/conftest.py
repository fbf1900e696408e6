"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver environment pre-imports jax via sitecustomize (PYTHONPATH
/root/.axon_site) and exports JAX_PLATFORMS=axon (the real TPU tunnel), so
plain env vars are read too late — we must force the platform through
jax.config.update BEFORE any backend initialization. Tests never touch the
real chip; only bench.py does.
"""

import os

# XLA_FLAGS is read at CPU-client init (lazy), so setting it here still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
# Only 2 host CPUs here and XLA compiles are slow: persist them across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_sgslam"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _tame_cv2():
    """cv2's thread pool starves XLA's on this 2-core host; pin it to 1."""
    try:
        import cv2

        cv2.setNumThreads(1)
    except ImportError:
        pass
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
