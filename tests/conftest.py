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


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running full-system test")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Release compiled-executable and tracing caches after each module.

    The XLA CPU client accumulates live executables across the ~36 test
    modules; around ~100 jitted programs in one process it aborts
    (`Fatal Python error: Aborted`). Dropping the in-memory caches at
    module boundaries keeps the client bounded; the on-disk persistent
    compilation cache (above) makes the re-tracing cheap."""
    yield
    jax.clear_caches()


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
