"""Test config: run on a virtual 8-device CPU mesh with float64 available.

Must set the env vars before jax initializes its backends.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel),
# where float64 is emulated; tests want real f64 and an 8-device host mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox pre-imports jax (PYTHONPATH site hook), so the env var alone can
# be too late; the config route always works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the pipeline/sharding programs take minutes to
# build; unchanged programs hit the cache on re-runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Drop compiled executables after each test module.

    Every live XLA executable holds JIT code mappings; across the full suite
    (thousands of distinct f64 CPU programs) the process otherwise crosses
    vm.max_map_count (65530) and the NEXT compilation-cache read segfaults
    inside deserialize_executable when mmap fails — deterministically at
    ~85 tests in, while every file passes in isolation. Clearing between
    modules bounds the live-mapping count; the persistent disk cache (above)
    keeps the recompiles cheap.
    """
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
