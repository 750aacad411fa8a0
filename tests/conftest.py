import os
import sys

# Force CPU with 8 virtual devices BEFORE jax import: kernels are validated
# on a virtual mesh; real-TPU runs happen via bench.py / the driver.
# Force the virtual CPU mesh.  NOTE: the axon sitecustomize imports jax and
# pins the platform at interpreter start, so env vars (JAX_PLATFORMS) are
# ignored — only jax.config.update('jax_platforms', ...) wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: the DFS while-loop body is expensive to
# compile; cache it across test processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
