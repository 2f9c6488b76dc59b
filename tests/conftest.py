"""Test environment: force JAX onto a virtual 8-device CPU platform.

Must run before any `jax` import so XLA picks up the flags; this lets
multi-chip sharding tests run without TPU hardware (mesh over 8 fake CPU
devices), and keeps unit-test compiles fast.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("TACOTRON2_TEST_PLATFORM", "cpu")
os.environ.setdefault("OMP_NUM_THREADS", "4")  # keep torch/XLA from fighting
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon sitecustomize forces jax_platforms=axon at import
# time, overriding the env var — force it back after import.
jax.config.update("jax_platforms",
                  os.environ.get("TACOTRON2_TEST_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_tacotron2"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
