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
                  os.environ.get("TACOTRON2_COMPILE_CACHE",
                                 os.path.expanduser("~/.cache/jax_comp_tacotron2")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


# --- mmap-count pressure management -----------------------------------
# One pytest process compiles hundreds of XLA executables; each holds
# dozens-to-thousands of small mappings, and the suite reaches ~63k maps
# by its last file — past Linux's default vm.max_map_count of 65530 the
# kernel fails mmap() and XLA segfaults inside executable
# (de)serialization (observed deterministically at the same test).
# Raise the limit when permitted; otherwise shed executables once the
# process nears the ceiling.

def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _map_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


try:  # root (containers/CI images): lift the ceiling outright
    if _map_limit() < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("262144")
except OSError:
    pass

_MAP_SOFT_LIMIT = int(_map_limit() * 0.8)
_maplog = os.environ.get("TACOTRON2_MAPLOG")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    yield
    n = _map_count()
    if _maplog:
        with open(_maplog, "a") as f:
            f.write(f"{n}\t{item.nodeid}\n")
    if n > _MAP_SOFT_LIMIT:
        import gc
        jax.clear_caches()
        gc.collect()
