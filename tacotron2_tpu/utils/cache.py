"""Persistent XLA compilation cache.

Full-model training-step compiles take minutes through this environment's
remote compiler; the persistent cache makes every shape a one-time cost
across processes.  Called by the CLIs, bench, and the driver entry points.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp_tacotron2")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Enable the JAX persistent compilation cache (idempotent).

    Also re-asserts the ``JAX_PLATFORMS`` env var as the active platform:
    this image's sitecustomize forces ``jax_platforms`` to the hardware
    plugin at import time, overriding the env var — so a CLI launched with
    ``JAX_PLATFORMS=cpu`` (tests, conversion tools, machines where the
    chip is held by another tenant) would otherwise block retrying the
    device tunnel instead of running on CPU as asked.
    """
    import jax
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass  # backend already initialized: keep whatever is active
    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or os.environ.get(
                              "TACOTRON2_COMPILE_CACHE", _DEFAULT_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only
