"""Persistent XLA compilation cache.

Full-model training-step compiles take minutes through this environment's
remote compiler; the persistent cache makes every shape a one-time cost
across processes.  Called by the CLIs, bench, and the driver entry points.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp_tacotron2")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Enable the JAX persistent compilation cache (idempotent)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or os.environ.get(
                              "TACOTRON2_COMPILE_CACHE", _DEFAULT_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only
