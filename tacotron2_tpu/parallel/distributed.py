"""Multi-host (multi-process) data parallelism plumbing.

A JAX TPU pod slice runs one Python process per host; each process sees
only its local chips.  Scaling the reference workload beyond one host
needs three things the single-device reference never had
(reference: train.py:302-308 picks one device and stops there):

  1. runtime initialization — ``jax.distributed.initialize()`` so all
     processes form one system (``initialize_distributed``),
  2. per-process input sharding — each host loads only its slice of every
     global batch, with GLOBALLY agreed padded shapes so every process
     compiles the identical program (``BatchLoader(process_index=...)``
     + :func:`global_batch_lengths`),
  3. global-array assembly — host-local numpy shards become one global
     jax.Array via ``jax.make_array_from_process_local_data``
     (:func:`global_batch_from_local`).

All three degrade to no-ops in a single-process environment, so the same
training loop serves one chip, one host with 8 chips, and a multi-host
slice.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_env_configured() -> bool:
    """True when multi-process coordination env vars are present."""
    return bool(os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("TACOTRON2_DISTRIBUTED"))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Join the multi-process JAX runtime if configured; returns whether
    distributed mode is active.

    With no arguments and no coordination env vars this is a no-op (the
    common single-host case — calling jax.distributed.initialize()
    unconditionally would hang or fail there).  Multi-host runs opt in:
    on Cloud TPU pods set TACOTRON2_DISTRIBUTED=1 and the no-arg
    ``jax.distributed.initialize()`` discovers everything from the
    metadata server; other deployments pass the coordinator explicitly or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

    MUST run before anything initializes the XLA backend (jax.devices(),
    any computation) — train() calls it first thing.
    """
    if coordinator_address is None and not distributed_env_configured():
        return jax.process_count() > 1
    # Explicit env coordination (generic clusters / tests); with only
    # TACOTRON2_DISTRIBUTED set, the no-arg call auto-detects (TPU pods).
    if coordinator_address is None:
        coordinator_address = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                               or os.environ.get("COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    print(f"[distributed] initialized: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    return True


def global_batch_from_local(mesh: Mesh, local_batch: Dict[str, Any],
                            spec: Optional[P] = None) -> Dict[str, Any]:
    """Assemble per-process numpy shards into global batch-sharded arrays.

    Each process passes ONLY its own rows (its slice of the global batch);
    the result is a dict of global ``jax.Array``s whose leading axis is
    the concatenation over processes, sharded over the mesh's ``data``
    axis.  Single-process, this is equivalent to ``shard_batch`` (the
    local batch IS the global batch).  All processes must pass arrays of
    identical shape — the loader guarantees that via globally agreed
    padded dims (:func:`tacotron2_tpu.data.dataset.BatchLoader`).
    """
    sharding = NamedSharding(mesh, P("data") if spec is None else spec)
    return {k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
            for k, v in local_batch.items()}
