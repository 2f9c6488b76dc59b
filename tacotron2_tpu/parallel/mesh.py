"""Device mesh + sharding layout for SPMD training.

The reference is strictly single-device (device picked once,
reference: train.py:302-308; no torch.distributed anywhere).  Here
parallelism is declarative, the JAX way: build a ``Mesh`` over the
available chips, annotate array shardings, and let GSPMD insert the
collectives (gradient ``psum`` over the ``data`` axis rides the ICI;
BatchNorm batch statistics become globally correct automatically because
the batch-axis mean is a semantically global reduction).

Axes:
  * ``data``  — batch-dimension data parallelism (the workload's natural
    scaling axis at 28 M params),
  * ``model`` — optional tensor parallelism for the 1024-wide decoder
    LSTMs / projection (off by default: with ~28 M params the weights fit
    in a fraction of one chip's HBM, so TP only adds per-step collectives).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over ``devices`` (default: all)."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} exceeds "
                         f"{len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    """Batch arrays shard their leading (batch) dim over ``data``."""
    return P("data")


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host batch dict with the batch axis sharded over ``data``."""
    sharding = NamedSharding(mesh, batch_spec())
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def _tp_spec_for_path(path) -> P:
    """Tensor-parallel PartitionSpec for a parameter path, or replicate.

    Shards the decoder's wide matmuls over ``model``: LSTM input/hidden
    kernels and biases split on the 4H gate axis, the projection/gate heads
    split on their input (contracting) axis.  Everything else replicates.
    """
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if "attn_lstm" in keys or "dec_lstm" in keys:
        leaf = keys[-1]
        if leaf in ("wi", "wh"):
            return P(None, "model")
        if leaf in ("bi", "bh"):
            return P("model")
    if "proj" in keys or "gate" in keys:
        leaf = keys[-1]
        if leaf == "w" and "decoder" in keys:
            return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False):
    """NamedSharding pytree for params: replicated, or TP over ``model``."""
    if not tensor_parallel:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _tp_spec_for_path(path)), params)


def shard_params(mesh: Mesh, params, tensor_parallel: bool = False):
    shardings = param_shardings(mesh, params, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_train_state(mesh: Mesh, state, tensor_parallel: bool = False):
    """Place a TrainState on the mesh.

    Params are replicated (or TP-sharded over ``model``); Adam moments are
    param-shaped subtrees inside the optax state, so for the TP case they
    are re-placed against the param shardings by matching array shape;
    everything else (counters, rng, schedule counts) replicates.
    """
    rep = replicated(mesh)
    params = shard_params(mesh, state.params, tensor_parallel)

    if tensor_parallel:
        p_shardings = param_shardings(mesh, state.params, tensor_parallel)
        shard_by_shape = {}
        for leaf, sh in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(p_shardings)):
            shard_by_shape.setdefault(
                (tuple(leaf.shape), str(leaf.dtype)), sh)

        def place(x):
            sh = shard_by_shape.get((tuple(x.shape), str(x.dtype)), rep)
            return jax.device_put(x, sh)
    else:
        def place(x):
            return jax.device_put(x, rep)

    return state._replace(
        params=params,
        model_state=jax.tree_util.tree_map(place, state.model_state),
        opt_state=jax.tree_util.tree_map(place, state.opt_state),
        step=jax.device_put(state.step, rep),
        loss_step=jax.device_put(state.loss_step, rep),
        rng=jax.device_put(state.rng, rep))
