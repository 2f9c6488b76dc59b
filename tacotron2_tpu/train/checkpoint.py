"""Checkpointing with Orbax: the reference's three cadences, TPU-native.

The reference saves torch dicts per epoch, per 5000 steps, and on best
validation mel (reference: train.py:537-582), and resume restores model +
optimizer + counters (train.py:369-380).  Here the whole TrainState pytree
(params, BN stats, optimizer state, counters, RNG) plus host counters
(epoch, best_val_mel) goes through Orbax — async-friendly, sharded-array
aware, and restorable onto any mesh.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_saveable(state: TrainState, epoch: int,
                 best_val_mel: float) -> Dict[str, Any]:
    return {
        "params": state.params,
        "model_state": state.model_state,
        "opt_state": state.opt_state,
        "step": state.step,
        "loss_step": state.loss_step,
        "rng": state.rng,
        "epoch": np.asarray(epoch, np.int32),
        "best_val_mel": np.asarray(best_val_mel, np.float32),
    }


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    best_val_mel: float) -> None:
    """Save a full training checkpoint at ``path`` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_saveable(state, epoch, best_val_mel), force=True)


def restore_checkpoint(path: str, template: TrainState
                       ) -> Tuple[TrainState, int, float]:
    """Restore (state, epoch, best_val_mel); ``template`` supplies the
    pytree structure (a freshly created TrainState)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        target = _to_saveable(template, 0, float("inf"))
        restored = ckptr.restore(path, target)
    state = TrainState(
        params=restored["params"], model_state=restored["model_state"],
        opt_state=restored["opt_state"], step=restored["step"],
        loss_step=restored["loss_step"], rng=restored["rng"])
    return state, int(restored["epoch"]), float(restored["best_val_mel"])


def save_params_only(path: str, params, model_state) -> None:
    """Inference-grade checkpoint: just weights + BN stats
    (the reference's debug export saves a bare state_dict, train.py:465)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "model_state": model_state},
                   force=True)


def restore_params_only(path: str, params_template, state_template):
    """Restore a params-only checkpoint, casting each leaf to the
    template's dtype — so compact bf16 exports (tools/export_checkpoint.py
    halves the artifact for committing trained-model evidence) load
    straight into the fp32 inference templates."""
    path = os.path.abspath(path)
    import jax
    with ocp.StandardCheckpointer() as ckptr:
        # Restore to HOST numpy arrays at the saved shapes/dtypes (from the
        # checkpoint's own metadata).  A bare restore(path) would replay the
        # sharding metadata recorded at save time, which names the *saving*
        # backend's devices — a checkpoint written on CPU would then refuse
        # to load on TPU ("Device TFRT_CPU_0 was not found").  Numpy targets
        # are backend-independent; the caller casts/places afterwards.
        saved = ckptr.metadata(path).item_metadata
        target = jax.tree_util.tree_map(
            lambda m: np.zeros(m.shape, m.dtype), saved)
        restored = ckptr.restore(path, target)  # as saved (any dtype)
    cast = lambda a, t: np.asarray(a).astype(np.asarray(t).dtype)
    params = jax.tree_util.tree_map(
        cast, restored["params"], params_template)
    model_state = jax.tree_util.tree_map(
        cast, restored["model_state"], state_template)
    return params, model_state


def checkpoint_kind(path: str) -> str:
    """Classify a saved checkpoint by inspecting its Orbax tree metadata.

    Returns "full" (training state with optimizer/counters), "params_only"
    (weights + BN stats, e.g. the debug export), or "unknown" (metadata
    unreadable — not an Orbax checkpoint, or a future layout).  This
    replaces guessing by try/except, so a *corrupted* full checkpoint
    surfaces its real restore error instead of a confusing params-template
    mismatch.
    """
    meta_path = os.path.join(os.path.abspath(path), "_METADATA")
    try:
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
        keys = meta.get("tree_metadata", {}).keys()
        # tree_metadata keys are stringified key-paths like
        # "('params', 'encoder', ...)"; the first quoted element is the
        # top-level field.
        tops = {k.split("'")[1] for k in keys if "'" in k}
    except Exception:
        return "unknown"
    if "opt_state" in tops or "epoch" in tops:
        return "full"
    if "params" in tops:
        return "params_only"
    return "unknown"


def load_any_checkpoint(path: str, template: TrainState):
    """Load either a full training checkpoint or a params-only checkpoint.

    Returns (params, model_state, full_state_or_None, epoch, best_val_mel).
    ``full_state_or_None`` is None for params-only checkpoints — resuming
    from one restarts the optimizer state, epoch counter, and best-val
    tracking (callers should warn; train._resume does).
    """
    kind = checkpoint_kind(path)
    if kind == "full":
        state, epoch, best = restore_checkpoint(path, template)
        return state.params, state.model_state, state, epoch, best
    if kind == "params_only":
        params, model_state = restore_params_only(
            path, template.params, template.model_state)
        return params, model_state, None, 0, float("inf")
    # Unknown layout: preserve the historical try-order as a last resort,
    # chaining both errors so neither failure mode is hidden.
    try:
        state, epoch, best = restore_checkpoint(path, template)
        return state.params, state.model_state, state, epoch, best
    except Exception as full_err:
        try:
            params, model_state = restore_params_only(
                path, template.params, template.model_state)
            return params, model_state, None, 0, float("inf")
        except Exception as params_err:
            raise RuntimeError(
                f"could not load checkpoint {path!r} as a full training "
                f"state ({type(full_err).__name__}: {full_err}) or as "
                f"params-only ({type(params_err).__name__}: {params_err})"
            ) from params_err
