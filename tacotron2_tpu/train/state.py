"""Train state pytree.

All mutable training quantities — params, BatchNorm running stats,
optimizer state, counters, RNG — in one pytree, so a training step is a
pure function ``(state, batch) -> (state, metrics)`` that jit/pjit can
compile and shard.  This replaces the scattered mutable objects of the
reference loop (model, optimizer, criterion.global_step, scaler;
reference: train.py:287-395).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import tacotron2_init
from .optim import make_optimizer


class TrainState(NamedTuple):
    params: Dict[str, Any]
    model_state: Dict[str, Any]    # BatchNorm running stats
    opt_state: Any
    step: jnp.ndarray              # optimizer steps taken (int32)
    loss_step: jnp.ndarray         # criterion evaluations (int32;
    #                                reference: train.py:140,216)
    rng: jnp.ndarray               # PRNG key for dropout


def create_train_state(cfg: Config, seed: int | None = None,
                       debug: bool = False, tx=None) -> TrainState:
    """Fresh TrainState.  Pass the optimizer ``tx`` that will drive
    training so its state is initialized once from the same object; when
    omitted (template construction, tests) an equivalent one is built."""
    seed = cfg.train.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    k_init, k_drop = jax.random.split(key)
    params, model_state = tacotron2_init(k_init, cfg.model)
    if tx is None:
        tx = make_optimizer(cfg.train, debug=debug)
    opt_state = tx.init(params)
    return TrainState(params=params, model_state=model_state,
                      opt_state=opt_state,
                      step=jnp.int32(0), loss_step=jnp.int32(0),
                      rng=k_drop)
