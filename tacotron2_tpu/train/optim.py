"""Optimizer: Adam with an attention learning-rate group and milestone decay.

Replicates the reference's optimizer semantics (reference: train.py:343-366,
279-284, src/config.py:61-66) with optax:

  * Adam (torch defaults: betas 0.9/0.999, eps 1e-8),
  * attention parameters (everything under ``params['decoder']['attention']``)
    train at ``lr x attention_lr_multiplier`` (1.5, or 2.0 in debug mode),
  * step-milestone decay: lr *= 0.8 after steps {50k, 100k, 150k} (the
    reference applies the decay after the optimizer step at the milestone,
    so the milestone step itself still uses the old LR),
  * global-norm gradient clipping at 1.0 applied before Adam
    (reference: train.py:521).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import optax

from ..config import TrainConfig


def milestone_schedule(base_lr: float, milestones: Sequence[int],
                       gamma: float):
    """lr(step) = base * gamma^|{m in milestones : m < step}|."""
    boundaries = {int(m) + 1: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _label_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label each leaf 'attention' (under params['decoder']['attention'])
    or 'base' for the two-LR Adam groups."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "attention" if any(
            getattr(p, "key", None) == "attention" for p in path)
        else "base", params)


def make_optimizer(cfg: TrainConfig,
                   debug: bool = False) -> optax.GradientTransformation:
    """Build the optimizer.  Labels are computed from the param pytree at
    init time (callable param_labels), so no params are needed here and
    the same transformation serves any param structure."""
    base_lr = cfg.learning_rate
    mult = (cfg.debug_attention_lr_multiplier if debug
            else cfg.attention_lr_multiplier)
    base_sched = milestone_schedule(base_lr, cfg.lr_decay_milestones,
                                    cfg.lr_decay_gamma)
    attn_sched = milestone_schedule(base_lr * mult, cfg.lr_decay_milestones,
                                    cfg.lr_decay_gamma)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {"base": optax.adam(base_sched, b1=0.9, b2=0.999, eps=1e-8),
             "attention": optax.adam(attn_sched, b1=0.9, b2=0.999,
                                     eps=1e-8)},
            param_labels=_label_params,
        ),
    )
    return tx
