"""Jitted train / eval steps.

One XLA program per (shape-bucket, use_postnet) combination covers the
whole reference hot path — forward (encoder, decoder scan, postnet), loss,
backward, clip, Adam — with no host round-trips.  The reference executes
this as per-frame Python (reference: train.py:496-549, src/model.py:291-296).

Gradient accumulation (reference: train.py:516-524) is an inner
``lax.scan`` over micro-batches: gradients are averaged on device, the
optimizer applies once.  The criterion's step counter advances once per
micro-batch, like the reference's per-forward counter (train.py:216).

Under a data-parallel mesh these functions are simply jitted with sharded
inputs — GSPMD inserts the gradient ``psum`` and makes BatchNorm batch
statistics global automatically.

The incoming TrainState is donated to the step (its buffers are reused for
the updated state — params + Adam moments are ~340 MB that would otherwise
be copied every step); callers must rebind, which every call site does
(``state = train_step(state, ...)``).  CPU tests ignore donation with a
warning.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import tacotron2_forward
from .loss import LossOutput, tacotron2_loss
from .state import TrainState


def compute_dtype_of(precision: str):
    """Map a TrainConfig.precision string to a compute dtype (None = fp32)."""
    if precision in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if precision in ("float32", "fp32"):
        return None
    raise ValueError(f"unknown precision {precision!r} "
                     "(expected 'bfloat16' or 'float32')")


def cast_params_for_compute(params, compute_dtype):
    """Differentiable downcast of fp32 weights to the compute dtype.

    Used inside the jitted step: the TrainState keeps fp32 master weights,
    the forward pass consumes a bf16 view.  Because the cast is part of the
    differentiated function, gradient cotangents are upcast back to fp32
    automatically — gradients, clipping, and Adam moments all stay fp32
    (the AMP master-weight recipe, minus loss scaling which bf16 does not
    need).  Non-fp32 leaves (int counters, bool flags) pass through.
    """
    if compute_dtype is None:
        return params
    def cast(x):
        if x.dtype == jnp.float32:
            return x.astype(compute_dtype)
        return x
    return jax.tree_util.tree_map(cast, params)


def _forward_loss(params, model_state, cfg: Config, batch, rng, loss_step,
                  use_postnet: bool, sigma_warmup_steps: int):
    params = cast_params_for_compute(
        params, compute_dtype_of(cfg.train.precision))
    out, new_model_state = tacotron2_forward(
        params, model_state, cfg.model, batch["text"], batch["mel"],
        batch["text_lengths"], rng, train=True, use_postnet=use_postnet,
        speaker_ids=batch.get("speaker_ids"))
    losses = tacotron2_loss(
        out.mel_postnet, out.mel_coarse, out.gate_logits, out.alignments,
        batch["mel"], batch["mel_lengths"], batch["text_lengths"],
        loss_step, cfg.guided_attention,
        sigma_warmup_steps=sigma_warmup_steps)
    return losses.total, (losses, new_model_state, out.alignments)


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "use_postnet",
                                             "sigma_warmup_steps"),
                   donate_argnums=(0,))
def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], *,
               cfg: Config, tx: optax.GradientTransformation,
               use_postnet: bool, sigma_warmup_steps: int
               ) -> Tuple[TrainState, LossOutput, jnp.ndarray]:
    """One optimizer step on one batch.

    Returns (new_state, losses, alignments (B, T_dec, T_enc)).
    """
    step_rng = jax.random.fold_in(state.rng, state.step)
    grad_fn = jax.grad(_forward_loss, has_aux=True)
    grads, (losses, new_model_state, alignments) = grad_fn(
        state.params, state.model_state, cfg, batch, step_rng,
        state.loss_step, use_postnet, sigma_warmup_steps)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=new_params, model_state=new_model_state,
        opt_state=new_opt_state, step=state.step + 1,
        loss_step=state.loss_step + 1, rng=state.rng)
    return new_state, losses, alignments


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "use_postnet",
                                             "sigma_warmup_steps",
                                             "accum_steps"),
                   donate_argnums=(0,))
def train_step_accum(state: TrainState, batch: Dict[str, jnp.ndarray], *,
                     cfg: Config, tx: optax.GradientTransformation,
                     use_postnet: bool, sigma_warmup_steps: int,
                     accum_steps: int
                     ) -> Tuple[TrainState, LossOutput, jnp.ndarray]:
    """Gradient-accumulated step: batch arrays carry a leading
    ``(accum_steps, micro_batch, ...)`` axis."""
    grad_fn = jax.grad(_forward_loss, has_aux=True)

    def micro(carry, xs):
        grads_acc, model_state, loss_step, i = carry
        micro_batch = xs
        rng = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), i)
        grads, (losses, model_state, alignments) = grad_fn(
            state.params, model_state, cfg, micro_batch, rng, loss_step,
            use_postnet, sigma_warmup_steps)
        grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        return (grads_acc, model_state, loss_step + 1, i + 1), \
            (losses, alignments)

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    (grads, new_model_state, new_loss_step, _), (losses, alignments) = \
        jax.lax.scan(micro, (zero_grads, state.model_state, state.loss_step,
                             jnp.int32(0)), batch)
    grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=new_params, model_state=new_model_state,
        opt_state=new_opt_state, step=state.step + 1,
        loss_step=new_loss_step, rng=state.rng)
    last = jax.tree_util.tree_map(lambda x: x[-1], losses)
    return new_state, last, alignments[-1]


@functools.partial(jax.jit, static_argnames=("cfg", "sigma_warmup_steps"))
def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], *,
              cfg: Config, sigma_warmup_steps: int
              ) -> Tuple[LossOutput, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced validation pass (eval mode: running BN stats, no
    dropout; reference: train.py:252-277).  Returns (losses, alignments,
    mean attention entropy).  The entropy is computed IN-graph so that
    under multi-host GSPMD it is the global-batch mean (host-side numpy
    would only see the local shard), consistent with the loss means.
    Deliberately UNMASKED over all decoder rows — the reference's
    validation diagnostic averages every row (train.py:243-250,274) —
    and therefore distinct from losses.attention_entropy, which is
    gate-window masked because it drives the adaptive KL weight."""
    dummy_rng = jnp.zeros((2,), jnp.uint32)
    out, _ = tacotron2_forward(
        state.params, state.model_state, cfg.model, batch["text"],
        batch["mel"], batch["text_lengths"], dummy_rng, train=False,
        use_postnet=True, speaker_ids=batch.get("speaker_ids"))
    losses = tacotron2_loss(
        out.mel_postnet, out.mel_coarse, out.gate_logits, out.alignments,
        batch["mel"], batch["mel_lengths"], batch["text_lengths"],
        state.loss_step, cfg.guided_attention,
        sigma_warmup_steps=sigma_warmup_steps)
    a = jnp.clip(out.alignments.astype(jnp.float32), 1e-8, None)
    entropy = -jnp.mean(jnp.sum(a * jnp.log(a), axis=-1))
    return losses, out.alignments, entropy
