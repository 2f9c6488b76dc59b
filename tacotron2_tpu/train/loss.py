"""Tacotron 2 training loss, fully vectorized for XLA.

Re-design of the reference criterion (reference: train.py:126-217) with the
same observable math but no Python loops and no module-held mutable state:

  * masked mean L1 on coarse + postnet mels (train.py:185-192),
  * BCE-with-logits gate loss averaged over the batch's max mel length
    (train.py:131,193 — the reference includes beyond-length-but-within-
    batch-max positions, which hold target 1),
  * guided-attention KL against a per-sample diagonal Gaussian target with
    sigma annealed from max(3, 0.05 * text_len) (cap 20) to 1.0 over
    ``sigma_warmup_steps`` (train.py:149-172) — the reference's nested
    B x T_dec Python loop becomes one closed-form broadcast,
  * KL clamped at 150 and divided by T_dec (train.py:203-204),
  * entropy-adaptive KL weight decayed from 1.0 toward 0.2 once attention
    entropy <= 3.5 (train.py:134-137,205-210) — computed in-graph from the
    current entropy (the reference updates a member variable and uses it in
    the same step, which is the same dataflow),
  * the criterion's internal step counter (train.py:140,216) becomes an
    explicit ``loss_step`` carried in the train state; like the reference
    it advances once per criterion evaluation (so under gradient
    accumulation it advances per micro-batch).

Because this framework pads decoder time to quantized static shapes, all
reductions are masked to the batch's true max mel length, reproducing the
reference's dynamic-shape math exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import GuidedAttentionConfig


class LossOutput(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    gate: jnp.ndarray
    attention_kl: jnp.ndarray
    attention_weight: jnp.ndarray
    attention_entropy: jnp.ndarray
    sigma: jnp.ndarray


def build_gate_target(mel_lengths: jnp.ndarray, t_dec: int) -> jnp.ndarray:
    """(B,) lengths -> (B, T) gate targets: 1 at and after the last real
    frame (reference: train.py:506-508)."""
    t = jnp.arange(t_dec)[None, :]
    return (t >= (mel_lengths[:, None] - 1)).astype(jnp.float32)


def diagonal_attention_target(text_lengths: jnp.ndarray, t_dec_max: int,
                              t_enc_max: int, eff_steps: jnp.ndarray,
                              loss_step: jnp.ndarray,
                              g: GuidedAttentionConfig,
                              sigma_warmup_steps: int):
    """Closed-form diagonal Gaussian targets (B, T_dec, T_enc) + mean sigma.

    Matches reference semantics (train.py:149-172): per-sample initial
    sigma = clamp(0.05 * L, 3, 20) annealed linearly to 1.0; expected
    position floor(t * L / T) clipped to L - 1; normalized over the true
    encoder length.  ``eff_steps`` is the batch's true max decoder length
    (the reference's ``num_steps``); rows t >= eff_steps are zeroed.
    """
    lb = text_lengths.astype(jnp.float32)[:, None, None]         # (B,1,1)
    init_sigma = jnp.clip(lb * g.initial_sigma_factor, 3.0, g.max_sigma_cap)
    progress = jnp.minimum(1.0, loss_step.astype(jnp.float32)
                           / float(sigma_warmup_steps))
    sigma = init_sigma - (init_sigma - g.min_sigma) * progress   # (B,1,1)

    t = jnp.arange(t_dec_max, dtype=jnp.float32)[None, :, None]  # (1,T,1)
    pos = jnp.arange(t_enc_max, dtype=jnp.float32)[None, None, :]
    expected = jnp.minimum(jnp.floor(t * lb / eff_steps.astype(jnp.float32)),
                           lb - 1.0)
    gauss = jnp.exp(-0.5 * ((pos - expected) / sigma) ** 2)
    valid_pos = pos < lb                                          # (B,1,T_enc)
    gauss = jnp.where(valid_pos, gauss, 0.0)
    gauss = gauss / (jnp.sum(gauss, axis=2, keepdims=True) + 1e-8)
    valid_row = t < eff_steps.astype(jnp.float32)                 # (1,T,1)
    target = jnp.where(valid_row, gauss, 0.0)
    return target, jnp.mean(sigma)


def tacotron2_loss(mel_postnet: jnp.ndarray, mel_coarse: jnp.ndarray,
                   gate_logits: jnp.ndarray, alignments: jnp.ndarray,
                   mel_target: jnp.ndarray, mel_lengths: jnp.ndarray,
                   text_lengths: Optional[jnp.ndarray],
                   loss_step: jnp.ndarray, g: GuidedAttentionConfig,
                   sigma_warmup_steps: Optional[int] = None) -> LossOutput:
    """Full loss.  mel_target is (B, n_mels, T) (reference layout);
    predictions are (B, T, n_mels)."""
    sigma_warmup_steps = (g.sigma_warmup_steps
                          if sigma_warmup_steps is None
                          else sigma_warmup_steps)
    b, t_dec, n_mels = mel_coarse.shape
    tgt = jnp.swapaxes(mel_target, 1, 2)                  # (B, T, n_mels)

    # --- masked mean L1 (x2) -------------------------------------------
    frame_valid = (jnp.arange(t_dec)[None, :]
                   < mel_lengths[:, None])                # (B, T)
    fv = frame_valid[..., None].astype(jnp.float32)
    n_valid = jnp.sum(fv) * n_mels
    l1_coarse = jnp.sum(jnp.abs(mel_coarse - tgt) * fv) / n_valid
    l1_post = jnp.sum(jnp.abs(mel_postnet - tgt) * fv) / n_valid
    loss_mel = l1_coarse + l1_post

    # --- gate BCE over the batch-max mel window ------------------------
    max_mel = jnp.max(mel_lengths)
    gate_window = jnp.broadcast_to(
        jnp.arange(t_dec)[None, :] < max_mel, (b, t_dec))  # (B, T)
    gate_target = build_gate_target(mel_lengths, t_dec)
    per_elem = sigmoid_binary_cross_entropy(gate_logits, gate_target)
    loss_gate = (jnp.sum(per_elem * gate_window)
                 / (jnp.sum(gate_window) + 1e-8))

    # --- guided-attention KL -------------------------------------------
    if text_lengths is not None and t_dec > 1:
        t_enc = alignments.shape[2]
        target, sigma = diagonal_attention_target(
            text_lengths, t_dec, t_enc, max_mel, loss_step, g,
            sigma_warmup_steps)
        attn_safe = jnp.clip(alignments, 1e-8, None)
        log_pred = jnp.log(attn_safe)
        # F.kl_div(log_pred, target, 'batchmean') = sum(target*(log t - log p))/B
        tlogt = jnp.where(target > 0, target * jnp.log(
            jnp.clip(target, 1e-30, None)), 0.0)
        kl = jnp.sum(tlogt - target * log_pred) / b
        kl = jnp.clip(kl / max_mel.astype(jnp.float32), None, g.kl_clamp)
        # entropy over valid decoder rows
        row_valid = gate_window.astype(jnp.float32)
        ent_rows = -jnp.sum(attn_safe * log_pred, axis=2)     # (B, T)
        entropy = jnp.sum(ent_rows * row_valid) / jnp.sum(row_valid)
        weight = jnp.where(
            entropy <= g.entropy_target,
            jnp.maximum(g.min_weight,
                        g.weight_start * jnp.maximum(entropy, 0.0)
                        / g.entropy_target),
            g.weight_start)
    else:
        kl = jnp.float32(0.0)
        entropy = jnp.float32(0.0)
        sigma = jnp.float32(0.0)
        weight = jnp.float32(g.weight_start)

    total = loss_mel + loss_gate + weight * kl
    return LossOutput(total=total, mel=loss_mel, gate=loss_gate,
                      attention_kl=kl, attention_weight=weight,
                      attention_entropy=entropy, sigma=sigma)


def sigmoid_binary_cross_entropy(logits: jnp.ndarray,
                                 labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise BCE with logits
    (same math as torch BCEWithLogitsLoss)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
