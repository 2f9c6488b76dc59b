"""Tacotron 2 autoregressive decoder: prenet + attention + 2 LSTMs + heads.

Functional re-design of the reference decoder (reference: src/model.py:154-333):

  * PreNet: 2 x Linear(-> 256, no bias) + ReLU + dropout 0.5 gated on train
    mode (off at inference — the reference's deliberate deviation from the
    paper, src/model.py:167-171),
  * per-step order (src/model.py:246-275): prenet -> attention LSTM ->
    attention -> decoder LSTM -> projection/gate, with dropout 0.1 on both
    LSTM hidden states,
  * gate bias initialized to -3.0 (src/model.py:214-217),
  * teacher-forced forward as ONE ``lax.scan`` over decoder frames — the
    prenet over the (known) shifted targets is hoisted out of the scan and
    computed as a single batched matmul (B*T, 80)->(256): MXU-sized work
    instead of the reference's per-frame Python loop (src/model.py:291-296),
  * autoregressive inference as a ``lax.while_loop`` over a padded
    ``max_decoder_steps`` buffer with the gate-based early exit
    (src/model.py:299-333), including (flag-gated) the reference's
    dropped-first-frame diagnostic-step quirk (src/model.py:309-316).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .attention import (AttentionState, attention_init, attention_init_state,
                        attention_step, precompute_memory)
from .layers import dropout, linear_apply, linear_init, lstm_cell_apply, \
    lstm_cell_init


class DecoderCarry(NamedTuple):
    h_att: jnp.ndarray      # (B, 1024) attention-LSTM hidden
    c_att: jnp.ndarray
    h_dec: jnp.ndarray      # (B, 1024) decoder-LSTM hidden
    c_dec: jnp.ndarray
    context: jnp.ndarray    # (B, 512) attention context
    att: AttentionState     # (prev_attn, cum_attn)


def decoder_init(key, cfg: ModelConfig) -> Dict[str, Any]:
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    proj_in_dim = cfg.decoder_rnn_dim + cfg.encoder_embedding_dim  # 1536
    gate = linear_init(k6, proj_in_dim, 1, bias=True)
    gate["b"] = jnp.full_like(gate["b"], cfg.gate_bias_init)
    return {
        "prenet": [
            linear_init(k1, cfg.n_mels, cfg.prenet_dim, bias=False),
            linear_init(k2, cfg.prenet_dim, cfg.prenet_dim, bias=False),
        ],
        "attention": attention_init(k3, cfg),
        "attn_lstm": lstm_cell_init(
            k4, cfg.prenet_dim + cfg.encoder_embedding_dim,
            cfg.decoder_rnn_dim),
        "dec_lstm": lstm_cell_init(k5, proj_in_dim, cfg.decoder_rnn_dim),
        "proj": linear_init(k7, proj_in_dim, cfg.n_mels, bias=True),
        "gate": gate,
    }


def prenet_apply(params, x: jnp.ndarray, cfg: ModelConfig, rng,
                 train: bool) -> jnp.ndarray:
    """PreNet over (..., n_mels) -> (..., prenet_dim)."""
    for i, layer in enumerate(params["prenet"]):
        x = jax.nn.relu(linear_apply(layer, x))
        if train:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, cfg.p_prenet_dropout, train)
    return x


def init_carry(batch: int, t_enc: int, cfg: ModelConfig) -> DecoderCarry:
    """Zero decoder state (reference: src/model.py:219-234)."""
    z = lambda d: jnp.zeros((batch, d), jnp.float32)
    return DecoderCarry(
        h_att=z(cfg.decoder_rnn_dim), c_att=z(cfg.decoder_rnn_dim),
        h_dec=z(cfg.decoder_rnn_dim), c_dec=z(cfg.decoder_rnn_dim),
        context=z(cfg.encoder_embedding_dim),
        att=attention_init_state(batch, t_enc))


def decode_step(params: Dict[str, Any], cfg: ModelConfig,
                prenet_out: jnp.ndarray, carry: DecoderCarry,
                memory: jnp.ndarray, processed_memory: jnp.ndarray,
                mask: Optional[jnp.ndarray], rng, train: bool
                ) -> Tuple[DecoderCarry, Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]]:
    """One decoder step from an already-prenetted input frame.

    Returns (new_carry, (mel (B, n_mels), gate_logit (B,), attn (B, T_enc))).
    """
    if train:
        r_att, r_dec = jax.random.split(rng)
    attn_in = jnp.concatenate([prenet_out, carry.context], axis=-1)
    h_att, c_att = lstm_cell_apply(params["attn_lstm"], attn_in,
                                   carry.h_att, carry.c_att)
    if train:
        h_att = dropout(r_att, h_att, cfg.p_attention_dropout, train)
    context, attn_w, att_state = attention_step(
        params["attention"], h_att, memory, processed_memory, carry.att, mask)
    dec_in = jnp.concatenate([h_att, context], axis=-1)
    h_dec, c_dec = lstm_cell_apply(params["dec_lstm"], dec_in,
                                   carry.h_dec, carry.c_dec)
    if train:
        h_dec = dropout(r_dec, h_dec, cfg.p_decoder_dropout, train)
    proj_in = jnp.concatenate([h_dec, context], axis=-1)
    # Fused output heads: one (B, 1536) x (1536, n_mels+1) matmul instead of
    # two; the weight concat is loop-invariant, so XLA hoists it out of the
    # decode scan/while loop.
    w_heads = jnp.concatenate([params["proj"]["w"], params["gate"]["w"]],
                              axis=1)
    b_heads = jnp.concatenate([params["proj"]["b"], params["gate"]["b"]])
    out = jnp.dot(proj_in.astype(w_heads.dtype), w_heads,
                  preferred_element_type=jnp.float32) + b_heads.astype(
                      jnp.float32)
    mel, gate = out[..., :-1], out[..., -1]
    new_carry = DecoderCarry(h_att=h_att, c_att=c_att, h_dec=h_dec,
                             c_dec=c_dec, context=context, att=att_state)
    return new_carry, (mel, gate, attn_w)


def decoder_teacher_forced(params: Dict[str, Any], cfg: ModelConfig,
                           memory: jnp.ndarray, mel_targets: jnp.ndarray,
                           mask: Optional[jnp.ndarray], rng, train: bool
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced decode of a whole utterance batch in one scan.

    Args:
        memory: (B, T_enc, 512) encoder outputs.
        mel_targets: (B, n_mels, T_dec) ground-truth mels (reference layout).
        mask: (B, T_enc) bool, True = encoder padding.
    Returns:
        (mels (B, T_dec, n_mels), gate_logits (B, T_dec),
         alignments (B, T_dec, T_enc))
    """
    b, t_enc, _ = memory.shape
    t_dec = mel_targets.shape[2]

    # Go-frame shift (reference: src/model.py:282-286), (B, T_dec, n_mels)
    tgt = jnp.swapaxes(mel_targets, 1, 2)
    dec_inputs = jnp.concatenate(
        [jnp.zeros_like(tgt[:, :1, :]), tgt[:, :-1, :]], axis=1)

    # PreNet over all frames at once: one big MXU matmul, not T small ones.
    rng_pre, rng_steps = (jax.random.split(rng) if train
                          else (jnp.zeros((2,), jnp.uint32),) * 2)
    prenet_out = prenet_apply(params, dec_inputs, cfg, rng_pre, train)

    processed_memory = precompute_memory(params["attention"], memory)
    carry0 = init_carry(b, t_enc, cfg)

    step_keys = (jax.random.split(rng_steps, t_dec) if train
                 else jnp.zeros((t_dec, 2), jnp.uint32))

    if train:
        from ..ops.decoder_bptt import decoder_scan_bptt, split_bptt_enabled
        if split_bptt_enabled(cfg):
            # Same forward scan (decode_step, incl. the Pallas attention
            # tail), hand-written split-BPTT backward: no in-loop weight
            # -gradient accumulators, no stacked qsum residuals.  PreNet
            # and the memory projection get their gradients through the
            # prenet_out / processed_memory input cotangents.
            core = {k: params[k] for k in ("attention", "attn_lstm",
                                           "dec_lstm", "proj", "gate")}
            m = mask if mask is not None else jnp.zeros((b, t_enc), bool)
            mels, gates, aligns = decoder_scan_bptt(
                cfg, core, jnp.swapaxes(prenet_out, 0, 1), memory,
                processed_memory, m, step_keys)
            return (jnp.swapaxes(mels, 0, 1), jnp.swapaxes(gates, 0, 1),
                    jnp.swapaxes(aligns, 0, 1))

    def step(carry, xs):
        pre_t, key_t = xs
        return decode_step(params, cfg, pre_t, carry, memory,
                           processed_memory, mask, key_t, train)

    if cfg.remat_decoder_step and train:
        # Recompute step activations in the backward pass instead of
        # storing them (see ModelConfig.remat_decoder_step /
        # decoder_remat_policy).
        if cfg.decoder_remat_policy == "dots":
            step = jax.checkpoint(
                step, policy=jax.checkpoint_policies.dots_saveable)
        elif cfg.decoder_remat_policy == "full":
            step = jax.checkpoint(step)
        else:
            raise ValueError(
                f"unknown decoder_remat_policy "
                f"{cfg.decoder_remat_policy!r} (expected 'full' or 'dots')")

    xs = (jnp.swapaxes(prenet_out, 0, 1), step_keys)   # (T, B, 256), (T, 2)
    _, (mels, gates, aligns) = jax.lax.scan(
        step, carry0, xs, unroll=max(1, cfg.decoder_scan_unroll))
    return (jnp.swapaxes(mels, 0, 1), jnp.swapaxes(gates, 0, 1),
            jnp.swapaxes(aligns, 0, 1))


def decoder_infer(params: Dict[str, Any], cfg: ModelConfig,
                  memory: jnp.ndarray, max_steps: int,
                  gate_threshold: float,
                  drop_first_frame: bool = True,
                  mask: Optional[jnp.ndarray] = None,
                  stop_mode: str = "any",
                  forced_stop_at: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray, jnp.ndarray]:
    """Autoregressive inference under jit: ``lax.while_loop`` + padded buffers.

    ``stop_mode``:
      * ``"any"`` — reference semantics (src/model.py:318-333): stop the
        whole batch once more than one frame is out AND the max-over-batch
        gate sigmoid exceeds the threshold.  Exact for B=1; for B>1 it
        truncates longer items (the reference only ever decoded B=1).
      * ``"all"`` — batched serving semantics: track per-item completion
        and run until every item's gate has fired (or ``max_steps``).

    ``mask`` (B, T_enc) optionally masks padded encoder positions in
    attention — the reference never pads at inference (B=1 exact length),
    so batched/padded callers must pass it to keep parity with unpadded
    decoding.

    With ``drop_first_frame`` (the reference's diagnostic-step quirk,
    src/model.py:309-316) the first generated frame advances the state and
    feeds the next step but is not recorded.

    ``forced_stop_at`` (optional TRACED int32 scalar): treat the gate as
    fired once ``frames_out >= forced_stop_at``, in addition to the real
    gate.  Because it is data, one compiled executable measures the
    early-stop exit path (while_loop exit + static-buffer vocode tail) at
    any stop frame — the instrument bench.py uses to track the early-stop
    behavior class without needing a fully-converged checkpoint.

    Returns (mels (B, S, n_mels), gate_logits (B, S), aligns (B, S, T_enc),
    n_frames scalar int32, frame_ends (B,) int32), where S = max_steps;
    ``frame_ends[b]`` is the frame count at item b's own gate firing (or
    ``n_frames`` if it never fired).  Runs in eval mode (no dropout).
    """
    if stop_mode not in ("any", "all"):
        raise ValueError(f"stop_mode must be 'any' or 'all', got {stop_mode}")
    b, t_enc, _ = memory.shape

    from ..ops.decoder_megakernel import decoder_infer_mega, \
        megakernel_enabled
    if megakernel_enabled(cfg, b, t_enc,
                          params["attn_lstm"]["wi"].dtype.itemsize,
                          stop_mode=stop_mode):
        # Whole-decode Pallas megakernel: weights stay VMEM-resident
        # across the sequential time grid instead of re-streaming from
        # HBM every step (see ops/decoder_megakernel.py).
        return decoder_infer_mega(
            params, cfg, memory, max_steps, gate_threshold,
            drop_first_frame=drop_first_frame, mask=mask,
            stop_mode=stop_mode, forced_stop_at=forced_stop_at)
    processed_memory = precompute_memory(params["attention"], memory)
    carry0 = init_carry(b, t_enc, cfg)
    dummy_rng = jnp.zeros((2,), jnp.uint32)

    def run_step(carry, mel_in):
        pre = prenet_apply(params, mel_in, cfg, dummy_rng, train=False)
        return decode_step(params, cfg, pre, carry, memory, processed_memory,
                           mask, dummy_rng, train=False)

    go_frame = jnp.zeros((b, cfg.n_mels), jnp.float32)
    if drop_first_frame:
        carry0, (first_mel, _, _) = run_step(carry0, go_frame)
        input0 = first_mel
    else:
        input0 = go_frame

    mels_buf = jnp.zeros((max_steps, b, cfg.n_mels), jnp.float32)
    gates_buf = jnp.full((max_steps, b), -1e9, jnp.float32)
    align_buf = jnp.zeros((max_steps, b, t_enc), jnp.float32)
    item_done0 = jnp.zeros((b,), bool)
    item_end0 = jnp.full((b,), max_steps, jnp.int32)

    def cond(loop):
        step, done, *_ = loop
        return jnp.logical_and(step < max_steps, jnp.logical_not(done))

    def body(loop):
        (step, done, item_done, item_end, carry, mel_in,
         mels_b, gates_b, align_b) = loop
        carry, (mel, gate, attn) = run_step(carry, mel_in)
        mels_b = mels_b.at[step].set(mel)
        gates_b = gates_b.at[step].set(gate)
        align_b = align_b.at[step].set(attn)
        n_out = step + 1
        fired = jnp.logical_and(n_out > 1,
                                jax.nn.sigmoid(gate) > gate_threshold)
        if forced_stop_at is not None:
            fired = jnp.logical_or(fired, n_out >= forced_stop_at)
        newly = jnp.logical_and(fired, jnp.logical_not(item_done))
        item_end = jnp.where(newly, n_out, item_end)
        item_done = jnp.logical_or(item_done, fired)
        if stop_mode == "any":
            stop = jnp.any(item_done)
        else:
            stop = jnp.all(item_done)
        return (n_out, stop, item_done, item_end, carry, mel,
                mels_b, gates_b, align_b)

    (step, _, item_done, item_end, _, _, mels_buf, gates_buf,
     align_buf) = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.bool_(False), item_done0, item_end0, carry0,
         input0, mels_buf, gates_buf, align_buf))

    frame_ends = jnp.minimum(item_end, step)
    return (jnp.swapaxes(mels_buf, 0, 1), jnp.swapaxes(gates_buf, 0, 1),
            jnp.swapaxes(align_buf, 0, 1), step, frame_ends)
