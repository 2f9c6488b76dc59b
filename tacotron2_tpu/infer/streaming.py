"""Streaming synthesis: yield mel chunks while the decoder is still running.

New capability beyond the reference (which returns audio only after the
full decode): the autoregressive loop runs in fixed-size jitted chunks
(``lax.scan`` over K frames with the decoder carry threaded between calls),
and each chunk's frames are yielded as soon as they exist.  Time-to-first-
mel is one encoder pass + K decode steps (a few ms on TPU) instead of the
whole utterance.

The mel-level generator is the stable API; chunk vocoding is left to the
caller (convolutional vocoders need overlap handling that depends on the
vocoder's receptive field).
"""

from __future__ import annotations

import functools
from typing import Generator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig
from ..models.attention import precompute_memory
from ..models.decoder import DecoderCarry, decode_step, init_carry, \
    prenet_apply
from ..models.encoder import encoder_apply
from ..models.tacotron2 import (_condition_memory, make_pad_mask,
                                 make_speaker_ids)
from ..text import pad_sequences, text_to_sequence


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode(params, state, cfg: ModelConfig, tokens, text_lengths,
            speaker_ids):
    memory, _ = encoder_apply(params["encoder"], state["encoder"], tokens,
                              cfg, train=False)
    memory = _condition_memory(params, memory, speaker_ids)
    processed = precompute_memory(params["decoder"]["attention"], memory)
    mask = make_pad_mask(text_lengths, tokens.shape[1])
    return memory, processed, mask


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _decode_chunk(params, cfg: ModelConfig, carry: DecoderCarry,
                  mel_in: jnp.ndarray, memory, processed, mask, k: int
                  ) -> Tuple[DecoderCarry, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Run K decoder steps from ``carry``; returns (carry', last_mel,
    mels (B, K, n_mels), gate_logits (B, K))."""
    dummy_rng = jnp.zeros((2,), jnp.uint32)

    def step(c, _):
        carry, mel = c
        pre = prenet_apply(params["decoder"], mel, cfg, dummy_rng,
                           train=False)
        carry, (mel2, gate, _attn) = decode_step(
            params["decoder"], cfg, pre, carry, memory, processed, mask,
            dummy_rng, train=False)
        return (carry, mel2), (mel2, gate)

    (carry, last_mel), (mels, gates) = jax.lax.scan(
        step, (carry, mel_in), None, length=k)
    return carry, last_mel, jnp.swapaxes(mels, 0, 1), jnp.swapaxes(gates,
                                                                   0, 1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _postnet_window(params, model_state, cfg: ModelConfig,
                    mel_tn: jnp.ndarray) -> jnp.ndarray:
    """Postnet over one (T, n_mels) window -> refined (T, n_mels)."""
    from ..models.postnet import postnet_apply
    x = mel_tn.T[None]                                  # (1, n_mels, T)
    residual, _ = postnet_apply(params["postnet"], model_state["postnet"],
                                x, cfg, jnp.zeros((2,), jnp.uint32),
                                train=False)
    return (x + residual)[0].T


def _refine_stream(params, model_state, mcfg: ModelConfig, coarse_gen,
                   chunk_frames: int) -> Generator[np.ndarray, None, None]:
    """Apply the postnet to a coarse-mel chunk stream EXACTLY, with an
    ``r``-frame lookahead delay.

    The postnet is a non-causal conv stack with receptive radius
    ``r = n_layers * (kernel-1)/2`` (10 frames at reference dims): a
    frame's refinement needs r future coarse frames.  The stream holds
    back the last r frames of each chunk and refines every emitted frame
    with full left+right coarse context, so the concatenated output is
    bit-comparable to offline postnet application.

    Mid-stream windows are padded to ONE static shape (the emit region
    never sees the padding: its receptive cone stays inside the real
    frames), so one extra XLA program serves the stream's steady state.
    The FLUSH window's tail frames do see past the end, where offline
    semantics depend on how the stream ended: a gate stop leaves real
    zero frames in the offline buffer (zero padding reproduces them,
    phantom BatchNorm activations and all), while hitting the step cap
    means the offline conv SAME-pads each LAYER at the boundary — only an
    unpadded window reproduces that, so cap flushes run the window at its
    exact length (a rare per-length compile, only for utterances that hit
    the cap).
    """
    n_mels = mcfg.n_mels
    r = mcfg.postnet_n_convolutions * ((mcfg.postnet_kernel_size - 1) // 2)
    bufmax = 2 * r + chunk_frames
    left = np.zeros((0, n_mels), np.float32)      # emitted coarse tail
    pending = np.zeros((0, n_mels), np.float32)   # lookahead hold-back

    def refine(buf: np.ndarray, lo: int, hi: int,
               pad: bool = True) -> np.ndarray:
        t = buf.shape[0]
        # Mid-stream, bufmax padding is cosmetic (the emit region's cone
        # stays inside the real frames).  On a gate-stop FLUSH the last
        # emitted frame's cone genuinely reads r zero frames past the
        # end (the offline buffer's trailing zeros), and when
        # chunk_frames < r, bufmax = 2r + chunk_frames leaves fewer than
        # r rows after a full 2r-frame flush buffer — so pad to at least
        # hi + r real-or-zero rows (one extra compile, flush-only).
        target = max(bufmax, hi + r)
        if pad and t < target:
            buf = np.concatenate(
                [buf, np.zeros((target - t, n_mels), np.float32)])
        out = np.asarray(_postnet_window(params, model_state, mcfg,
                                         jnp.asarray(buf)))
        return out[lo:hi]

    end_reason, tail = "cap", 0
    gen = iter(coarse_gen)
    while True:
        try:
            chunk = next(gen)
        except StopIteration as stop:
            # ("gate", zero_tail): zero_tail = how many REAL zero rows
            # the offline buffer holds past the stop (max_steps - n).
            if isinstance(stop.value, tuple):
                end_reason, tail = stop.value
            else:
                # bare reason string: a gate stop with unspecified tail
                # assumes ample offline zeros (the pre-tuple contract)
                end_reason = stop.value or "cap"
                tail = r if end_reason == "gate" else 0
            break
        body = np.concatenate([pending, np.asarray(chunk, np.float32)])
        emit = body.shape[0] - r
        if emit <= 0:
            pending = body
            continue
        buf = np.concatenate([left, body])
        yield refine(buf, left.shape[0], left.shape[0] + emit)
        hist = buf[: left.shape[0] + emit]
        left = hist[-r:]
        pending = body[emit:]
    if pending.shape[0]:
        buf = np.concatenate([left, pending])
        if end_reason == "gate" and tail < r:
            # Gate fired within r frames of the step cap: the offline
            # buffer holds only ``tail`` real zero rows before it ENDS
            # (per-layer conv SAME padding there).  Reproduce exactly:
            # append those zeros and run the window at its true length.
            buf = np.concatenate(
                [buf, np.zeros((tail, n_mels), np.float32)])
            yield refine(buf, left.shape[0], buf.shape[0] - tail,
                         pad=False)
        else:
            yield refine(buf, left.shape[0], buf.shape[0],
                         pad=(end_reason == "gate"))


def stream_mels(params, model_state, text: str,
                cfg: Optional[Config] = None, chunk_frames: int = 64,
                max_steps: Optional[int] = None,
                gate_threshold: Optional[float] = None,
                drop_first_frame: bool = True,
                speaker_id: Optional[int] = None,
                apply_postnet: bool = False
                ) -> Generator[np.ndarray, None, None]:
    """Generator of mel chunks ((<=chunk_frames, n_mels) each) for one
    utterance, ending at the gate firing or the step cap.

    By default streams the decoder's coarse mels.  ``apply_postnet=True``
    streams postnet-refined mels instead, at the cost of a fixed
    10-frame (~116 ms of audio) lookahead delay — the refined stream
    concatenates to exactly the offline postnet output (see
    :func:`_refine_stream`).
    """
    cfg = cfg or Config()
    if apply_postnet:
        coarse = stream_mels(params, model_state, text, cfg, chunk_frames,
                             max_steps, gate_threshold, drop_first_frame,
                             speaker_id, apply_postnet=False)
        yield from _refine_stream(params, model_state, cfg.model, coarse,
                                  chunk_frames)
        return
    mcfg = cfg.model
    max_steps = mcfg.max_decoder_steps if max_steps is None else max_steps
    thr = mcfg.gate_threshold if gate_threshold is None else gate_threshold

    seq = text_to_sequence(text) or [0]
    tokens, lengths = pad_sequences([seq], pad_multiple=16)
    memory, processed, mask = _encode(
        params, model_state, mcfg, jnp.asarray(tokens),
        jnp.asarray(lengths), make_speaker_ids(speaker_id, 1, mcfg))

    carry = init_carry(1, tokens.shape[1], mcfg)
    mel_in = jnp.zeros((1, mcfg.n_mels), jnp.float32)

    # Exactly TWO compiled programs run this generator: _encode and the
    # fixed-K _decode_chunk.  The tail is trimmed on host rather than
    # compiling a smaller-K program, and the reference's dropped-first-
    # frame quirk (src/model.py:309-316) is realized by discarding the
    # first frame of the first chunk (the scan feeds it forward
    # internally, so the state trajectory is identical).
    produced = 0            # recorded (yielded) frame count
    first_chunk = drop_first_frame
    while produced < max_steps:
        carry, mel_in, mels, gates = _decode_chunk(
            params, mcfg, carry, mel_in, memory, processed, mask,
            chunk_frames)
        mels_np = np.asarray(mels)[0]                      # (K, n_mels)
        sig = 1.0 / (1.0 + np.exp(-np.asarray(gates)[0]))  # (K,)
        if first_chunk:
            mels_np = mels_np[1:]
            sig = sig[1:]
            first_chunk = False
        k = min(len(mels_np), max_steps - produced)
        mels_np, sig = mels_np[:k], sig[:k]
        # gate semantics: stop once >1 total recorded frames AND sig > thr
        fired = np.nonzero((sig > thr)
                           & (np.arange(produced + 1,
                                        produced + k + 1) > 1))[0]
        if len(fired):
            end = int(fired[0]) + 1
            if end:
                yield mels_np[:end]
            # why the stream ended + how many real zero rows the offline
            # max_steps buffer holds past the stop (postnet flush needs
            # this to reproduce offline semantics when the gate fires
            # within the postnet radius of the cap)
            return ("gate", max_steps - (produced + end))
        produced += k
        if k:
            yield mels_np
    return ("cap", 0)
