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


def stream_mels(params, model_state, text: str,
                cfg: Optional[Config] = None, chunk_frames: int = 64,
                max_steps: Optional[int] = None,
                gate_threshold: Optional[float] = None,
                drop_first_frame: bool = True,
                speaker_id: Optional[int] = None
                ) -> Generator[np.ndarray, None, None]:
    """Generator of coarse-mel chunks ((<=chunk_frames, n_mels) each) for
    one utterance, ending at the gate firing or the step cap.

    Streams the decoder's coarse mels (the postnet is a non-causal conv
    over the whole utterance; callers wanting postnet refinement apply it
    to the concatenated stream afterwards).
    """
    cfg = cfg or Config()
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
            return
        produced += k
        if k:
            yield mels_np
