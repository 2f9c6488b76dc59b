"""Fully-fused synthesis: tokens -> waveform in ONE compiled program.

The modular pipeline dispatches decode and vocoding separately; each
device dispatch costs fixed latency (milliseconds through a tunneled
runtime).  This path compiles encoder + autoregressive while_loop decode +
postnet + mel inversion + Griffin-Lim into a single XLA program: one
dispatch per utterance, the minimum possible host involvement.

Frames beyond the gate stop are masked to the log floor before vocoding,
so the (static-shape) vocoder sees silence there; the caller trims the
returned waveform at ``n_frames * hop``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig, Config, ModelConfig
from ..dsp.griffinlim import griffin_lim, mel_to_linear
from ..models.tacotron2 import make_speaker_ids, tacotron2_infer
from ..text import pad_sequences, text_to_sequence


@functools.partial(jax.jit, static_argnames=(
    "mcfg", "acfg", "max_steps", "gate_threshold", "stop_mode", "gl_iters"))
def synthesize_wav_fused(params, model_state, mcfg: ModelConfig,
                         acfg: AudioConfig, tokens: jnp.ndarray,
                         text_lengths: Optional[jnp.ndarray] = None,
                         speaker_ids: Optional[jnp.ndarray] = None, *,
                         max_steps: Optional[int] = None,
                         gate_threshold: Optional[float] = None,
                         stop_mode: str = "any",
                         gl_iters: int = 60,
                         forced_stop_at: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """tokens (B, T_enc) -> (wav (B, S*hop), n_frames, frame_ends).

    Waveforms are Griffin-Lim reconstructions of the postnet mels; sample
    b's audio is valid up to ``frame_ends[b] * hop_length``.
    ``forced_stop_at`` (traced int32 scalar) force-fires the gate at that
    frame — see models/decoder.py::decoder_infer.
    """
    out, n_frames, frame_ends = tacotron2_infer(
        params, model_state, mcfg, tokens, max_steps=max_steps,
        gate_threshold=gate_threshold, text_lengths=text_lengths,
        speaker_ids=speaker_ids, stop_mode=stop_mode,
        forced_stop_at=forced_stop_at)
    mel = out.mel_postnet                                  # (B, S, n_mels)
    s = mel.shape[1]
    valid = (jnp.arange(s)[None, :, None]
             < frame_ends[:, None, None])                  # (B, S, 1)
    mel = jnp.where(valid, mel, jnp.float32(np.log(acfg.mel_eps)))
    mel_lin = jnp.exp(jnp.swapaxes(mel, 1, 2))             # (B, n_mels, S)
    linear = mel_to_linear(mel_lin, sr=acfg.sampling_rate, n_fft=acfg.n_fft,
                           n_mels=acfg.n_mels, fmin=acfg.fmin,
                           fmax=acfg.fmax)
    wav = griffin_lim(linear, n_fft=acfg.n_fft, hop_length=acfg.hop_length,
                      win_length=acfg.win_length, n_iter=gl_iters,
                      length=s * acfg.hop_length)
    return wav, n_frames, frame_ends


@functools.partial(jax.jit, static_argnames=(
    "mcfg", "acfg", "max_steps", "gate_threshold", "stop_mode",
    "vocoder_chunk_frames"))
def synthesize_wav_fused_hifigan(params, model_state, hifigan_params,
                                 mcfg: ModelConfig, acfg: AudioConfig,
                                 tokens: jnp.ndarray,
                                 text_lengths: Optional[jnp.ndarray] = None,
                                 speaker_ids: Optional[jnp.ndarray] = None, *,
                                 max_steps: Optional[int] = None,
                                 gate_threshold: Optional[float] = None,
                                 stop_mode: str = "any",
                                 vocoder_chunk_frames: Optional[int] = None
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray, jnp.ndarray]:
    """tokens (B, T_enc) -> (wav (B, S*hop), mel_postnet (B, S, n_mels),
    n_frames, frame_ends) with the neural vocoder fused into the same XLA
    program.

    The reference's primary synthesis path is Tacotron 2 -> HiFi-GAN
    (reference: inference.py:40-54,71-74), as two separate model calls; here
    encoder + while_loop decode + postnet + the full HiFi-GAN generator
    compile into ONE dispatch.  Frames past the gate stop are masked to the
    log-mel floor, so the vocoder renders silence there; trim returned audio
    at ``frame_ends[b] * hop_length`` (the generator's total upsampling
    256 == hop_length).

    ``vocoder_chunk_frames`` bounds the generator's peak activation
    memory by vocoding the mel in exact receptive-field-overlapped
    windows of that many frames (models.hifigan.hifigan_apply_chunked):
    the unchunked generator's upsampled activations are the HBM wall
    that caps fused serving batch size.
    """
    from ..models.hifigan import hifigan_apply, hifigan_apply_chunked
    out, n_frames, frame_ends = tacotron2_infer(
        params, model_state, mcfg, tokens, max_steps=max_steps,
        gate_threshold=gate_threshold, text_lengths=text_lengths,
        speaker_ids=speaker_ids, stop_mode=stop_mode)
    mel = out.mel_postnet                                  # (B, S, n_mels)
    s = mel.shape[1]
    valid = (jnp.arange(s)[None, :, None]
             < frame_ends[:, None, None])                  # (B, S, 1)
    mel = jnp.where(valid, mel, jnp.float32(np.log(acfg.mel_eps)))
    mel_ct = jnp.swapaxes(mel, 1, 2)                       # (B, n_mels, S)
    if vocoder_chunk_frames:
        wav = hifigan_apply_chunked(hifigan_params, mel_ct,
                                    chunk=vocoder_chunk_frames)
    else:
        wav = hifigan_apply(hifigan_params, mel_ct)
    return wav, mel, n_frames, frame_ends


def synthesize_wav(params, model_state, texts, cfg: Optional[Config] = None,
                   max_steps: Optional[int] = None, gl_iters: int = 60,
                   speaker_id: Optional[int] = None, hifigan_params=None):
    """Host convenience: texts -> list of trimmed float32 waveforms via the
    single-dispatch fused program (HiFi-GAN when ``hifigan_params`` is
    given, Griffin-Lim otherwise)."""
    cfg = cfg or Config()
    seqs = [text_to_sequence(t) or [0] for t in texts]
    tokens, lengths = pad_sequences(seqs, pad_multiple=16)
    speaker_ids = make_speaker_ids(speaker_id, len(texts), cfg.model)
    stop_mode = "all" if len(texts) > 1 else "any"
    if hifigan_params is not None:
        wav, _, _, ends = synthesize_wav_fused_hifigan(
            params, model_state, hifigan_params, cfg.model, cfg.audio,
            jnp.asarray(tokens), jnp.asarray(lengths), speaker_ids,
            max_steps=max_steps, stop_mode=stop_mode)
    else:
        wav, _, ends = synthesize_wav_fused(
            params, model_state, cfg.model, cfg.audio, jnp.asarray(tokens),
            jnp.asarray(lengths), speaker_ids,
            max_steps=max_steps, gl_iters=gl_iters, stop_mode=stop_mode)
    wav_np = np.asarray(wav)
    ends_np = np.asarray(ends)
    return [wav_np[b, : int(ends_np[b]) * cfg.audio.hop_length]
            for b in range(len(texts))]
