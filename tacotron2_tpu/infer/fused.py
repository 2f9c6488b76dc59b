"""Fully-fused synthesis: tokens -> waveform in ONE compiled program.

The modular pipeline dispatches decode and vocoding separately; each
device dispatch costs fixed latency (milliseconds through a tunneled
runtime).  This path compiles encoder + autoregressive while_loop decode +
postnet + mel inversion + Griffin-Lim into a single XLA program: one
dispatch per utterance, the minimum possible host involvement.

Frames beyond the gate stop are masked to the log floor before vocoding,
so the (static-shape) vocoder sees silence there; the caller trims the
returned waveform at ``n_frames * hop``.

``synthesize_pcm_proportional`` makes the WHOLE pipeline
LENGTH-PROPORTIONAL — compute and, critically, transfer — while keeping
the ONE-dispatch shape.  The reference's loop is cost-proportional to
output length (reference: src/model.py:318-333); the single fused
program above is not: a 300-frame gate stop still pays the full
``max_steps`` static Griffin-Lim tail and, dominating wall time through
a tunneled runtime, the D2H of the full static-length fp32 waveform
(~1 MB at 1000 frames).  Measured tunnel economics (r4 probes): one
host<->device synchronization costs a fixed ~29 ms round trip
REGARDLESS of payload; enqueues are free; payload streams at ~62 MB/s;
and N async copies issued together collapse into ONE round trip.  So
the winning layout is:

  1. pick a mel-length BUCKET from the text length before dispatch
     (speech length tracks text length; LJSpeech averages ~6.2 mel
     frames per character, the default heuristic pads that to 7/char
     + 40 so under-prediction is rare);
  2. run ONE compiled program for that bucket — decode capped at the
     bucket, bucket-length vocode, int16 PCM out (half-width: the
     exact bytes a WAV stores); and
  3. fetch PCM + ``frame_ends`` with batched async copies — one round
     trip, bucket-proportional payload.
  4. If the gate never fired inside the bucket (``frame_ends`` hit the
     cap), escalate once to the full ``max_steps`` program — the rare
     mispredict costs one extra dispatch, exactly what the
     non-proportional path always paid.

A 300-frame utterance then pays a 384-frame decode+Griffin-Lim and a
~196 KB transfer instead of a 1000-frame tail and ~1 MB fp32 buffer.

The two-phase split (``decode_mel_fused`` + ``vocode_bucket_*``) keeps
the postnet mel device-resident between the phases; it pays a second
round trip, so it suits SERVING (where one decode feeds retries or
multiple vocoders and batches amortize the RTT), not the batch-1
latency path above.
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


# Mel-length buckets for the length-proportional path: the 128-frame grid
# the modular CLI vocoder already uses (infer/vocode.py), densified toward
# short utterances where proportionality matters most.
VOCODE_BUCKETS = (128, 256, 384, 512, 640, 768, 896, 1000)


@functools.partial(jax.jit, static_argnames=(
    "mcfg", "max_steps", "gate_threshold", "stop_mode"))
def decode_mel_fused(params, model_state, mcfg: ModelConfig,
                     tokens: jnp.ndarray,
                     text_lengths: Optional[jnp.ndarray] = None,
                     speaker_ids: Optional[jnp.ndarray] = None, *,
                     max_steps: Optional[int] = None,
                     gate_threshold: Optional[float] = None,
                     stop_mode: str = "any",
                     forced_stop_at: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """tokens (B, T_enc) -> (mel_postnet (B, S, n_mels), n_frames,
    frame_ends), all DEVICE-RESIDENT.

    Phase 1 of the bucketed pipeline: callers fetch only the scalar
    ``frame_ends`` (4 bytes/item) and hand the mel straight to a
    :func:`vocode_bucket_pcm16` program — the (B, S, n_mels) buffer never
    crosses the host boundary."""
    out, n_frames, frame_ends = tacotron2_infer(
        params, model_state, mcfg, tokens, max_steps=max_steps,
        gate_threshold=gate_threshold, text_lengths=text_lengths,
        speaker_ids=speaker_ids, stop_mode=stop_mode,
        forced_stop_at=forced_stop_at)
    return out.mel_postnet, n_frames, frame_ends


def _mask_and_slice(mel: jnp.ndarray, frame_ends: jnp.ndarray,
                    bucket: int, mel_eps: float) -> jnp.ndarray:
    """(B, S, n_mels) -> (B, bucket, n_mels) with post-gate frames at the
    log floor (static slice: bucket is a compile-time constant)."""
    mel = mel[:, :bucket]
    valid = (jnp.arange(bucket)[None, :, None]
             < frame_ends[:, None, None])
    return jnp.where(valid, mel, jnp.float32(np.log(mel_eps)))


def _to_pcm16(wav: jnp.ndarray) -> jnp.ndarray:
    """float waveform -> int16 PCM on device (the bytes a WAV stores;
    halves the D2H next to fp32)."""
    return jnp.clip(jnp.round(wav * 32767.0),
                    -32768.0, 32767.0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("acfg", "bucket", "gl_iters"))
def vocode_bucket_pcm16(mel: jnp.ndarray, frame_ends: jnp.ndarray,
                        acfg: AudioConfig, bucket: int,
                        gl_iters: int = 60) -> jnp.ndarray:
    """Device-resident mel (B, S, n_mels) -> int16 PCM (B, bucket*hop)
    via Griffin-Lim over just the ``bucket``-frame prefix.

    Phase 2 of the bucketed pipeline: one compiled program per bucket,
    compute AND output transfer proportional to the bucket — a 300-frame
    utterance runs the 384-frame program, not the 1000-frame tail."""
    mel = _mask_and_slice(mel, frame_ends, bucket, acfg.mel_eps)
    mel_lin = jnp.exp(jnp.swapaxes(mel, 1, 2))             # (B, n_mels, b)
    linear = mel_to_linear(mel_lin, sr=acfg.sampling_rate, n_fft=acfg.n_fft,
                           n_mels=acfg.n_mels, fmin=acfg.fmin,
                           fmax=acfg.fmax)
    wav = griffin_lim(linear, n_fft=acfg.n_fft, hop_length=acfg.hop_length,
                      win_length=acfg.win_length, n_iter=gl_iters,
                      length=bucket * acfg.hop_length)
    return _to_pcm16(wav)


@functools.partial(jax.jit, static_argnames=("acfg", "bucket"))
def vocode_bucket_hifigan_pcm16(hifigan_params, mel: jnp.ndarray,
                                frame_ends: jnp.ndarray, acfg: AudioConfig,
                                bucket: int) -> jnp.ndarray:
    """HiFi-GAN twin of :func:`vocode_bucket_pcm16` (the reference's
    primary vocoder, reference: inference.py:40-54)."""
    from ..models.hifigan import hifigan_apply
    mel = _mask_and_slice(mel, frame_ends, bucket, acfg.mel_eps)
    wav = hifigan_apply(hifigan_params, jnp.swapaxes(mel, 1, 2))
    return _to_pcm16(wav)


def pick_bucket(n_frames: int, max_steps: int,
                buckets: Tuple[int, ...] = VOCODE_BUCKETS) -> int:
    """Smallest bucket covering ``n_frames``, capped at ``max_steps``."""
    for b in buckets:
        if b >= n_frames:
            return min(b, max_steps)
    return max_steps


def synthesize_wav_buckets(params, model_state, mcfg: ModelConfig,
                           acfg: AudioConfig, tokens: jnp.ndarray,
                           text_lengths: Optional[jnp.ndarray] = None,
                           speaker_ids: Optional[jnp.ndarray] = None, *,
                           max_steps: Optional[int] = None,
                           gate_threshold: Optional[float] = None,
                           stop_mode: str = "any", gl_iters: int = 60,
                           hifigan_params=None,
                           forced_stop_at: Optional[jnp.ndarray] = None,
                           buckets: Tuple[int, ...] = VOCODE_BUCKETS
                           ) -> Tuple[jnp.ndarray, np.ndarray]:
    """tokens (B, T_enc) -> (pcm16 (B, bucket*hop) int16, frame_ends np).

    The length-proportional synthesis pipeline: decode (mel stays on
    device) -> fetch frame_ends (scalars) -> pick the smallest covering
    bucket -> bucket-sized vocode returning int16 PCM.  Sample b's audio
    is valid up to ``frame_ends[b] * hop_length`` samples; divide by
    32767 for float."""
    mel, _, frame_ends = decode_mel_fused(
        params, model_state, mcfg, tokens, text_lengths, speaker_ids,
        max_steps=max_steps, gate_threshold=gate_threshold,
        stop_mode=stop_mode, forced_stop_at=forced_stop_at)
    ends_np = np.asarray(frame_ends)                       # tiny D2H
    bucket = pick_bucket(max(int(ends_np.max()), 1),
                         mel.shape[1], buckets)
    if hifigan_params is not None:
        pcm = vocode_bucket_hifigan_pcm16(hifigan_params, mel, frame_ends,
                                          acfg, bucket)
    else:
        pcm = vocode_bucket_pcm16(mel, frame_ends, acfg, bucket,
                                  gl_iters=gl_iters)
    return pcm, ends_np


# LJSpeech averages ~6.2 mel frames per input character (24 h of audio /
# ~1.2 M transcript characters at 86.13 frames/s); the default predictor
# pads that to 7/char + 40 frames so the gate rarely outruns the bucket.
FRAMES_PER_TOKEN = 7.0
FRAMES_MARGIN = 40


def estimate_frames(n_tokens: int, frames_per_token: float = FRAMES_PER_TOKEN,
                    margin: int = FRAMES_MARGIN) -> int:
    """Predicted mel-frame count for an ``n_tokens``-character input —
    the pre-dispatch bucket picker for the length-proportional path."""
    return int(np.ceil(frames_per_token * n_tokens + margin))


@functools.partial(jax.jit, static_argnames=(
    "mcfg", "acfg", "bucket", "gate_threshold", "stop_mode", "gl_iters",
    "use_hifigan"))
def _synthesize_pcm_bucket(params, model_state, hifigan_params,
                           mcfg: ModelConfig, acfg: AudioConfig,
                           tokens: jnp.ndarray,
                           text_lengths: Optional[jnp.ndarray],
                           speaker_ids: Optional[jnp.ndarray], *,
                           bucket: int,
                           gate_threshold: Optional[float],
                           stop_mode: str, gl_iters: int,
                           use_hifigan: bool,
                           forced_stop_at: Optional[jnp.ndarray]
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONE compiled program per bucket: decode capped at ``bucket`` ->
    mask past the gate stop -> bucket-length vocode -> int16 PCM.
    Everything — compute AND output bytes — is bucket-proportional."""
    out, _, frame_ends = tacotron2_infer(
        params, model_state, mcfg, tokens, max_steps=bucket,
        gate_threshold=gate_threshold, text_lengths=text_lengths,
        speaker_ids=speaker_ids, stop_mode=stop_mode,
        forced_stop_at=forced_stop_at)
    mel = _mask_and_slice(out.mel_postnet, frame_ends, bucket, acfg.mel_eps)
    if use_hifigan:
        from ..models.hifigan import hifigan_apply
        wav = hifigan_apply(hifigan_params, jnp.swapaxes(mel, 1, 2))
    else:
        mel_lin = jnp.exp(jnp.swapaxes(mel, 1, 2))         # (B, n_mels, b)
        linear = mel_to_linear(mel_lin, sr=acfg.sampling_rate,
                               n_fft=acfg.n_fft, n_mels=acfg.n_mels,
                               fmin=acfg.fmin, fmax=acfg.fmax)
        wav = griffin_lim(linear, n_fft=acfg.n_fft,
                          hop_length=acfg.hop_length,
                          win_length=acfg.win_length, n_iter=gl_iters,
                          length=bucket * acfg.hop_length)
    # The mel rides along device-resident; callers that want it (the CLI's
    # mel-stats diagnostic) fetch it in the same async round — unfetched
    # outputs cost nothing but their HBM.
    return _to_pcm16(wav), frame_ends, mel


def synthesize_pcm_proportional(params, model_state, mcfg: ModelConfig,
                                acfg: AudioConfig, tokens: jnp.ndarray,
                                text_lengths: Optional[jnp.ndarray] = None,
                                speaker_ids: Optional[jnp.ndarray] = None, *,
                                expected_frames: Optional[int] = None,
                                max_steps: Optional[int] = None,
                                gate_threshold: Optional[float] = None,
                                stop_mode: str = "any", gl_iters: int = 60,
                                hifigan_params=None,
                                forced_stop_at: Optional[jnp.ndarray] = None,
                                buckets: Tuple[int, ...] = VOCODE_BUCKETS,
                                frames_per_token: float = FRAMES_PER_TOKEN,
                                frames_margin: int = FRAMES_MARGIN,
                                return_mel: bool = False):
    """tokens (B, T_enc) -> (pcm16 (B, bucket*hop) int16 np, frame_ends np,
    bucket) — the LENGTH-PROPORTIONAL one-dispatch synthesis path.

    Picks the mel bucket from the text length BEFORE dispatch (or from
    ``expected_frames`` when the caller knows better), runs the one-shot
    bucket program, and fetches PCM + frame_ends with batched async
    copies (one tunnel round trip).  If the gate never fired inside the
    bucket, escalates once to the full ``max_steps`` program.  Sample
    b's audio is valid up to ``frame_ends[b] * hop_length`` samples;
    divide by 32767 for float.

    ``return_mel=True`` appends the (B, bucket, n_mels) post-gate-masked
    postnet mel as a fourth element, fetched in the SAME async round
    (for diagnostics — the reference prints mel stats before vocoding,
    reference: inference.py:98-111)."""
    limit = mcfg.max_decoder_steps if max_steps is None else max_steps
    if expected_frames is None:
        if text_lengths is not None:
            n_tok = int(np.max(np.asarray(text_lengths)))
        else:
            n_tok = int(tokens.shape[1])
        expected_frames = estimate_frames(n_tok, frames_per_token,
                                          frames_margin)
    bucket = pick_bucket(expected_frames, limit, buckets)
    while True:
        pcm, ends, mel = _synthesize_pcm_bucket(
            params, model_state, hifigan_params, mcfg, acfg, tokens,
            text_lengths, speaker_ids, bucket=bucket,
            gate_threshold=gate_threshold, stop_mode=stop_mode,
            gl_iters=gl_iters, use_hifigan=hifigan_params is not None,
            forced_stop_at=forced_stop_at)
        # Batched async copies -> ONE round trip for all fetched outputs.
        pcm.copy_to_host_async()
        ends.copy_to_host_async()
        if return_mel:
            mel.copy_to_host_async()
        pcm_np = np.asarray(pcm)
        ends_np = np.asarray(ends)
        if bucket >= limit or int(ends_np.max()) < bucket:
            if return_mel:
                return pcm_np, ends_np, bucket, np.asarray(mel)
            return pcm_np, ends_np, bucket
        # Gate still open at the bucket cap: the prediction was short.
        # One escalation to the full-length program settles it (a gate
        # that fired EXACTLY at the cap reruns too — indistinguishable
        # from a miss, and the rerun returns the identical audio).
        bucket = limit


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
