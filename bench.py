#!/usr/bin/env python
"""Synthesis benchmark: prints ONE JSON line with the headline metric.

Headline: batch-1 synthesis real-time factor (RTF) on one chip — wall time
to generate audio divided by audio duration — for the full pipeline the
reference's config 1 exercises (autoregressive Tacotron 2 mel decode +
Griffin-Lim vocoder; reference: inference.py:15-96), measured through the
framework's fused single-dispatch program (tokens -> waveform in one XLA
executable, tacotron2_tpu/infer/fused.py).  The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` compares against the north-star
target RTF 0.01 from BASELINE.json: values > 1 beat the target.

Secondary metrics (modular-path RTF, batch-16 throughput) print to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from tacotron2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.dsp.griffinlim import griffin_lim, mel_to_linear
    from tacotron2_tpu.infer.fused import synthesize_wav_fused
    from tacotron2_tpu.models import tacotron2_infer_jit, tacotron2_init

    cfg = Config()
    acfg = cfg.audio
    log(f"devices: {jax.devices()}")

    params, state = tacotron2_init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)

    def synth(tokens, max_steps):
        out, n, _ = tacotron2_infer_jit(params, state, cfg.model, tokens,
                                        max_steps=max_steps)
        return out.mel_postnet, n

    def vocode(mel_bt):  # (B, T, n_mels) -> (B, samples)
        mel_lin = jnp.exp(jnp.swapaxes(mel_bt, 1, 2))
        linear = mel_to_linear(mel_lin, sr=acfg.sampling_rate,
                               n_fft=acfg.n_fft, n_mels=acfg.n_mels,
                               fmin=acfg.fmin, fmax=acfg.fmax)
        return griffin_lim(linear, n_fft=acfg.n_fft,
                           hop_length=acfg.hop_length,
                           win_length=acfg.win_length, n_iter=60)

    # Fresh weights never fire the gate -> decode runs exactly max_steps:
    # a deterministic, worst-case-length workload.
    max_steps = 1000  # ~11.6 s of audio at 22.05 kHz / hop 256

    def run_fused(batch):
        # new tokens every call — the runtime dedupes identical executions
        tokens = jnp.asarray(rng.integers(1, 72, (batch, 64)), jnp.int32)
        lengths = jnp.full((batch,), 64, jnp.int32)
        wav, n, _ = synthesize_wav_fused(
            params, state, cfg.model, acfg, tokens, lengths, None,
            max_steps=max_steps)
        float(wav[0, -1])  # force full sync
        return int(n), wav.shape

    def run_modular(batch):
        tokens = jnp.asarray(rng.integers(1, 72, (batch, 64)), jnp.int32)
        mel, n = synth(tokens, max_steps)
        wav = vocode(mel)
        float(wav[0, -1])
        return int(n), wav.shape

    # warmup / compile
    t0 = time.time()
    n_frames, wav_shape = run_fused(1)
    log(f"compile+first run: {time.time() - t0:.1f}s "
        f"(frames={n_frames}, wav={wav_shape})")

    # ---- batch 1 timed (fused single-dispatch program) ----
    iters = 5
    walls = []
    for _ in range(iters):
        t0 = time.time()
        n_frames, _ = run_fused(1)
        walls.append(time.time() - t0)
    wall = float(np.median(walls))
    audio_sec = n_frames * acfg.hop_length / acfg.sampling_rate
    rtf1 = wall / audio_sec
    fps1 = n_frames / wall
    log(f"batch1 fused: wall {wall:.3f}s for {audio_sec:.2f}s audio -> "
        f"RTF {rtf1:.5f}, {fps1:.0f} frames/s")

    # ---- modular path (separate decode + vocode dispatches) ----
    run_modular(1)  # warmup
    t0 = time.time()
    run_modular(1)
    log(f"batch1 modular: wall {time.time() - t0:.3f}s")

    # ---- batch 16 timed ----
    run_fused(16)  # warmup/compile for the batch-16 shapes
    t0 = time.time()
    n_frames16, _ = run_fused(16)
    wall16 = time.time() - t0
    fps16 = 16 * n_frames16 / wall16
    rtf16 = wall16 / (16 * n_frames16 * acfg.hop_length / acfg.sampling_rate)
    log(f"batch16 fused: wall {wall16:.3f}s -> per-stream RTF {rtf16:.5f}, "
        f"aggregate {fps16:.0f} frames/s")

    print(json.dumps({
        "metric": "synthesis_rtf_batch1",
        "value": round(rtf1, 6),
        "unit": "rtf (wall_sec / audio_sec; lower is better)",
        "vs_baseline": round(0.01 / rtf1, 4),
    }))


if __name__ == "__main__":
    main()
