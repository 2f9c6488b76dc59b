"""Text-to-speech synthesis pipeline (the inference.py core).

Counterpart of the reference inference routine (reference: inference.py:15-96):
load checkpoint -> text_to_sequence -> autoregressive mel decode -> vocoder
(HiFi-GAN or Griffin-Lim) -> auto-numbered output WAV.  Batched synthesis is
a first-class capability here (the reference is single-utterance).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..dsp.wav import save_wav
from ..models import tacotron2_infer_jit
from ..models.tacotron2 import make_speaker_ids
from ..text import pad_sequences, text_to_sequence
from ..train.checkpoint import load_any_checkpoint
from ..train.state import create_train_state


def print_mel_stats(mel, tag: str) -> None:
    """Pred-mel stats + scale warning (reference: inference.py:98-111)."""
    from ..utils.diagnostics import mel_stats
    s = mel_stats(mel)
    print(f"[MEL STATS] {tag}: min {s['min']:.4f} max {s['max']:.4f} "
          f"mean {s['mean']:.4f} std {s['std']:.4f} p01 {s['p01']:.4f} "
          f"p50 {s['p50']:.4f} p99 {s['p99']:.4f}")
    if s["min"] >= -1e-4 and 0.0 <= s["max"] <= 1.05:
        print(f"[WARN] {tag}: Mel appears 0-1 linear; pretrained HiFi-GAN "
              f"expects log-mel (negative values).")
    else:
        print(f"[INFO] {tag}: Mel dynamic range includes negatives or >1 "
              f"values; likely log-compressed.")


def load_model(checkpoint_path: str, cfg: Optional[Config] = None):
    """Load (params, model_state) from any framework checkpoint.

    ``cfg`` must match the checkpoint's architecture (multi-speaker
    checkpoints need ``cfg.model.n_speakers`` set, e.g. via the CLIs'
    ``--n_speakers``)."""
    import os
    cfg = cfg or Config()
    if not os.path.exists(checkpoint_path):
        raise FileNotFoundError(
            f"checkpoint not found: {checkpoint_path}")
    template = create_train_state(cfg)
    try:
        params, model_state, _, _, _ = load_any_checkpoint(
            checkpoint_path, template)
    except Exception as e:
        raise RuntimeError(
            f"could not load checkpoint {checkpoint_path!r}: "
            f"{type(e).__name__}: {e} (multi-speaker checkpoints need a "
            f"matching n_speakers config / --n_speakers)") from e
    # Stage the weights on the default device ONCE: params-only restores
    # land as host numpy (backend-independent restore), and every
    # synthesis dispatch with host operands would re-upload ~43 MB —
    # catastrophic through a tunneled chip (measured 1.9 s/call vs 76 ms).
    import jax
    params = jax.device_put(params)
    model_state = jax.device_put(model_state)
    return params, model_state


def synthesize_mels(params, model_state, texts: Sequence[str],
                    cfg: Optional[Config] = None,
                    max_steps: Optional[int] = None,
                    gate_threshold: Optional[float] = None,
                    speaker_id: Optional[int] = None
                    ) -> Tuple[List[np.ndarray], np.ndarray]:
    """Texts -> list of (T_i, n_mels) postnet mels (gate-trimmed per item).

    Single texts use the reference's stop semantics (src/model.py:327);
    multi-text batches decode until EVERY item's gate fires (stop_mode
    'all') with padded encoder positions masked, and each returned mel is
    trimmed at its own gate firing.
    """
    cfg = cfg or Config()
    seqs = [text_to_sequence(t) for t in texts]
    tokens, lengths = pad_sequences(seqs, pad_multiple=16)
    speaker_ids = make_speaker_ids(speaker_id, len(texts), cfg.model)
    out, n_frames, frame_ends = tacotron2_infer_jit(
        params, model_state, cfg.model, jnp.asarray(tokens),
        max_steps=max_steps, gate_threshold=gate_threshold,
        text_lengths=jnp.asarray(lengths), speaker_ids=speaker_ids,
        stop_mode="all" if len(texts) > 1 else "any")
    n = int(n_frames)
    mel_post = np.asarray(out.mel_postnet)[:, :n]
    if n < 3:
        print(f"[WARN] Very short mel length ({n}) - possible premature "
              f"stop. Gate threshold={cfg.model.gate_threshold}")
    ends = np.asarray(frame_ends)
    mels = [mel_post[b, :int(ends[b])] for b in range(mel_post.shape[0])]
    return mels, np.asarray(out.alignments)[:, :n]


def next_output_path(output_dir: str, stem: str = "output",
                     ext: str = ".wav") -> str:
    """First free ``output_N.wav`` path (reference: inference.py:86-91)."""
    os.makedirs(output_dir, exist_ok=True)
    counter = 1
    while True:
        path = os.path.join(output_dir, f"{stem}_{counter}{ext}")
        if not os.path.exists(path):
            return path
        counter += 1


def synthesize(text: str, checkpoint_path: str, output_dir: str,
               vocoder: str = "griffinlim",
               cfg: Optional[Config] = None,
               griffinlim_iters: int = 60,
               speaker_id: Optional[int] = None) -> str:
    """Full single-utterance pipeline; returns the written WAV path."""
    cfg = cfg or Config()
    print("Loading Tacotron 2 model...")
    params, model_state = load_model(checkpoint_path, cfg)
    print("Tacotron 2 model loaded.")

    from .vocode import try_load_hifigan_params
    hifigan_params = (try_load_hifigan_params()
                      if vocoder.lower() == "hifigan" else None)

    # Length-proportional one-dispatch path (both vocoders): the mel
    # bucket is picked from the text length before dispatch, the whole
    # encoder + decode + postnet + vocoder pipeline runs as ONE bucket-
    # sized XLA program, and int16 PCM + frame_ends + the diagnostic mel
    # come back in one batched-async round trip (infer/fused.py) — the
    # reference's cost-proportional loop (src/model.py:318-333) plus its
    # two-model vocoder round-trip (inference.py:40-54), in one dispatch.
    from .fused import synthesize_pcm_proportional
    print("Processing input text + generating waveform "
          f"({'HiFi-GAN' if hifigan_params is not None else 'Griffin-Lim'} "
          "fused length-proportional program)...")
    tokens, lengths = pad_sequences([text_to_sequence(text) or [0]],
                                    pad_multiple=16)
    speaker_ids = make_speaker_ids(speaker_id, 1, cfg.model)
    pcm, ends, bucket, mel = synthesize_pcm_proportional(
        params, model_state, cfg.model, cfg.audio, jnp.asarray(tokens),
        jnp.asarray(lengths), speaker_ids, gl_iters=griffinlim_iters,
        hifigan_params=hifigan_params, return_mel=True)
    n0 = int(ends[0])
    if n0 < 3:
        print(f"[WARN] Very short mel length ({n0}) - possible "
              f"premature stop. Gate threshold="
              f"{cfg.model.gate_threshold}")
    print_mel_stats(mel[0, :max(n0, 1)], "Pred PostNet Mel")
    audio = pcm[0, : n0 * cfg.audio.hop_length].astype(np.float32) / 32767.0

    out_path = next_output_path(output_dir)
    save_wav(out_path, np.asarray(audio), cfg.audio.sampling_rate)
    print(f"\nAudio successfully saved to: {out_path}")
    return out_path
