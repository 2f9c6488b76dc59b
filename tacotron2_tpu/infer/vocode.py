"""Shared vocoding helper with compile-stable shapes.

Gate-trimmed mels have arbitrary lengths; vocoding each exact length would
compile a fresh XLA program per length.  This helper pads the time axis to
128-frame buckets (log-floor frames), vocodes, and trims the audio back —
steady-state traffic reuses a handful of compiled vocoder programs.
Used by the CLI batch/single paths, long-form synthesis, the debug export,
and the HTTP server.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax.numpy as jnp

from ..config import AudioConfig
from ..dsp.griffinlim import griffin_lim, mel_to_linear

_FRAME_BUCKET = 128


def vocode_mel(mel: np.ndarray, cfg: AudioConfig,
               vocoder: Optional[Callable] = None,
               griffinlim_iters: int = 60) -> np.ndarray:
    """(T, n_mels) log-mel -> waveform (T * hop samples).

    ``vocoder``: optional callable (B, n_mels, T) -> (B, samples) (e.g. the
    HiFi-GAN closure); None uses Griffin-Lim.
    """
    t_true = int(mel.shape[0])
    t_pad = -(-t_true // _FRAME_BUCKET) * _FRAME_BUCKET
    mel = _pad_frames(mel, t_pad, cfg.mel_eps)
    if vocoder is not None:
        audio = np.asarray(vocoder(mel.T[None])[0])
    else:
        # exp: these are log-power mels; explicit length covers ALL t_pad
        # frames (griffin_lim's default hop*(T-1) would drop the last one)
        linear = mel_to_linear(
            jnp.exp(jnp.asarray(mel.T)), sr=cfg.sampling_rate,
            n_fft=cfg.n_fft, n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax)
        audio = np.asarray(griffin_lim(
            linear, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
            win_length=cfg.win_length, n_iter=griffinlim_iters,
            length=t_pad * cfg.hop_length))
    return audio[: t_true * cfg.hop_length]


def _pad_frames(mel: np.ndarray, t_pad: int, eps: float) -> np.ndarray:
    t = int(mel.shape[0])
    if t_pad == t:
        return mel
    return np.concatenate(
        [mel, np.full((t_pad - t, mel.shape[1]), np.log(eps), mel.dtype)],
        axis=0)


def vocode_mels(mels, cfg: AudioConfig, vocoder: Optional[Callable] = None,
                griffinlim_iters: int = 60, max_group: int = 16):
    """Batched counterpart of :func:`vocode_mel` for a list of
    variable-length (T_i, n_mels) mels — returns trimmed waveforms in
    order.

    Mels sharing a 128-frame time bucket are stacked and vocoded in ONE
    device call (the group is padded to a power-of-two batch by repeating
    the last mel, so steady-state traffic reuses O(log B x buckets)
    compiled programs).  Griffin-Lim and the HiFi-GAN callable both
    batch on device, so a coalesced serving batch pays one vocoder
    dispatch per distinct length bucket instead of one per request.

    ``max_group`` splits oversized buckets into multiple dispatches: the
    fp32 HiFi-GAN generator's activations exceed HBM past batch ~32
    (models/hifigan.py), so unbounded grouping would OOM exactly where
    batching matters most.
    """
    out = [None] * len(mels)
    buckets = {}
    for i, m in enumerate(mels):
        t_pad = -(-int(m.shape[0]) // _FRAME_BUCKET) * _FRAME_BUCKET
        buckets.setdefault(t_pad, []).append(i)
    groups = [(t_pad, all_idxs[s:s + max_group])
              for t_pad, all_idxs in buckets.items()
              for s in range(0, len(all_idxs), max_group)]
    for t_pad, idxs in groups:
        g = 1
        while g < len(idxs):
            g *= 2
        padded = [_pad_frames(mels[i], t_pad, cfg.mel_eps) for i in idxs]
        padded += [padded[-1]] * (g - len(idxs))
        stacked = np.stack(padded)                     # (G, t_pad, n_mels)
        if vocoder is not None:
            audio = np.asarray(vocoder(stacked.transpose(0, 2, 1)))
        else:
            linear = mel_to_linear(
                jnp.exp(jnp.asarray(stacked.transpose(0, 2, 1))),
                sr=cfg.sampling_rate, n_fft=cfg.n_fft, n_mels=cfg.n_mels,
                fmin=cfg.fmin, fmax=cfg.fmax)
            audio = np.asarray(griffin_lim(
                linear, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                win_length=cfg.win_length, n_iter=griffinlim_iters,
                length=t_pad * cfg.hop_length))
        for j, i in enumerate(idxs):
            out[i] = audio[j, : int(mels[i].shape[0]) * cfg.hop_length]
    return out


def _try_load(loader_name: str, checkpoint_path: Optional[str]):
    """Run a ``models.hifigan`` loader, returning None (with a message) on
    ANY failure — missing checkpoint, missing torch, wrong layout — so
    callers fall back to Griffin-Lim instead of crashing."""
    try:
        from ..models import hifigan
        return getattr(hifigan, loader_name)(checkpoint_path)
    except Exception as e:
        print(f"HiFi-GAN unavailable ({type(e).__name__}: {e}); "
              f"falling back to Griffin-Lim.")
        return None


def try_load_hifigan(checkpoint_path: Optional[str] = None):
    """HiFi-GAN vocoder callable, or None on any failure (see _try_load)."""
    return _try_load("load_hifigan_vocoder", checkpoint_path)


def try_load_hifigan_params(checkpoint_path: Optional[str] = None):
    """Raw HiFi-GAN params pytree (for the fused single-dispatch synthesis
    program), or None on any failure (see _try_load)."""
    return _try_load("load_hifigan_params", checkpoint_path)
