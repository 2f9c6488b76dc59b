"""Mel inversion + Griffin-Lim phase reconstruction as XLA loops.

TPU-native replacement for ``librosa.feature.inverse.mel_to_audio`` as used
by the reference fallback vocoder (reference: src/mel_griffinlim.py:7-50):

  * mel -> linear spectrogram: non-negative least squares solved by
    projected gradient descent (librosa uses scipy NNLS; same objective,
    jittable, deterministic),
  * Griffin-Lim: ``lax.fori_loop`` of iSTFT/STFT rounds with librosa's
    momentum-accelerated update (momentum 0.99, random phase init).

The host entry point :func:`mel_to_audio` reproduces the reference's
orientation auto-fix and log-vs-linear auto-detect heuristics
(reference: src/mel_griffinlim.py:24-40).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from .mel import mel_filterbank
from .stft import istft, stft

_MOMENTUM = 0.99  # librosa.griffinlim default


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "n_mels", "fmin",
                                             "fmax", "n_iters"))
def mel_to_linear(mel_power: jnp.ndarray, *, sr: int, n_fft: int,
                  n_mels: int, fmin: float, fmax: float,
                  n_iters: int = 100) -> jnp.ndarray:
    """Invert the mel filterbank: solve ``argmin_{S>=0} ||B S - mel||^2``.

    Args:
        mel_power: (..., n_mels, T) non-negative mel spectrogram.
    Returns:
        (..., 1 + n_fft//2, T) non-negative linear spectrogram.
    """
    basis_np = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (M, F)
    basis = jnp.asarray(basis_np)
    pinv = jnp.asarray(np.linalg.pinv(basis_np))              # (F, M)
    # Lipschitz constant of the gradient: sigma_max(B)^2 (host-computed).
    lip = float(np.linalg.norm(basis_np, 2) ** 2)

    s0 = jnp.clip(jnp.einsum("fm,...mt->...ft", pinv, mel_power), 0.0, None)

    def pgd_step(_, s):
        resid = jnp.einsum("mf,...ft->...mt", basis, s) - mel_power
        grad = jnp.einsum("mf,...mt->...ft", basis, resid)
        return jnp.clip(s - grad / lip, 0.0, None)

    return jax.lax.fori_loop(0, n_iters, pgd_step, s0)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "n_iter", "length"))
def griffin_lim(magnitude: jnp.ndarray, *, n_fft: int, hop_length: int,
                win_length: int, n_iter: int = 60,
                length: Optional[int] = None,
                seed: int = 0) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction (librosa algorithm, momentum 0.99).

    Args:
        magnitude: (..., F, T) non-negative linear magnitude spectrogram.
    Returns:
        (..., length) float32 waveform; default length ``hop * (T - 1)``.
    """
    t = magnitude.shape[-1]
    key = jax.random.PRNGKey(seed)
    phase_angle = jax.random.uniform(key, magnitude.shape, minval=0.0,
                                     maxval=2.0 * np.pi)
    angles = jnp.exp(1j * phase_angle.astype(jnp.float32)).astype(jnp.complex64)
    rebuilt0 = jnp.zeros_like(angles)

    mom = _MOMENTUM / (1.0 + _MOMENTUM)

    def gl_step(_, carry):
        angles, rebuilt_prev = carry
        inverse = istft(magnitude * angles, n_fft=n_fft,
                        hop_length=hop_length, win_length=win_length)
        rebuilt = stft(inverse, n_fft=n_fft, hop_length=hop_length,
                       win_length=win_length)
        # Momentum-accelerated phase update (librosa.griffinlim)
        upd = rebuilt - mom * rebuilt_prev
        angles = upd / (jnp.abs(upd) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, gl_step, (angles, rebuilt0))
    out_len = length if length is not None else hop_length * (t - 1)
    return istft(magnitude * angles, n_fft=n_fft, hop_length=hop_length,
                 win_length=win_length, length=out_len)


def mel_to_audio(mel, n_iter: int = 60,
                 cfg: Optional[AudioConfig] = None) -> np.ndarray:
    """Waveform from a (n_mels, T) mel — log-power or linear, auto-detected.

    Reproduces the reference fallback vocoder's heuristics
    (reference: src/mel_griffinlim.py:7-50):
      * transposed-input auto-fix,
      * treat as log-mel (exponentiate) if ``min < -0.5`` or dynamic
        range ``> 5.0``, else clip at 0,
      * invert with ``power=1.0`` semantics (mel values treated as
        magnitude, not power).
    """
    cfg = cfg or AudioConfig()
    mel_np = np.asarray(mel, dtype=np.float32)
    if mel_np.ndim != 2:
        raise ValueError(f"expected 2-D mel, got shape {mel_np.shape}")
    if mel_np.shape[0] != cfg.n_mels and mel_np.shape[1] == cfg.n_mels:
        mel_np = mel_np.T

    mn, mx = float(mel_np.min()), float(mel_np.max())
    if (mn < -0.5) or (mx - mn > 5.0):
        mel_lin = np.exp(mel_np)      # log-power -> power
    else:
        mel_lin = np.maximum(mel_np, 0.0)

    linear = mel_to_linear(
        jnp.asarray(mel_lin), sr=cfg.sampling_rate, n_fft=cfg.n_fft,
        n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax)
    wav = griffin_lim(linear, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                      win_length=cfg.win_length, n_iter=n_iter)
    return np.asarray(wav)
