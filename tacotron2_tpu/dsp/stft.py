"""Jitted STFT / iSTFT with librosa-compatible conventions.

Replaces the reference's librosa CPU DSP (reference: src/audio.py:34-45,
src/mel_griffinlim.py:41-49) with XLA ops: framing is a reshape (no gather
— when ``hop_length`` divides ``n_fft``, frames are a concatenation of
shifted hop-sized blocks, which XLA compiles to pure data movement), the
window is a precomputed periodic Hann, and the transform is a batched rFFT.

Conventions matched to ``librosa.stft`` defaults:
  * ``center=True``: reflect-pad the signal by ``n_fft // 2`` on both sides
  * periodic Hann window of ``win_length``, zero-padded (centered) to ``n_fft``
  * frame count ``1 + len(y) // hop_length``
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (``scipy.signal.get_window('hann', N, fftbins=True)``)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def padded_window(win_length: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """Hann window zero-padded (centered) to ``n_fft``, librosa style."""
    if win_length > n_fft:
        raise ValueError("win_length must be <= n_fft")
    win = hann_window(win_length, dtype)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=dtype)
    out[lpad:lpad + win_length] = win
    return out


def n_frames(n_samples: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform."""
    return 1 + n_samples // hop_length


def reflect_pad_last(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the last axis by ``pad`` on both sides.

    Equivalent to ``jnp.pad(y, pad, mode='reflect')`` but built from
    slice+flip+concat, which XLA compiles an order of magnitude faster than
    the generic pad lowering.
    """
    left = jnp.flip(y[..., 1:pad + 1], axis=-1)
    right = jnp.flip(y[..., -pad - 1:-1], axis=-1)
    return jnp.concatenate([left, y, right], axis=-1)


def _frame_by_blocks(y: jnp.ndarray, n_fft: int, hop: int,
                     t: int) -> jnp.ndarray:
    """Frame via hop-block reshape (requires hop | n_fft). No gathers.

    frame[j] = y[j*hop : j*hop + n_fft] built as a concat of ``r = n_fft/hop``
    shifted views of the hop-blocked signal.
    """
    r = n_fft // hop
    n_blocks = t + r - 1
    total = n_blocks * hop
    deficit = total - y.shape[-1]
    if deficit > 0:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, deficit)])
    elif deficit < 0:
        y = y[..., :total]
    blocks = y.reshape(y.shape[:-1] + (n_blocks, hop))
    return jnp.concatenate([blocks[..., i:i + t, :] for i in range(r)],
                           axis=-1)


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice a signal into overlapping frames.

    Args:
        y: (..., S) signal.
        center: if True, reflect-pad by ``n_fft // 2`` first (librosa
            ``center=True``); frame count is ``1 + S // hop``.  If False, the
            caller already padded; frame count is ``1 + (S - n_fft) // hop``.
    Returns:
        (..., T, n_fft) frames.
    """
    num_samples = y.shape[-1]
    if center:
        y = reflect_pad_last(y, n_fft // 2)
        t = n_frames(num_samples, hop_length)
    else:
        t = 1 + (num_samples - n_fft) // hop_length
    if n_fft % hop_length == 0:
        return _frame_by_blocks(y, n_fft, hop_length, t)
    idx = (np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :])
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "center"))
def stft_magnitude_squared(y: jnp.ndarray, *, n_fft: int, hop_length: int,
                           win_length: int, center: bool = True) -> jnp.ndarray:
    """|STFT|^2 power spectrogram.

    Args:
        y: (..., S) float signal.
    Returns:
        (..., n_fft//2 + 1, T) float32 power spectrogram (librosa layout:
        frequency first, time last).
    """
    window = jnp.asarray(padded_window(win_length, n_fft))
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length,
                          center=center) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., T, F)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.swapaxes(power, -1, -2)


def stft(y: jnp.ndarray, *, n_fft: int, hop_length: int,
         win_length: int) -> jnp.ndarray:
    """Complex STFT, (..., F, T) layout.

    NOTE: complex arrays are device-internal only in this framework — the
    TPU runtime here cannot transfer complex64 to host.  Use
    :func:`stft_magnitude` (or square root of :func:`stft_magnitude_squared`)
    for host-visible spectra.
    """
    window = jnp.asarray(padded_window(win_length, n_fft))
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length"))
def stft_magnitude(y: jnp.ndarray, *, n_fft: int, hop_length: int,
                   win_length: int) -> jnp.ndarray:
    """|STFT| magnitude spectrogram, (..., F, T) float32 (host-safe)."""
    return jnp.sqrt(stft_magnitude_squared(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length))


def _overlap_add_blocks(frames: jnp.ndarray, n_fft: int,
                        hop: int) -> jnp.ndarray:
    """Overlap-add via hop-block accumulation (requires hop | n_fft).

    frames: (..., T, n_fft) -> (..., (T + r - 1) * hop) signal, where
    ``r = n_fft / hop``.  Uses ``r`` static slice-adds instead of a scatter.
    """
    r = n_fft // hop
    t = frames.shape[-2]
    parts = frames.reshape(frames.shape[:-2] + (t, r, hop))
    acc = jnp.zeros(frames.shape[:-2] + (t + r - 1, hop), dtype=frames.dtype)
    for i in range(r):
        acc = acc.at[..., i:i + t, :].add(parts[..., :, i, :])
    return acc.reshape(frames.shape[:-2] + ((t + r - 1) * hop,))


def _window_sumsquare(window: np.ndarray, t: int, n_fft: int,
                      hop: int) -> np.ndarray:
    """Host-side window-sum-square envelope for iSTFT normalization."""
    r = n_fft // hop
    total = (t + r - 1) * hop
    wss = np.zeros(total, dtype=np.float32)
    w2 = (window.astype(np.float64) ** 2)
    for j in range(t):
        wss[j * hop:j * hop + n_fft] += w2
    return wss.astype(np.float32)


def istft(spec: jnp.ndarray, *, n_fft: int, hop_length: int, win_length: int,
          length: int | None = None) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add and window-sum normalization.

    Args:
        spec: (..., F, T) complex STFT.
        length: output length; defaults to ``(T - 1) * hop_length`` (the
            centered-transform inverse, padding trimmed).
    Returns:
        (..., length) float32 signal.
    """
    if n_fft % hop_length != 0:
        raise NotImplementedError("istft requires hop_length | n_fft")
    window_np = padded_window(win_length, n_fft)
    window = jnp.asarray(window_np)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # synthesis window

    t = spec.shape[-1]
    sig = _overlap_add_blocks(frames, n_fft, hop_length)
    wss = jnp.asarray(_window_sumsquare(window_np, t, n_fft, hop_length))
    sig = sig / jnp.maximum(wss, 1e-10)

    pad = n_fft // 2
    if length is None:
        length = hop_length * (t - 1)
    return jax.lax.dynamic_slice_in_dim(sig, pad, length, axis=-1)
