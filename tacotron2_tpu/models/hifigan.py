"""HiFi-GAN generator (v1) in JAX — the neural vocoder.

The reference loads NVIDIA's PyTorch HiFi-GAN from torch.hub plus an NGC
LJSpeech-22kHz finetuned generator checkpoint (reference: inference.py:40-54,
gt_vocoder_check.py:80-98).  This is a from-scratch JAX implementation of
that generator architecture (arXiv:2010.05646, config v1):

  * conv_pre 80 -> 512 (k=7),
  * 4 transposed-conv upsampling stages (rates 8,8,2,2 / kernels 16,16,4,4),
    halving channels each stage,
  * after each stage a multi-receptive-field fusion (MRF) of 3 residual
    blocks (kernels 3,7,11; dilations (1,3,5) with interleaved unit-dilation
    convs), averaged,
  * conv_post -> 1 channel, tanh; LeakyReLU(0.1) activations.

Transposed convs are expressed as ``lhs_dilation`` convolutions so XLA maps
them onto the MXU.  A converter ingests the NGC checkpoint's ``generator``
state dict (weight-normed or not); with zero network egress in this
environment the checkpoint must be supplied locally (``HIFIGAN_CHECKPOINT``
env var or ``./hifigan_checkpoint.pt``).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1

# HiFi-GAN v1 (the config used by NVIDIA's LJSpeech 22 kHz models)
UPSAMPLE_RATES = (8, 8, 2, 2)
UPSAMPLE_KERNELS = (16, 16, 4, 4)
UPSAMPLE_INITIAL_CHANNEL = 512
RESBLOCK_KERNELS = (3, 7, 11)
RESBLOCK_DILATIONS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _conv_init(key, in_ch, out_ch, k):
    bound = 1.0 / ((in_ch * k) ** 0.5)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (out_ch, in_ch, k), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (out_ch,), jnp.float32,
                                    -bound, bound)}


def _convt_init(key, in_ch, out_ch, k):
    bound = 1.0 / ((in_ch * k) ** 0.5)
    kw, kb = jax.random.split(key)
    # stored already rotated for lhs-dilated conv: (out, in, k)
    return {"w": jax.random.uniform(kw, (out_ch, in_ch, k), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (out_ch,), jnp.float32,
                                    -bound, bound)}


def _conv(p, x, dilation: int = 1):
    """'same'-padded dilated conv over (B, C, T).

    Runs in the weight dtype: fp32 weights keep fp32 accumulation via
    preferred_element_type; bf16 weights (serving cast — halves the
    generator's activation footprint, the batch-scaling limit) run the
    whole stack natively in bf16 (TPU convs still accumulate fp32 on the
    MXU internally).
    """
    k = p["w"].shape[-1]
    pad = (k - 1) * dilation // 2
    if x.dtype != p["w"].dtype:
        x = x.astype(p["w"].dtype)
    kwargs = ({"preferred_element_type": jnp.float32}
              if p["w"].dtype == jnp.float32 else {})
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
        **kwargs)
    return y + p["b"][None, :, None]


def _conv_transpose(p, x, stride: int, torch_padding: int):
    """torch ConvTranspose1d semantics via lhs-dilated convolution.

    Output length = (T - 1) * stride + k - 2 * torch_padding.
    Dtype handling as in :func:`_conv`.
    """
    k = p["w"].shape[-1]
    pad = k - 1 - torch_padding
    if x.dtype != p["w"].dtype:
        x = x.astype(p["w"].dtype)
    kwargs = ({"preferred_element_type": jnp.float32}
              if p["w"].dtype == jnp.float32 else {})
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
        **kwargs)
    return y + p["b"][None, :, None]


def hifigan_init(key) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    params: Dict[str, Any] = {
        "conv_pre": _conv_init(next(keys), 80, UPSAMPLE_INITIAL_CHANNEL, 7),
        "ups": [], "resblocks": [],
    }
    ch = UPSAMPLE_INITIAL_CHANNEL
    for u, k in zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS):
        params["ups"].append(_convt_init(next(keys), ch, ch // 2, k))
        ch //= 2
        for rk, dils in zip(RESBLOCK_KERNELS, RESBLOCK_DILATIONS):
            block = {"convs1": [], "convs2": []}
            for d in dils:
                block["convs1"].append(_conv_init(next(keys), ch, ch, rk))
                block["convs2"].append(_conv_init(next(keys), ch, ch, rk))
            params["resblocks"].append(block)
    params["conv_post"] = _conv_init(next(keys), ch, 1, 7)
    return params


def _resblock(block, x, kernel: int, dilations: Sequence[int]):
    for d, c1, c2 in zip(dilations, block["convs1"], block["convs2"]):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = _conv(c1, xt, dilation=d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = _conv(c2, xt, dilation=1)
        x = x + xt
    return x


def hifigan_apply(params: Dict[str, Any], mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, 80, T) -> waveform (B, T * 256), float32 in [-1, 1]."""
    x = _conv(params["conv_pre"], mel)
    n_res = len(RESBLOCK_KERNELS)
    for i, (u, k) in enumerate(zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _conv_transpose(params["ups"][i], x, stride=u,
                            torch_padding=(k - u) // 2)
        acc = None
        for j, (rk, dils) in enumerate(zip(RESBLOCK_KERNELS,
                                           RESBLOCK_DILATIONS)):
            y = _resblock(params["resblocks"][i * n_res + j], x, rk, dils)
            acc = y if acc is None else acc + y
        x = acc / n_res
    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
    x = _conv(params["conv_post"], x)
    # fp32 waveform regardless of the compute dtype (bf16 serving cast)
    return jnp.tanh(x).astype(jnp.float32)[:, 0, :]


# Total upsampling factor: one mel frame -> this many output samples.
TOTAL_UPSAMPLE = int(np.prod(UPSAMPLE_RATES))

# Receptive radius of the generator in INPUT mel frames (analytic bound:
# conv_pre 3 + up1 ~1 + stage-1 MRF 60/8 + later stages <2 combined
# ~= 13.3; 16 gives margin and keeps windows lane-aligned).  The chunked
# apply is exact when overlap >= this — pinned by a parity test.
RECEPTIVE_FRAMES = 16


def hifigan_apply_chunked(params: Dict[str, Any], mel: jnp.ndarray,
                          chunk: int = 256,
                          overlap: int = RECEPTIVE_FRAMES) -> jnp.ndarray:
    """Memory-bounded generator: identical output to :func:`hifigan_apply`.

    The full generator materializes (B, 32, T*128) fp32-scale activations
    in its last upsample stage — the HBM wall that caps fused serving at
    batch 128 (BASELINE.md).  This variant scans the mel in fixed
    ``chunk``-frame windows extended by ``overlap`` frames of real
    context on each side (>= the stack's receptive radius), vocodes each
    window, and keeps only the center: peak activation memory scales
    with ``chunk + 2*overlap`` instead of T.  Window starts clamp to the
    signal, so boundary chunks see the true utterance edge (the same
    zero conv padding the unchunked call sees) — the output is exact,
    not an approximation, at ~2*overlap/chunk redundant compute.
    """
    if chunk < 1 or overlap < RECEPTIVE_FRAMES:
        raise ValueError(
            f"chunk must be >= 1 and overlap >= {RECEPTIVE_FRAMES} "
            f"(the generator's receptive radius); got chunk={chunk}, "
            f"overlap={overlap}")
    b, c, t = mel.shape
    if t <= chunk + 2 * overlap:
        return hifigan_apply(params, mel)
    w = chunk + 2 * overlap
    n = -(-t // chunk)
    up = TOTAL_UPSAMPLE

    def body(out, i):
        s = jnp.minimum(i * chunk, t - chunk)   # last chunk re-covers tail
        ws = jnp.clip(s - overlap, 0, t - w)
        win = jax.lax.dynamic_slice(mel, (0, 0, ws), (b, c, w))
        wav_w = hifigan_apply(params, win)      # (B, w*up)
        piece = jax.lax.dynamic_slice(
            wav_w, (0, (s - ws) * up), (b, chunk * up))
        return jax.lax.dynamic_update_slice(out, piece, (0, s * up)), None

    out = jnp.zeros((b, t * up), jnp.float32)
    out, _ = jax.lax.scan(body, out, jnp.arange(n))
    return out


# ---------------------------------------------------------------------------
# NVIDIA checkpoint conversion
# ---------------------------------------------------------------------------
def _denorm(sd: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """Resolve a (possibly weight-normed) conv weight."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"], np.float32)
    g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
    v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)


def params_from_nvidia_state_dict(sd: Mapping[str, np.ndarray]
                                  ) -> Dict[str, Any]:
    """NVIDIA HiFi-GAN ``generator`` state dict -> our params pytree."""
    def conv(prefix):
        return {"w": _denorm(sd, prefix),
                "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}

    def convt(prefix):
        w = _denorm(sd, prefix)           # torch layout (in, out, k)
        w = np.flip(w.transpose(1, 0, 2), axis=-1).copy()
        return {"w": w, "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}

    params: Dict[str, Any] = {"conv_pre": conv("conv_pre"), "ups": [],
                              "resblocks": []}
    for i in range(len(UPSAMPLE_RATES)):
        params["ups"].append(convt(f"ups.{i}"))
    n_blocks = len(UPSAMPLE_RATES) * len(RESBLOCK_KERNELS)
    for i in range(n_blocks):
        block = {"convs1": [], "convs2": []}
        for j in range(len(RESBLOCK_DILATIONS[0])):
            block["convs1"].append(conv(f"resblocks.{i}.convs1.{j}"))
            block["convs2"].append(conv(f"resblocks.{i}.convs2.{j}"))
        params["resblocks"].append(block)
    params["conv_post"] = conv("conv_post")
    return params


@functools.partial(jax.jit)
def _jitted_apply(params, mel):
    return hifigan_apply(params, mel)


@functools.partial(jax.jit, static_argnames=("chunk", "overlap"))
def _jitted_apply_chunked(params, mel, chunk: int,
                          overlap: int = RECEPTIVE_FRAMES):
    return hifigan_apply_chunked(params, mel, chunk=chunk, overlap=overlap)


def load_hifigan_params(checkpoint_path: Optional[str] = None
                        ) -> Dict[str, Any]:
    """Load the NGC generator checkpoint as a JAX params pytree.

    Checkpoint resolution: explicit arg > $HIFIGAN_CHECKPOINT >
    ./hifigan_checkpoint.pt (the reference's cache filename,
    inference.py:48).  This environment has no network egress, so unlike
    the reference (which downloads from NGC) the file must exist locally.
    """
    path = (checkpoint_path or os.environ.get("HIFIGAN_CHECKPOINT")
            or "hifigan_checkpoint.pt")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"HiFi-GAN checkpoint not found at {path!r}; set "
            "HIFIGAN_CHECKPOINT or pass --vocoder griffinlim")
    import torch  # local file load only
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("generator", ckpt)
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params = params_from_nvidia_state_dict(sd_np)
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_hifigan_vocoder(checkpoint_path: Optional[str] = None,
                         bf16: bool = False,
                         chunk_frames: Optional[int] = None):
    """Load the NGC generator checkpoint and return a jitted vocoder callable
    ``mel (B, 80, T) -> wav (B, T*256)``.

    ``bf16`` casts the generator weights: halves the activation footprint
    (the batch-scaling limit — fp32 exceeds HBM past batch ~32) and the
    conv stack runs natively bf16 on the MXU; output stays fp32 audio.

    ``chunk_frames`` bounds peak activation memory via the exact chunked
    evaluation (:func:`hifigan_apply_chunked`) — for large-batch/long-mel
    configurations past the unchunked HBM wall.
    """
    if chunk_frames is not None and chunk_frames < 1:
        raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
    params = load_hifigan_params(checkpoint_path)
    if bf16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    if chunk_frames:
        apply = functools.partial(_jitted_apply_chunked, chunk=chunk_frames)
    else:
        apply = _jitted_apply

    def vocode(mel) -> np.ndarray:
        return np.asarray(apply(params, jnp.asarray(mel)))
    return vocode
