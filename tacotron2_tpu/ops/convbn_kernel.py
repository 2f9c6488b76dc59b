"""Pallas TPU kernel: fused Conv1d + BatchNorm(eval) + activation.

The encoder and postnet conv stacks (reference: src/model.py:8-77 conv+BN+
ReLU x3, src/model.py:336-407 conv+BN+tanh x5) are chains of

    y = act( BN( conv1d(x, W) + b ) )

over (B, C, T) activations.  In eval mode BatchNorm is a per-channel
affine, so the whole layer folds to ``act(conv1d(x, W') + h)`` with

    g  = bn_scale / sqrt(running_var + eps)
    W' = W * g        (per output channel)
    h  = bn_bias + (b - running_mean) * g

This kernel runs that folded layer as ONE Pallas program per batch item:
the (T + K - 1, C_in) input row and the (K, C_in, C_out) folded weights
sit in VMEM, the conv is K accumulated MXU matmuls (one per tap, each
(T, C_in) @ (C_in, C_out)), and the bias + activation epilogue happens
in-register before the single (T, C_out) write back to HBM — one read of
x, one write of y, nothing materialized in between.

Serving-path only (eval-mode BN): training keeps the XLA conv +
batch-stats BatchNorm (`models/layers.py`), whose backward pass XLA
already fuses well.  A pure-jnp reference (`conv_bn_act_reference`)
defines the semantics; parity is tested against the unfused layer chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_conv_bn(conv_p, bn_p, bn_s, eps: float):
    """Fold eval-mode BN into conv weights.

    conv_p: {"w": (C_out, C_in, K), "b": (C_out,)?}; bn_p: {"scale",
    "bias"}; bn_s: {"mean", "var"}.  Returns (wmat (K, C_in, C_out),
    h (C_out,)) ready for the kernel's per-tap matmuls.
    """
    g = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + eps)       # (C_out,)
    w = conv_p["w"] * g[:, None, None]                         # (C_out,C_in,K)
    b = conv_p.get("b")
    h = bn_p["bias"] - bn_s["mean"] * g
    if b is not None:
        h = h + b * g
    wmat = jnp.transpose(w, (2, 1, 0))                         # (K,C_in,C_out)
    return wmat, h


def conv_bn_act_reference(x, conv_p, bn_p, bn_s, eps: float, act: str):
    """Pure-jnp semantics via the unfused layer chain (eval mode)."""
    from ..models.layers import batchnorm_apply, conv1d_apply
    y = conv1d_apply(conv_p, x, padding="same")
    y, _ = batchnorm_apply(bn_p, bn_s, y, train=False, eps=eps)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "tanh":
        y = jnp.tanh(y)
    return y


def _kernel(x_ref, w_ref, h_ref, out_ref, *, k: int, t: int, act: str):
    # x_ref: (1, T + K - 1, C_in) padded input row; w_ref: (K, C_in,
    # C_out); h_ref: (1, C_out); out_ref: (1, T, C_out).
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for tap in range(k):
        acc = acc + jax.lax.dot_general(
            x_ref[0, pl.ds(tap, t), :], w_ref[tap],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + h_ref[0].astype(jnp.float32)
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "tanh":
        acc = jnp.tanh(acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("eps", "act"))
def conv_bn_act_pallas(x, conv_p, bn_p, bn_s, eps: float, act: str):
    """Fused eval-mode conv+BN+act.  x: (B, C_in, T) -> (B, C_out, T).

    Odd kernel sizes only ('same' padding), matching the encoder (k=5)
    and postnet (k=5) stacks.
    """
    b, c_in, t = x.shape
    c_out, _, k = conv_p["w"].shape
    assert k % 2 == 1, "fused conv+BN kernel supports odd kernel sizes"
    wmat, h = fold_conv_bn(conv_p, bn_p, bn_s, eps)
    # Mirror conv1d_apply's dtype policy: the matmuls run in the WEIGHT
    # dtype (activations cast down under a bf16 serving cast; the fold's
    # fp32 scale promotion cast back), accumulate/emit fp32.
    wdtype = conv_p["w"].dtype
    # Lay the time axis on matmul rows: (B, T + K - 1, C_in), zero-padded
    # halo so every tap's (T, C_in) slice is in-bounds.
    xt = jnp.swapaxes(x, 1, 2).astype(wdtype)                  # (B, T, C_in)
    xt = jnp.pad(xt, [(0, 0), ((k - 1) // 2, k // 2), (0, 0)])
    wmat = wmat.astype(wdtype)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, t=t, act=act),
        grid=(b,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, t + k - 1, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c_out), jnp.float32),
    )(xt, wmat, h.reshape(1, c_out).astype(jnp.float32))
    return jnp.swapaxes(out, 1, 2)                             # (B, C_out, T)


def fused_convbn_enabled() -> bool:
    """Use the fused conv+BN+act kernel on the eval path?

    Controlled by TACOTRON2_FUSED_CONVBN: "1"/"0" to force, unset = off.
    Measured on v5e (100 layer applications amortized inside one jitted
    loop): postnet-mid 512ch/T=1000 B=16 — XLA 485 us/layer vs Pallas
    490 us; encoder 512ch/T=128 B=16 — 285 vs 285 us; B=64 postnet —
    1563 vs 1568 us.  XLA's implicit-GEMM conv with fused BN/act
    consumers is already at this kernel's speed, so the default stays
    the XLA path; the kernel is the SURVEY §2.2 fusion kept available
    (and parity-tested) for shapes where Mosaic wins.
    """
    import os
    flag = os.environ.get("TACOTRON2_FUSED_CONVBN")
    return flag is not None and flag not in ("0", "false", "no")
