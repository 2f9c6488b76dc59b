"""Functional neural-net layer library (init/apply pairs over pytrees).

The compute vocabulary of the Tacotron 2 model — linear, conv1d, batch
norm, embedding, LSTM cell/scan, dropout — as pure functions over explicit
parameter pytrees.  This replaces the reference's torch.nn modules
(reference: src/model.py) with a design jit/grad/shard-friendly by
construction: parameters are data, layers are functions, recurrence is
``lax.scan``.

Initialization distributions intentionally mirror torch defaults so that
training dynamics match the reference:
  * Linear / Conv1d: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias
  * LSTM: U(-1/sqrt(hidden), 1/sqrt(hidden)) for all weights/biases
  * Embedding: N(0, 1)
  * BatchNorm: scale 1, bias 0, running mean 0 / var 1

Weight layouts are chosen for MXU matmuls ((in, out) for linear, (in, 4H)
for LSTM input kernels); converters from torch checkpoints transpose.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


# --------------------------------------------------------------------------
# Linear
# --------------------------------------------------------------------------
def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # bf16 serving: match the input dtype to the weights so the MXU
    # consumes bf16 directly (no upcasted weight copy); accumulate fp32.
    if x.dtype != p["w"].dtype:
        x = x.astype(p["w"].dtype)
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


# --------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------
def embedding_init(key, n_embeddings: int, dim: int,
                   dtype=jnp.float32) -> Params:
    return {"table": jax.random.normal(key, (n_embeddings, dim), dtype)}


def embedding_apply(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["table"], ids, axis=0)


# --------------------------------------------------------------------------
# Conv1d (torch layout: weight (out_ch, in_ch, k); data (B, C, T))
# --------------------------------------------------------------------------
def conv1d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                bias: bool = True, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / ((in_ch * kernel_size) ** 0.5)
    p = {"w": jax.random.uniform(kw, (out_ch, in_ch, kernel_size), dtype,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def conv1d_apply(p: Params, x: jnp.ndarray, padding: str | int = "same"
                 ) -> jnp.ndarray:
    """x: (B, C_in, T) -> (B, C_out, T')  ('same' keeps T for odd kernels)."""
    k = p["w"].shape[-1]
    if padding == "same":
        pad = [( (k - 1) // 2, k // 2 )]
    else:
        pad = [(padding, padding)]
    if x.dtype != p["w"].dtype:  # bf16 policies cast activations down
        x = x.astype(p["w"].dtype)
    if p["w"].dtype == jnp.float32:
        y = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding=pad,
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
    else:
        # Low-precision weights: run the conv natively in that dtype (the
        # TPU convolution still accumulates fp32 on the MXU internally) and
        # upcast the result.  Mixing dtypes via preferred_element_type is
        # not transposable — grad-of-conv would see (bf16 lhs, fp32 rhs),
        # which lax.conv_general_dilated rejects.
        y = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding=pad,
            dimension_numbers=("NCH", "OIH", "NCH")).astype(jnp.float32)
    if "b" in p:
        y = y + p["b"][None, :, None].astype(jnp.float32)
    return y


# --------------------------------------------------------------------------
# BatchNorm1d over (B, C, T): params (scale, bias) + running state
# --------------------------------------------------------------------------
def batchnorm_init(ch: int, dtype=jnp.float32) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}
    return params, state


def batchnorm_apply(p: Params, state: Params, x: jnp.ndarray, train: bool,
                    momentum: float = 0.1, eps: float = 1e-5
                    ) -> Tuple[jnp.ndarray, Params]:
    """x: (B, C, T).  Returns (y, new_state).

    Train mode normalizes with batch statistics (computed over batch+time;
    under a sharded data axis GSPMD makes these global automatically) and
    updates running stats with torch semantics (biased var to normalize,
    unbiased var in the running estimate).
    """
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.mean((x - mean[None, :, None]) ** 2, axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None]) * (inv * p["scale"])[None, :, None] \
        + p["bias"][None, :, None]
    return y, new_state


# --------------------------------------------------------------------------
# LSTM cell (torch gate order i, f, g, o) and scan
# --------------------------------------------------------------------------
def lstm_cell_init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / (hidden ** 0.5)
    return {
        "wi": jax.random.uniform(k1, (in_dim, 4 * hidden), dtype, -bound, bound),
        "wh": jax.random.uniform(k2, (hidden, 4 * hidden), dtype, -bound, bound),
        "bi": jax.random.uniform(k3, (4 * hidden,), dtype, -bound, bound),
        "bh": jax.random.uniform(k4, (4 * hidden,), dtype, -bound, bound),
    }


def lstm_gates(p: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Pre-activation LSTM gates (B, 4H), fp32 (torch order i, f, g, o).

    Split out of :func:`lstm_cell_apply` so the split-BPTT decoder backward
    (ops/decoder_bptt.py) can recompute gates bit-identically to the
    forward pass from the same (possibly bf16-cast) inputs.
    """
    wd = p["wi"].dtype
    return (jnp.dot(x.astype(wd), p["wi"],
                    preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(wd), p["wh"],
                      preferred_element_type=jnp.float32)
            + p["bi"] + p["bh"])


def lstm_activations(gates: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray]:
    """(i, f, g, o) gate activations from pre-activation gates (B, 4H)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    return jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g), \
        jax.nn.sigmoid(o)


def lstm_cell_apply(p: Params, x: jnp.ndarray, h: jnp.ndarray,
                    c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step.  x: (B, in), h/c: (B, H) -> (h', c').

    The cell state ``c`` always stays in the caller's dtype (fp32 in this
    framework) — only the matmul inputs are cast down for bf16 serving.
    """
    i, f, g, o = lstm_activations(lstm_gates(p, x, h))
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(p: Params, xs: jnp.ndarray, reverse: bool = False
              ) -> jnp.ndarray:
    """Run an LSTM over time with ``lax.scan``.

    xs: (B, T, in) -> outputs (B, T, H).  Zero initial state.  The full
    padded length is processed in both directions — deliberately matching
    the reference, which feeds padded batches to ``nn.LSTM`` without
    packing (reference: src/model.py:75).
    """
    b = xs.shape[0]
    hidden = p["wh"].shape[0]
    h0 = jnp.zeros((b, hidden), xs.dtype)
    c0 = jnp.zeros((b, hidden), xs.dtype)

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_cell_apply(p, x_t, h, c)
        return (h, c), h

    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, in)
    _, ys = jax.lax.scan(step, (h0, c0), xs_t, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def bilstm_init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_cell_init(kf, in_dim, hidden, dtype),
            "bwd": lstm_cell_init(kb, in_dim, hidden, dtype)}


def bilstm_apply(p: Params, xs: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional LSTM: concat of forward and reverse scans, (B, T, 2H)."""
    fwd = lstm_scan(p["fwd"], xs, reverse=False)
    bwd = lstm_scan(p["bwd"], xs, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


# --------------------------------------------------------------------------
# Dropout
# --------------------------------------------------------------------------
def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
