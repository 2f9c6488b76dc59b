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

import functools
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


def _mxu_convgrad_enabled() -> bool:
    """Kill-switch for the custom conv backward (default on)."""
    import os
    return os.environ.get("TACOTRON2_MXU_CONVGRAD", "1") != "0"


def _conv1d_raw(x: jnp.ndarray, w: jnp.ndarray,
                pads: Tuple[int, int]) -> jnp.ndarray:
    """(B, C_in, T), (C_out, C_in, K) -> (B, C_out, T') fp32, no bias."""
    if w.dtype == jnp.float32:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[pads],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
    # Low-precision weights: run the conv natively in that dtype (the
    # TPU convolution still accumulates fp32 on the MXU internally) and
    # upcast the result.  Mixing dtypes via preferred_element_type is
    # not transposable — grad-of-conv would see (bf16 lhs, fp32 rhs),
    # which lax.conv_general_dilated rejects.
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[pads],
        dimension_numbers=("NCH", "OIH", "NCH")).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv1d_mxu(x, w, pads):
    """Conv1d whose backward is hand-written for the TPU MXU.

    XLA's transpose of ``conv_general_dilated`` lowers the weight
    gradient on TPU as a multiply+reduce VPU fusion — measured ~2.4 ms
    per 512x512xk5 postnet layer at B=128/T=512 against a ~0.9 ms MXU
    roofline (xplane, BASELINE.md r4).  Here d_w is K time-shifted
    ``(B*T, C_out) x (B*T, C_in)`` contractions (pure MXU work) and d_x
    is the standard tap-reversed, channel-transposed convolution.
    """
    return _conv1d_raw(x, w, pads)


def _conv1d_mxu_fwd(x, w, pads):
    return _conv1d_raw(x, w, pads), (x, w)


def _conv1d_mxu_bwd(pads, res, g):
    x, w = res
    lo, hi = pads
    k = w.shape[-1]
    t_out = g.shape[-1]
    gc = g.astype(w.dtype)
    xp = jnp.pad(x, [(0, 0), (0, 0), (lo, hi)])
    # d_w[o, i, kk] = sum_{b,t} g[b, o, t] * x_pad[b, i, t + kk]
    d_w = jnp.stack(
        [jnp.einsum("bot,bit->oi", gc, xp[:, :, kk:kk + t_out],
                    preferred_element_type=jnp.float32)
         for kk in range(k)], axis=-1).astype(w.dtype)
    # d_x: convolve g with the channel-transposed, tap-reversed kernel;
    # pads (K-1-lo, K-1-hi) make the output land exactly on x's extent.
    wt = jnp.swapaxes(w, 0, 1)[:, :, ::-1]
    d_x = _conv1d_raw(gc, wt, (k - 1 - lo, k - 1 - hi)).astype(x.dtype)
    return d_x, d_w


_conv1d_mxu.defvjp(_conv1d_mxu_fwd, _conv1d_mxu_bwd)


def conv1d_apply(p: Params, x: jnp.ndarray, padding: str | int = "same",
                 out_dtype=None) -> jnp.ndarray:
    """x: (B, C_in, T) -> (B, C_out, T')  ('same' keeps T for odd kernels).

    ``out_dtype`` overrides the fp32 result dtype (bf16 activation
    policies pass the compute dtype so downstream elementwise traffic —
    and its backward — runs at half bandwidth).
    """
    w = p["w"]
    k = w.shape[-1]
    if padding == "same":
        pads = ((k - 1) // 2, k // 2)
    else:
        pads = (int(padding), int(padding))
    if x.dtype != w.dtype:  # bf16 policies cast activations down
        x = x.astype(w.dtype)
    # The hand-written backward pays K einsum dispatches — a win for the
    # wide encoder/postnet stacks (512ch, K=5), a loss for tiny per-step
    # convs like the K=31 2->32 location conv inside the decode scan.
    if (_mxu_convgrad_enabled() and k <= 7
            and w.shape[0] * w.shape[1] >= 4096):
        y = _conv1d_mxu(x, w, pads)
    else:
        y = _conv1d_raw(x, w, pads)
    if "b" in p:
        y = y + p["b"][None, :, None].astype(jnp.float32)
    if out_dtype is not None and y.dtype != out_dtype:
        y = y.astype(out_dtype)
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
        # One-pass moments: E[x] and E[x^2] reduce in a single fused read
        # of x (the two-pass form chains var's reduce behind mean's,
        # costing a second full pass over a (B, 512, T) activation — a
        # pure-bandwidth tensor at B=128).  Accumulation is fp32 even for
        # bf16 activations; cancellation error in E[x^2] - E[x]^2 is
        # ~|mean|^2 * 2^-23, negligible against these layers' O(1) vars.
        f32 = jnp.float32
        mean = jnp.mean(x, axis=(0, 2), dtype=f32)
        msq = jnp.mean(jnp.square(x.astype(f32)), axis=(0, 2))
        var = jnp.maximum(msq - mean * mean, 0.0)
        n = x.shape[0] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    y = (x - mean[None, :, None]) * (inv * p["scale"])[None, :, None] \
        + p["bias"][None, :, None]
    return y.astype(x.dtype), new_state


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
def bernoulli_mask(key, keep: float, shape) -> jnp.ndarray:
    """Dropout keep-mask from a raw (2,) uint32 key.

    On TPU the draw uses the hardware RBG generator: threefry is ~260
    VPU ops per 32-bit word, and regenerating the decoder's two
    (T, B, 1024) mask stacks measured 2.8 ms/step at B=128 — twice,
    because XLA's rematerializer replays the chain in the backward.
    The raw key widens deterministically to the 4-word RBG key.
    Off-TPU stays threefry (keeps CPU goldens and kernel-vs-scan
    bit-parity tests exact; the generators differ in DRAWS, not
    distribution, which is all dropout needs)."""
    if jax.default_backend() == "tpu" and getattr(key, "shape", None) == (2,):
        kd = jnp.concatenate([key, key]).astype(jnp.uint32)
        k = jax.random.wrap_key_data(kd, impl="rbg")
        return jax.random.bernoulli(k, keep, shape)
    return jax.random.bernoulli(key, keep, shape)


def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = bernoulli_mask(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
