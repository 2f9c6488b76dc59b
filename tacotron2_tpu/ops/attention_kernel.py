"""Pallas TPU kernel: fused attention energies -> softmax -> context.

The decoder's per-step attention tail (reference math: src/model.py:117-147)
is a chain of small ops over (B, T_enc) and (B, T_enc, D) tensors:

    e    = energy_scale * (tanh(qsum) @ v + b)   # (B, T_enc)
    e    = where(mask, -1e9, e)
    attn = softmax(e)
    ctx  = attn @ memory                          # (B, D_enc)

Inside the decoder scan this runs once per output frame (~800x per
utterance), so every avoided HBM round-trip counts.  This kernel keeps the
whole chain in VMEM per batch-block: one read of ``qsum`` (B, T, 128) and
``memory`` (B, T, 512), one write of ``attn`` and ``ctx``.

A pure-jnp reference implementation (`attention_tail_reference`) defines
the semantics; the Pallas path is used on TPU and parity-tested against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_tail_reference(qsum: jnp.ndarray, v_w: jnp.ndarray,
                             v_b: jnp.ndarray, energy_scale: jnp.ndarray,
                             mask: jnp.ndarray,
                             memory: jnp.ndarray):
    """Pure-jnp semantics.

    qsum: (B, T, A) pre-activation energy sum; v_w: (A,); v_b: scalar;
    mask: (B, T) bool, True = pad; memory: (B, T, D).
    Returns (attn (B, T), ctx (B, D)).
    """
    e = jnp.einsum("bta,a->bt", jnp.tanh(qsum), v_w) + v_b
    e = e * energy_scale
    e = jnp.where(mask, -1e9, e)
    attn = jax.nn.softmax(e, axis=1)
    ctx = jnp.einsum("bt,btd->bd", attn, memory)
    return attn, ctx


def _kernel(qsum_ref, vw_ref, scalars_ref, mask_ref, memory_ref,
            attn_ref, ctx_ref):
    # One program per batch item (Mosaic wants plain 2-D matmuls and
    # (8, 128)-aligned trailing block dims, hence the (B, T, 1)/(B, 1, D)
    # layouts).  Blocks: qsum (1, T, A), vw (A, 1), scalars (1, 2)
    # [v_b, scale], mask (1, T, 1) int8, memory (1, T, D);
    # outputs attn (1, T, 1), ctx (1, 1, D).
    v_b = scalars_ref[0, 0]
    scale = scalars_ref[0, 1]
    q = jnp.tanh(qsum_ref[0])                              # (T, A)
    # HIGHEST: keep fp32 on the MXU — these dots are tiny and the softmax
    # downstream amplifies bf16 rounding of the energies.
    e = jnp.dot(q, vw_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # (T, 1)
    e = (e + v_b) * scale
    masked = mask_ref[0] != 0                              # (T, 1)
    e = jnp.where(masked, -1e9, e)
    m = jnp.max(e, axis=0, keepdims=True)                  # (1, 1)
    w = jnp.exp(e - m)
    attn = w / jnp.sum(w, axis=0, keepdims=True)           # (T, 1)
    attn_ref[0] = attn
    ctx_ref[0] = jax.lax.dot_general(
        attn, memory_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # (1, D)


@jax.jit
def attention_tail_pallas(qsum: jnp.ndarray, v_w: jnp.ndarray,
                          v_b: jnp.ndarray, energy_scale: jnp.ndarray,
                          mask: jnp.ndarray, memory: jnp.ndarray):
    """Fused Pallas path; same signature/semantics as the reference impl."""
    b, t, a = qsum.shape
    d = memory.shape[-1]
    grid = (b,)
    scalars = jnp.stack([v_b.reshape(()), energy_scale.reshape(())]
                        ).reshape(1, 2).astype(jnp.float32)
    mask_i8 = mask.astype(jnp.int8)[..., None]             # (B, T, 1)

    attn, ctx = pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, t, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        ),
    )(qsum.astype(jnp.float32), v_w.reshape(a, 1).astype(jnp.float32),
      scalars, mask_i8, memory.astype(jnp.float32))
    return attn[..., 0], ctx[:, 0, :]


@jax.custom_vjp
def attention_tail(qsum, v_w, v_b, energy_scale, mask, memory):
    """Fused attention tail with autodiff: Pallas forward kernel + an
    analytic jnp backward (differentiating through softmax/energies), so
    the same op serves both the training scan and inference loop."""
    return attention_tail_pallas(qsum, v_w, v_b, energy_scale, mask, memory)


def _attention_tail_fwd(qsum, v_w, v_b, energy_scale, mask, memory):
    attn, ctx = attention_tail_pallas(qsum, v_w, v_b, energy_scale, mask,
                                      memory)
    return (attn, ctx), (qsum, v_w, v_b, energy_scale, mask, memory, attn)


def _attention_tail_bwd(res, cotangents):
    qsum, v_w, v_b, energy_scale, mask, memory, attn = res
    d_attn_out, d_ctx = cotangents
    # Backward math runs fp32 regardless of the (possibly bf16) primal
    # dtypes; custom_vjp requires cotangents to match primal dtypes, so the
    # results are cast back at the end.
    th = jnp.tanh(qsum.astype(jnp.float32))                 # (B, T, A)
    pre = jnp.einsum("bta,a->bt", th,
                     v_w.astype(jnp.float32)) + v_b.astype(jnp.float32)
    # ctx = attn @ memory
    d_attn = d_attn_out + jnp.einsum("bd,btd->bt", d_ctx, memory)
    d_memory = jnp.einsum("bt,bd->btd", attn, d_ctx)
    # softmax backward
    d_e = attn * (d_attn - jnp.sum(d_attn * attn, axis=1, keepdims=True))
    d_e = jnp.where(mask, 0.0, d_e)                         # -1e9 branch
    # e = pre * scale   (pre includes v_b)
    d_scale = jnp.sum(d_e * pre)
    d_pre = d_e * energy_scale.astype(jnp.float32)
    d_v_b = jnp.sum(d_pre)
    d_th = d_pre[..., None] * v_w.astype(jnp.float32)       # (B, T, A)
    d_v_w = jnp.einsum("bta,bt->a", th, d_pre)
    d_qsum = d_th * (1.0 - th * th)
    return (d_qsum.astype(qsum.dtype), d_v_w.astype(v_w.dtype),
            d_v_b.astype(v_b.dtype), d_scale.astype(energy_scale.dtype),
            None, d_memory.astype(memory.dtype))


attention_tail.defvjp(_attention_tail_fwd, _attention_tail_bwd)
