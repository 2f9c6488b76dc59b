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

import functools

import jax
import jax.numpy as jnp
import numpy as np

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
    # Block shapes: qsum (BB, T, A), vw (1, A), scalars (1, 2) [v_b, scale],
    # mask (BB, T) int8, memory (BB, T, D); outputs attn (BB, T), ctx (BB, D)
    v_b = scalars_ref[0, 0]
    scale = scalars_ref[0, 1]
    t = jnp.tanh(qsum_ref[:])                              # (BB, T, A)
    e = jax.lax.dot_general(
        t, vw_ref[0, :],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BB, T)
    e = (e + v_b) * scale
    e = jnp.where(mask_ref[:] != 0, -1e9, e)
    m = jnp.max(e, axis=1, keepdims=True)
    w = jnp.exp(e - m)
    attn = w / jnp.sum(w, axis=1, keepdims=True)
    attn_ref[:] = attn
    ctx_ref[:] = jax.lax.dot_general(
        attn, memory_ref[:],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (BB, D)


@functools.partial(jax.jit, static_argnames=("block_b",))
def attention_tail_pallas(qsum: jnp.ndarray, v_w: jnp.ndarray,
                          v_b: jnp.ndarray, energy_scale: jnp.ndarray,
                          mask: jnp.ndarray, memory: jnp.ndarray,
                          block_b: int = 8):
    """Fused Pallas path; same signature/semantics as the reference impl."""
    b, t, a = qsum.shape
    d = memory.shape[-1]
    bb = min(block_b, b)
    grid = (pl.cdiv(b, bb),)
    scalars = jnp.stack([v_b.reshape(()), energy_scale.reshape(())]
                        ).reshape(1, 2).astype(jnp.float32)
    mask_i8 = mask.astype(jnp.int8)

    attn, ctx = pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((bb, t, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ),
    )(qsum.astype(jnp.float32), v_w.reshape(1, a).astype(jnp.float32),
      scalars, mask_i8, memory.astype(jnp.float32))
    return attn, ctx


def attention_tail(qsum, v_w, v_b, energy_scale, mask, memory,
                   use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU, jnp elsewhere (or force via flag)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return attention_tail_pallas(qsum, v_w, v_b, energy_scale, mask,
                                     memory)
    return attention_tail_reference(qsum, v_w, v_b, energy_scale, mask,
                                    memory)
