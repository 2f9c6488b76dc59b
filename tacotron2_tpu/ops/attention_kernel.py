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
            attn_ref, ctx_ref, *, blk: int):
    # One program per BLOCK of batch items: grid overhead, not math, is
    # the cost of this tiny-op chain (one program per item spends ~1 µs
    # of Mosaic grid step per ~0.1 µs of arithmetic), so the per-item
    # body runs as a STATIC unrolled loop inside one program.  Blocks:
    # qsum (BLK, T, A), vw (A, 1), scalars (1, 2) [v_b, scale],
    # mask (BLK, T, 1) int8, memory (BLK, T, D);
    # outputs attn (BLK, T, 1), ctx (BLK, 1, D).
    v_b = scalars_ref[0, 0]
    scale = scalars_ref[0, 1]
    for i in range(blk):
        # Inputs stream from HBM in their NATIVE dtype (bf16 under the
        # mixed-precision policy — half the HBM traffic of an fp32 copy,
        # no materialized cast buffer); the upcast happens here in VMEM.
        q = jnp.tanh(qsum_ref[i].astype(jnp.float32))      # (T, A)
        # HIGHEST: keep fp32 on the MXU — these dots are tiny and the
        # softmax downstream amplifies bf16 rounding of the energies.
        e = jnp.dot(q, vw_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # (T, 1)
        e = (e + v_b) * scale
        masked = mask_ref[i] != 0                          # (T, 1)
        e = jnp.where(masked, -1e9, e)
        m = jnp.max(e, axis=0, keepdims=True)              # (1, 1)
        w = jnp.exp(e - m)
        attn = w / jnp.sum(w, axis=0, keepdims=True)       # (T, 1)
        attn_ref[i] = attn
        ctx_ref[i] = jax.lax.dot_general(
            attn, memory_ref[i].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (1, D)


def attention_tail_pallas(qsum: jnp.ndarray, v_w: jnp.ndarray,
                          v_b: jnp.ndarray, energy_scale: jnp.ndarray,
                          mask: jnp.ndarray, memory: jnp.ndarray):
    """Fused Pallas path; same signature/semantics as the reference impl.

    Under a registered kernel mesh (ops/meshing.py) the call shards over
    the data axis so each core runs the kernel on its LOCAL batch shard —
    without this, the un-partitionable custom call would force GSPMD to
    all-gather the global batch onto every core, once per decode step.
    """
    from .meshing import shard_over_batch
    call = shard_over_batch(
        _attention_tail_call,
        in_batch_dims=(0, None, None, None, 0, 0),
        out_batch_dims=(0, 0))
    return call(qsum, v_w, v_b, energy_scale, mask, memory)


def _attention_tail_call(qsum: jnp.ndarray, v_w: jnp.ndarray,
                         v_b: jnp.ndarray, energy_scale: jnp.ndarray,
                         mask: jnp.ndarray, memory: jnp.ndarray):
    b, t, a = qsum.shape
    d = memory.shape[-1]
    # Stream ``memory`` (the kernel's dominant HBM read — (B, T, 512)
    # every decode step) in the compute dtype of ``qsum``: under the bf16
    # policy that halves the traffic, and the cast is loop-invariant so
    # XLA's while-loop LICM hoists it out of the decoder scan.  Done HERE,
    # inside the custom-VJP primal, so it is forward-only: the gradient
    # d_memory stays in the caller's (fp32) dtype.
    memory = memory.astype(qsum.dtype)
    # Up to 8 batch items per grid program (grid overhead, not math,
    # dominates this tiny-op chain).  Measured on v5e at (B=64, T=128,
    # D=512): blk=1 47.9 µs/call, blk=8 34.0 µs, blk=16 equal to 8,
    # blk=32 exceeds the 16 MB scoped VMEM limit.  Prefer the largest
    # divisor of B <= 8 so no batch padding is needed; only when B has no
    # divisor >= 4 (odd/prime B > 8 — rare) pad the batch to a multiple
    # of 8.  Padding costs a per-decode-step copy of ``qsum`` (it changes
    # every step, so the pad cannot be hoisted); padded rows compute a
    # harmless uniform softmax and are sliced off.
    blk = b if b < 4 else next((c for c in (8, 7, 6, 5, 4)
                                if b % c == 0), 8)
    b_pad = -(-b // blk) * blk
    if b_pad != b:
        pad = [(0, b_pad - b)] + [(0, 0)] * (qsum.ndim - 1)
        qsum = jnp.pad(qsum, pad)
        memory = jnp.pad(memory, [(0, b_pad - b), (0, 0), (0, 0)])
        mask = jnp.pad(mask, [(0, b_pad - b), (0, 0)])
    grid = (b_pad // blk,)
    scalars = jnp.stack([v_b.reshape(()), energy_scale.reshape(())]
                        ).reshape(1, 2).astype(jnp.float32)
    mask_i8 = mask.astype(jnp.int8)[..., None]             # (B, T, 1)

    attn, ctx = pl.pallas_call(
        functools.partial(_kernel, blk=blk),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((blk, t, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1, d), jnp.float32),
        ),
    )(qsum, v_w.reshape(a, 1).astype(jnp.float32),
      scalars, mask_i8, memory)
    return attn[:b, :, 0], ctx[:b, 0, :]


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
