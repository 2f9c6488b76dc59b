"""Split-BPTT reverse dx-chain as ONE Pallas kernel (training MFU).

After the forward megakernel (ops/decoder_train_kernel.py), the
remaining training bottleneck is the backward's sequential dx chain —
`_bptt_bwd`'s reverse `lax.scan` re-streams every decoder weight from
HBM per step exactly like the forward used to (measured 78 ms of the
167 ms device step at B=128, xplane `while.25`).  This kernel runs the
reverse chain with the weights VMEM-resident across a reversed time
grid (index_map `t = T-1-g`), gradient carries in VMEM scratch, and the
per-step inputs/outputs streamed as rows.

Division of labor (designed so the kernel carries NO weight-gradient
accumulators, the same principle as the split backward itself):

  * FROM the forward kernel, streamed row by row in the compute dtype:
    the attention energy pre-activations ``qsum_s`` ((T, B, T_enc*A) —
    the exact rounded values the forward's tanh consumed, so the
    in-kernel ``th = tanh(qsum)`` is BIT-identical to the forward's
    fp32 tanh), and the LSTM PRE-activation gate stacks (sigmoid/tanh
    re-derived in fp32 here; streaming post-activations in cdt would
    snap saturated outputs to exactly 0/1 and zero their gradient
    factors, and streaming them in fp32 measured +10% step time).
  * IN the kernel, per step: read those streams plus the current cell
    states (no forward gate recompute at all — the gate matmul pairs
    were 2.28 of the kernel's 5.2 GMAC/step), run the head/LSTM/
    softmax/attention backward chains, and emit the per-step gate
    gradients (g_att, g_dec), the context/prenet cotangents, and the
    energy cotangent row ``d_e`` (B, T_enc).
  * OUTSIDE, hoisted, after the kernel: the remaining attention WEIGHT
    gradients reconstruct from (d_e_s, qsum_s) as single time-batched
    contractions — d_qsum_s = d_e_s*scale*v*(1-th^2), then d_query
    (einsum with the stored hiddens), the banded-conv gradient
    (prevcat_s^T @ d_loc2_s, folded back along the band diagonals to
    conv/dense grads by the chain rule through the composition).
    The v/bias/scale reductions AND the processed-memory gradient
    ``d_pm`` accumulate IN-kernel (d_pm is a (B, T_enc*A) resident
    f32 output block — accumulating it here removes a full re-read of
    the ~2 GB d_qsum stream, measured ~2.8 ms at B=128, and sums the
    UNROUNDED fp32 d_qsum instead of the streamed cdt rows).

  The previous-step cell states are NOT materialized as shifted copies:
  ``ca_s``/``cd_s`` are passed twice with a t-1 block index map
  (clamped at t=0 and zero-masked in-kernel), saving the ~0.6 GB
  shift-concat write+read at B=128 the old ``shift()`` paid (five
  (T, B, .) bf16 series — the same quantity BASELINE.md reports).

Numerics: the hand-derived softmax/tanh/linear chains mirror
`_bptt_bwd`'s `jax.vjp` over `_attn_probs` (same dtype policy: compute-
dtype matmul operands, fp32 accumulation and carries); grad parity vs
the autodiff path is pinned in tests/test_train_kernel.py.  Enabled
together with the forward kernel (train_megakernel_enabled) — both
gates key off the same VMEM-fit estimate; the lax.scan path remains for
CPU / oversize shapes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .decoder_train_kernel import _VMEM_BUDGET


def _kernel(n_mels: int, h: int, adim: int, kloc: int, t_enc: int,
            pdim: int, keep_a: float, keep_d: float,
            fscal,
            # streamed rows (t = T-1-g)
            ma_ref, md_ref, aa_ref, ad_ref, cac_ref, cdc_ref,
            cap_ref, cdp_ref, attn_ref, qsum_ref, dout_ref, dattn_ref,
            # resident
            wi_a, wh_a, wi_d, wh_d, wq, wband, v3, w_heads, mem,
            # outputs (streamed rows + resident accumulators)
            gatt_ref, gdec_ref, dctx_ref, dpre_ref, dqsum_ref, dpq_ref,
            dv_ref, dpm_ref, scal_ref,
            # scratch gradient carries
            d_ha, d_ca, d_hd, d_cd, d_ctxn, d_prev, d_cum, dv_acc,
            scal_acc):
    g = pl.program_id(0)
    b = d_prev.shape[0]
    cdt = wi_a.dtype
    f32 = jnp.float32
    p = t_enc + kloc - 1
    lpad = (kloc - 1) // 2

    @pl.when(g == 0)
    def _():
        d_ha[:] = jnp.zeros_like(d_ha)
        d_ca[:] = jnp.zeros_like(d_ca)
        d_hd[:] = jnp.zeros_like(d_hd)
        d_cd[:] = jnp.zeros_like(d_cd)
        d_ctxn[:] = jnp.zeros_like(d_ctxn)
        d_prev[:] = jnp.zeros_like(d_prev)
        d_cum[:] = jnp.zeros_like(d_cum)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        dpm_ref[:] = jnp.zeros_like(dpm_ref)
        scal_acc[0] = 0.0
        scal_acc[1] = 0.0

    # t=0 (the LAST grid step on this reversed grid) has no previous
    # step: its "previous cell state" block is the clamped t=0 row of
    # ca_s/cd_s — mask it to the zero initial state.
    prevmask = jnp.where(g == pl.num_programs(0) - 1, 0.0, 1.0)

    def dotT(x, w):
        # (B, out) x (in, out) -> (B, in): contract the out dim without
        # materializing a transpose of the resident weight
        return jax.lax.dot_general(x, w[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # ---- step t's forward internals, re-derived in fp32 from the
    # forward kernel's STREAMED pre-activation gate stacks (no matmul
    # recompute: removing the two forward gate matmul pairs cuts 2.28 of
    # this kernel's 5.2 GMAC/step at the reference dims, plus the
    # prenet/prev-hidden/context rows that the recompute consumed; the
    # sigmoid/tanh re-derivation here is cheap VPU work, and evaluating
    # them on the cdt-rounded INPUTS keeps saturated gradient factors
    # like ia*(1-ia) alive where a cdt-rounded OUTPUT snaps to exactly
    # 0/1).  tanh(c_t) comes from the streamed CURRENT cell states —
    # exact, where the old recompute re-derived c_t. ----
    pga = aa_ref[0].astype(f32)                           # (B, 4H) preact
    ia = jax.nn.sigmoid(pga[:, :h])
    fa = jax.nn.sigmoid(pga[:, h:2 * h])
    gga = jnp.tanh(pga[:, 2 * h:3 * h])
    oa = jax.nn.sigmoid(pga[:, 3 * h:])
    tca = jnp.tanh(cac_ref[0])
    mka = ma_ref[0].astype(f32)
    pgd = ad_ref[0].astype(f32)
    id_ = jax.nn.sigmoid(pgd[:, :h])
    fd = jax.nn.sigmoid(pgd[:, h:2 * h])
    ggd = jnp.tanh(pgd[:, 2 * h:3 * h])
    od = jax.nn.sigmoid(pgd[:, 3 * h:])
    tcd = jnp.tanh(cdc_ref[0])

    # ---- backward through the fused heads ----
    d_proj = dotT(dout_ref[0].astype(cdt), w_heads)       # (B, h+D)
    d_hd_drop = d_proj[:, :h] + d_hd[:]
    d_ctx = d_proj[:, h:] + d_ctxn[:]

    # ---- decoder LSTM backward ----
    mkd = md_ref[0].astype(f32)
    d_hdv = (d_hd_drop / keep_d) * mkd if keep_d < 1.0 else d_hd_drop
    d_od = d_hdv * tcd
    d_cdv = d_cd[:] + d_hdv * od * (1.0 - tcd * tcd)
    g_dec = jnp.concatenate(
        [d_cdv * ggd * id_ * (1.0 - id_),
         d_cdv * (cdp_ref[0] * prevmask) * fd * (1.0 - fd),
         d_cdv * id_ * (1.0 - ggd * ggd),
         d_od * od * (1.0 - od)], axis=-1).astype(cdt)
    gdec_ref[0] = g_dec
    d_cd[:] = d_cdv * fd
    d_xd = dotT(g_dec, wi_d)
    d_hd[:] = dotT(g_dec, wh_d)
    d_ha_drop = d_xd[:, :h]
    d_ctx = d_ctx + d_xd[:, h:]

    # ---- attention backward ----
    attn = attn_ref[0]                                    # (B, T) f32
    d_attn = (dattn_ref[0] + d_prev[:] + d_cum[:]
              + jnp.sum(jnp.broadcast_to(d_ctx.astype(cdt)[:, None, :],
                                         mem.shape).astype(f32)
                        * mem[:].astype(f32), axis=-1))
    # softmax backward (pivot: the STORED attn row)
    s = jnp.sum(attn * d_attn, axis=-1, keepdims=True)
    d_e = attn * (d_attn - s)                             # wrt full e
    d_eraw = d_e * fscal[1]                               # * energy_scale
    # th from the streamed qsum row: bit-identical to the forward's
    # fp32 tanh (qsum was the rounded value the forward's tanh consumed)
    th = jnp.tanh(qsum_ref[0].reshape(b, t_enc, adim).astype(f32))
    d_qsum = d_eraw[:, :, None] * v3[:] * (1.0 - th * th)  # (B, T, A) f32
    # processed-memory gradient: accumulate the UNROUNDED fp32 d_qsum
    # into the resident output block (saves the outside stream re-read)
    dpm_ref[:] = dpm_ref[:] + d_qsum.reshape(b, t_enc * adim)
    d_pq = jnp.sum(d_qsum, axis=1)                        # (B, A)
    dpq_ref[0] = d_pq
    # v / bias / scale gradient pieces accumulate in-kernel (everything
    # needed is already resident: th, d_e)
    dv_acc[:] = dv_acc[:] + jnp.sum(th * d_eraw[:, :, None], axis=1)
    e_raw = jnp.sum(th * v3[:], axis=-1)                  # (B, T)
    scal_acc[0] = scal_acc[0] + jnp.sum(d_e * (e_raw + fscal[0]))
    scal_acc[1] = scal_acc[1] + jnp.sum(d_e)
    d_ha_att = dotT(d_pq.astype(cdt), wq)
    d_qsum_c = d_qsum.astype(cdt)
    dqsum_ref[0] = d_qsum_c.reshape(b, t_enc * adim)
    d_prevcat = dotT(d_qsum_c.reshape(b, t_enc * adim), wband)  # (B, 2P)
    new_d_prev = d_prevcat[:, lpad:lpad + t_enc]
    d_cum[:] = d_cum[:] + d_prevcat[:, p + lpad:p + lpad + t_enc]
    d_prev[:] = new_d_prev
    dctx_ref[0] = d_ctx

    # ---- attention LSTM backward ----
    d_ha_drop = d_ha_drop + d_ha_att + d_ha[:]
    d_hav = (d_ha_drop / keep_a) * mka if keep_a < 1.0 else d_ha_drop
    d_oa = d_hav * tca
    d_cav = d_ca[:] + d_hav * oa * (1.0 - tca * tca)
    g_att = jnp.concatenate(
        [d_cav * gga * ia * (1.0 - ia),
         d_cav * (cap_ref[0] * prevmask) * fa * (1.0 - fa),
         d_cav * ia * (1.0 - gga * gga),
         d_oa * oa * (1.0 - oa)], axis=-1).astype(cdt)
    gatt_ref[0] = g_att
    d_ca[:] = d_cav * fa
    d_xa = dotT(g_att, wi_a)
    d_ha[:] = dotT(g_att, wh_a)
    dpre_ref[0] = d_xa[:, :pdim]
    d_ctxn[:] = d_xa[:, pdim:]

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        dv_ref[:] = dv_acc[:]
        scal_ref[0] = scal_acc[0]
        scal_ref[1] = scal_acc[1]


def decoder_bwd_chain_mega(cfg: ModelConfig, params: Dict[str, Any],
                           wband: jnp.ndarray, memory: jnp.ndarray,
                           mka_s, mkd_s, aa_s, ad_s, ca_s, cd_s,
                           attns, qsum_s, d_out_s, d_attn_out
                           ) -> Tuple[jnp.ndarray, ...]:
    """Run the reverse dx chain as one Pallas program.

    Inputs are the per-step series the forward kernel saved — the
    pre-activation gate stacks ``aa_s/ad_s (T, B, 4H)`` (compute dtype;
    activations re-derived in fp32 in-kernel), the cell-state series
    (each consumed twice: once at t, once at t-1 via a clamped index
    map — no shifted copies), the attention energy pre-activation rows
    ``qsum_s (T, B, T_enc*A)`` (the whole attention-energy residual),
    the dropout masks and the
    output cotangents — plus the precomputed ``wband``.  Returns the
    per-step series (g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_qsum_s,
    d_pq_s) ordered by step t like the forward — from which the
    LSTM/head/attention weight gradients hoist as time-batched
    contractions — plus the in-kernel accumulators: dv per-batch
    partials, the per-batch processed-memory gradient ``dpm_b
    (B, T_enc*A)`` and [sum d_e*(e_raw+vb), sum d_e].
    """
    att = params["attention"]
    cdt = params["attn_lstm"]["wi"].dtype
    f32 = jnp.float32

    w_heads = jnp.concatenate([params["proj"]["w"], params["gate"]["w"]],
                              axis=1).astype(cdt)
    v3 = att["v"]["w"][:, 0].astype(f32)[None, None, :]
    fscal = jnp.stack([att["v"]["b"][0].astype(f32),
                       att["energy_scale"].astype(f32)])

    from .meshing import shard_over_batch
    call = shard_over_batch(
        functools.partial(_bwd_mega_call, cfg),
        # fscal, 10 streamed (T, B, .) series, 8 resident weights,
        # per-item memory
        in_batch_dims=(None,) + (1,) * 10 + (None,) * 8 + (0,),
        # per-step series + dv/dpm per-batch partials; the (2,)
        # scale/bias accumulator is batch-reduced IN-kernel -> psum
        out_batch_dims=(1,) * 6 + (0, 0, None),
        reduce_out=(8,))
    return call(
        fscal, mka_s.astype(cdt), mkd_s.astype(cdt),
        aa_s, ad_s, ca_s, cd_s,
        attns, qsum_s, d_out_s, d_attn_out,
        params["attn_lstm"]["wi"].astype(cdt),
        params["attn_lstm"]["wh"].astype(cdt),
        params["dec_lstm"]["wi"].astype(cdt),
        params["dec_lstm"]["wh"].astype(cdt),
        att["query"]["w"].astype(cdt),
        wband, v3, w_heads, memory.astype(cdt))


def _bwd_mega_call(cfg: ModelConfig, fscal, mka_s, mkd_s,
                   aa_s, ad_s, ca_s, cd_s,
                   attns, qsum_s, d_out_s, d_attn_out,
                   wi_a, wh_a, wi_d, wh_d, wq, wband, v3,
                   w_heads, memory):
    """The pallas_call itself; all shapes derive from the (possibly
    shard_map-local) operand shapes so the same body serves single-core
    and per-shard invocation."""
    t_dec, b, _ = aa_s.shape
    t_enc = attns.shape[2]
    h = cfg.decoder_rnn_dim
    adim = cfg.attention_dim
    kloc = cfg.location_kernel_size
    cdt = wi_a.dtype
    f32 = jnp.float32
    p2 = 2 * (t_enc + kloc - 1)
    ta = t_enc * adim
    dd = cfg.encoder_embedding_dim

    rrow = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda g: (t_dec - 1 - g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    # previous-step row: t-1 on the reversed grid, clamped at t=0 (the
    # kernel zero-masks that final step) — reads the SAME series array a
    # second time instead of materializing a shifted copy
    prow = lambda shape: pl.BlockSpec(
        (1,) + shape,
        lambda g: (jnp.maximum(t_dec - 2 - g, 0),) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, cfg.n_mels, h, adim, kloc, t_enc,
                             cfg.prenet_dim,
                             1.0 - cfg.p_attention_dropout,
                             1.0 - cfg.p_decoder_dropout)
    (g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_qsum_s, d_pq_s, dv_b, dpm_b,
     scal) = pl.pallas_call(
        kern,
        grid=(t_dec,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # fscal
            rrow((b, h)), rrow((b, h)),                   # dropout masks
            rrow((b, 4 * h)), rrow((b, 4 * h)),           # gate stacks
            rrow((b, h)), rrow((b, h)),                   # ca_t, cd_t
            prow((b, h)), prow((b, h)),                   # ca_{t-1}, cd_{t-1}
            rrow((b, t_enc)),                             # attn_t
            rrow((b, ta)),                                # th_t (cdt)
            rrow((b, cfg.n_mels + 1)),                    # d_out_t
            rrow((b, t_enc)),                             # d_attn_out_t
            const((cfg.prenet_dim + dd, 4 * h)),
            const((h, 4 * h)),
            const((h + dd, 4 * h)),
            const((h, 4 * h)),
            const((h, adim)),
            const((p2, ta)),
            const((1, 1, adim)),
            const((h + dd, cfg.n_mels + 1)),
            const((b, t_enc, dd)),                        # memory (cdt)
        ],
        out_specs=[
            rrow((b, 4 * h)), rrow((b, 4 * h)),
            rrow((b, dd)), rrow((b, cfg.prenet_dim)),
            rrow((b, ta)), rrow((b, adim)),
            pl.BlockSpec((b, adim), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, ta), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),        # d_pm accum
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_dec, b, 4 * h), cdt),
            jax.ShapeDtypeStruct((t_dec, b, 4 * h), cdt),
            jax.ShapeDtypeStruct((t_dec, b, dd), f32),
            jax.ShapeDtypeStruct((t_dec, b, cfg.prenet_dim), f32),
            jax.ShapeDtypeStruct((t_dec, b, ta), cdt),
            jax.ShapeDtypeStruct((t_dec, b, adim), f32),
            jax.ShapeDtypeStruct((b, adim), f32),
            jax.ShapeDtypeStruct((b, ta), f32),
            jax.ShapeDtypeStruct((2,), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), f32), pltpu.VMEM((b, h), f32),
            pltpu.VMEM((b, h), f32), pltpu.VMEM((b, h), f32),
            pltpu.VMEM((b, dd), f32),
            pltpu.VMEM((b, t_enc), f32), pltpu.VMEM((b, t_enc), f32),
            pltpu.VMEM((b, adim), f32),
            pltpu.SMEM((2,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=jax.default_backend() != "tpu",
    )(fscal, mka_s, mkd_s, aa_s, ad_s, ca_s, cd_s, ca_s, cd_s,
      attns, qsum_s, d_out_s, d_attn_out,
      wi_a, wh_a, wi_d, wh_d, wq, wband, v3, w_heads,
      memory)
    return (g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_qsum_s, d_pq_s,
            dv_b, dpm_b, scal)
