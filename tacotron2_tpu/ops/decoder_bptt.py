"""Split-BPTT for the teacher-forced decoder scan: the training-MFU attack.

The decoder is the training hot loop (reference: src/model.py:291-296 runs
it as per-frame Python; here it is one ``lax.scan``).  Under plain JAX
autodiff the scan's backward pass accumulates the LSTM weight gradients
(~73 MB fp32) INSIDE the sequential loop: XLA materializes a read-modify-
write of every dW accumulator on every one of the T_dec (~512) backward
steps, plus re-streams the stacked attention residuals.  At batch 128 that
HBM traffic — not the MXU — bounds the train step (~10% MFU measured in
round 2, BASELINE.md).

This module replaces the scan's autodiff with a hand-written backward that
splits BPTT into its two structurally different parts:

  1. **The sequential dx chain** (the only part that truly must run
     step-by-step) — a reverse ``lax.scan`` that recomputes each step's
     activations from O(B) stored carries (bit-identical recompute: the
     forward matmuls consumed the same bf16-cast values that are stored)
     and back-propagates the state gradients.  Its per-step weight reads
     are loop-invariant, and it carries NO weight-gradient accumulators —
     it just EMITS the per-step pre-activation gate gradients.

  2. **The weight-gradient contractions** (embarrassingly parallel over
     time) — hoisted OUT of the loop as single time-batched MXU matmuls:
     ``dW = einsum('tbi,tbg->ig', x_series, gate_grad_series)``.  One big
     (T*B, in) x (T*B, 4H) contraction at full MXU occupancy instead of
     T_dec read-modify-writes of the accumulator.

Residuals stored by the forward scan (per step): the two LSTM hidden
states AFTER dropout (in the compute dtype — exactly the values the next
step's matmuls consumed), the two fp32 cell states, and the attention
weights (an output anyway).  Everything else — gate activations, the
attention energy chain, even the attention context (``ctx = attn @
memory``) — is recomputed in the backward pass.  This also removes the
qsum residual, round 2's dominant training memory term ((T_dec, B, T_enc,
attn_dim) — 8 GB fp32 at B=256), so large batches fit without remat.
(The Pallas kernel pair additionally saves the attention energy
pre-activations (qsum) and the LSTM pre-activation gate stacks — on
that path the reverse kernel recomputes nothing but cheap elementwise
sigmoid/tanh and spends its MACs only on the dx chain itself; the scan
fallback keeps the memory-lean recompute above.)

Numerics: gradients for the small attention parameters are obtained by
``jax.vjp`` over a per-step energy function that mirrors the forward's
dtype policy; gate gradients are emitted in the compute dtype (one bf16
rounding under the mixed-precision policy — the same class of rounding
plain autodiff applies at the bf16 parameter leaves); ``d_memory`` and the
processed-memory gradient accumulate in fp32 (the encoder's entire
gradient signal — kept full precision, as in ops/attention_kernel.py).

Enabled by ``ModelConfig.decoder_split_bptt`` (default True) with env
override ``TACOTRON2_SPLIT_BPTT=0``; ``remat_decoder_step`` (an explicit
user memory/speed choice) takes precedence and uses the autodiff path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.layers import (conv1d_apply, linear_apply, lstm_activations,
                             lstm_gates)

_SMALL_ATT_KEYS = ("query", "location_conv", "location_dense", "v",
                   "energy_scale")


def split_bptt_enabled(cfg: ModelConfig) -> bool:
    """Route training through the split-BPTT scan?  Config-gated with an
    env kill-switch for A/B measurement; an explicit remat request uses
    the plain autodiff path (remat is a user memory/speed choice)."""
    flag = os.environ.get("TACOTRON2_SPLIT_BPTT")
    if flag is not None:
        return flag not in ("0", "false", "no")
    return cfg.decoder_split_bptt and not cfg.remat_decoder_step


def _float0(x):
    """Symbolic-zero cotangent for integer/bool primal inputs."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _attn_probs(small: Dict[str, Any], ha_d: jnp.ndarray, prev: jnp.ndarray,
                cum: jnp.ndarray, pm: jnp.ndarray, mask: jnp.ndarray,
                cdt) -> jnp.ndarray:
    """Attention probabilities for one step, mirroring the forward dtype
    policy (models/attention.py::attention_step: qsum cast to the compute
    dtype, tanh/energies/softmax fp32).  Differentiated per-step with
    ``jax.vjp`` in the backward scan — this is where the small attention
    parameter gradients and the processed-memory gradient come from."""
    pq = linear_apply(small["query"], ha_d)[:, None, :]
    loc_in = jnp.stack([prev, cum], axis=1)
    loc = conv1d_apply(small["location_conv"], loc_in, padding="same")
    loc = linear_apply(small["location_dense"], jnp.swapaxes(loc, 1, 2))
    qsum = (pq + pm + loc).astype(cdt)
    th = jnp.tanh(qsum.astype(jnp.float32))
    e = jnp.einsum("bta,a->bt", th, small["v"]["w"][:, 0].astype(jnp.float32))
    e = (e + small["v"]["b"][0].astype(jnp.float32)) \
        * small["energy_scale"].astype(jnp.float32)
    e = jnp.where(mask, -1e9, e)
    return jax.nn.softmax(e, axis=1)


def _step_dropout_masks(cfg: ModelConfig, step_keys, b: int, h: int):
    """Per-step dropout masks for the kernel paths.

    Off-TPU these are bit-identical to the bernoulli draws `decode_step`
    makes from the same keys (the kernel-vs-scan parity tests rely on
    it).  On TPU the whole (T, B, H) stack draws from the hardware RBG
    generator in ONE call per mask — threefry for these two stacks
    measured 2.8 ms/step at B=128 (and XLA remats the chain into the
    backward for another 2.8) against ~0 for RBG; the draws differ from
    the scan path's, which only changes WHICH units drop, not the
    dropout distribution."""
    keep_a = 1.0 - cfg.p_attention_dropout
    keep_d = 1.0 - cfg.p_decoder_dropout
    t_dec = step_keys.shape[0]

    if jax.default_backend() == "tpu":
        from ..models.layers import bernoulli_mask
        r_att, r_dec = jax.random.split(step_keys[0])
        mka = (bernoulli_mask(r_att, keep_a, (t_dec, b, h))
               if cfg.p_attention_dropout > 0.0
               else jnp.ones((t_dec, b, h), bool))
        mkd = (bernoulli_mask(r_dec, keep_d, (t_dec, b, h))
               if cfg.p_decoder_dropout > 0.0
               else jnp.ones((t_dec, b, h), bool))
        return mka, mkd

    def one(key_t):
        r_att, r_dec = jax.random.split(key_t)
        mka = (jax.random.bernoulli(r_att, keep_a, (b, h))
               if cfg.p_attention_dropout > 0.0 else jnp.ones((b, h), bool))
        mkd = (jax.random.bernoulli(r_dec, keep_d, (b, h))
               if cfg.p_decoder_dropout > 0.0 else jnp.ones((b, h), bool))
        return mka, mkd

    return jax.vmap(one)(step_keys)


def _fwd_scan(cfg: ModelConfig, params, prenet_tbd, memory, pm, mask,
              step_keys):
    """Forward scan (the ordinary training forward, reusing decode_step —
    including the Pallas attention tail) that additionally emits the
    per-step carries the backward needs: post-dropout hidden states in the
    compute dtype (the exact values the forward matmuls consumed) and fp32
    cell states.

    On TPU under the fused-attention policy the whole scan runs as the
    Pallas training megakernel (ops/decoder_train_kernel.py) — weights
    VMEM-resident across steps, dropout from precomputed masks; the
    emitted outputs/residuals are identical in contract, so the split
    backward below is unchanged."""
    from ..models.decoder import decode_step, init_carry

    b, t_enc, _ = memory.shape
    carry0 = init_carry(b, t_enc, cfg)
    cdt = params["attn_lstm"]["wi"].dtype

    from .decoder_train_kernel import (decoder_fwd_train_mega,
                                       train_megakernel_enabled)
    if train_megakernel_enabled(cfg, b, t_enc, cdt):
        h = cfg.decoder_rnn_dim
        mka_s, mkd_s = _step_dropout_masks(cfg, step_keys, b, h)
        out, res = decoder_fwd_train_mega(cfg, params, prenet_tbd, memory,
                                          pm, mask, mka_s, mkd_s)
        # Save the bool masks as residuals: regenerating them in the
        # backward costs ~2.8 ms of threefry bit-twiddling at B=128
        # (xplane: the single largest non-matmul fusion), vs 2x67 MB of
        # bool residency here.
        return out, res + (mka_s, mkd_s)

    def step(carry, xs):
        pre_t, key_t = xs
        new_carry, (mel, gate, attn) = decode_step(
            params, cfg, pre_t, carry, memory, pm, mask, key_t, train=True)
        res = (new_carry.h_att.astype(cdt), new_carry.c_att,
               new_carry.h_dec.astype(cdt), new_carry.c_dec)
        return new_carry, (mel, gate, attn, res)

    _, (mels, gates, attns, res) = jax.lax.scan(
        step, carry0, (prenet_tbd, step_keys))
    return (mels, gates, attns), res


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def decoder_scan_bptt(cfg: ModelConfig, params, prenet_tbd, memory, pm,
                      mask, step_keys):
    """Teacher-forced decoder scan with the split-BPTT custom backward.

    Args:
        params: decoder params WITHOUT the prenet subtree
            ({attention, attn_lstm, dec_lstm, proj, gate}).
        prenet_tbd: (T_dec, B, prenet_dim) prenetted go-shifted targets.
        memory: (B, T_enc, D_enc) encoder outputs (fp32).
        pm: (B, T_enc, attn_dim) processed memory (W_m @ memory).
        mask: (B, T_enc) bool, True = encoder padding (required — callers
            with no padding pass all-False).
        step_keys: (T_dec, 2) uint32 per-step dropout keys.
    Returns:
        (mels (T, B, n_mels), gate_logits (T, B), attn (T, B, T_enc)).
    """
    out, _ = _fwd_scan(cfg, params, prenet_tbd, memory, pm, mask, step_keys)
    return out


def _bptt_fwd(cfg, params, prenet_tbd, memory, pm, mask, step_keys):
    out, res = _fwd_scan(cfg, params, prenet_tbd, memory, pm, mask,
                         step_keys)
    attns = out[2]
    return out, (params, prenet_tbd, memory, pm, mask, step_keys, attns,
                 res)


def _bptt_bwd(cfg, residuals, cots):
    (params, prenet_tbd, memory, pm, mask, step_keys, attns, res) = residuals
    # the Pallas forward additionally saves the attention qsum rows and
    # the pre-activation gate stacks (aa/ad) for the reverse kernel
    qsum_saved = res[4] if len(res) >= 5 else None
    acts_saved = res[5:7] if len(res) >= 7 else None
    masks_saved = res[7:9] if len(res) >= 9 else None
    ha_s, ca_s, hd_s, cd_s = res[:4]             # (T, B, H) each
    d_mels, d_gates, d_attn_out = cots           # (T,B,M), (T,B), (T,B,S)
    t_dec, b, _ = ha_s.shape
    t_enc = memory.shape[1]
    h = cfg.decoder_rnn_dim
    n_mels = cfg.n_mels
    pdim = cfg.prenet_dim
    cdt = params["attn_lstm"]["wi"].dtype
    keep_a = 1.0 - cfg.p_attention_dropout
    keep_d = 1.0 - cfg.p_decoder_dropout
    f32 = jnp.float32

    def shift(series, init):
        return jnp.concatenate([init[None], series[:-1]], axis=0)

    prev_s = shift(attns, jnp.zeros((b, t_enc), attns.dtype))
    # Exclusive prefix sums: the cum_attn state each step consumed.
    # Shift-then-cumsum, NOT cumsum-minus-attns — the subtraction form
    # cancels catastrophically on early steps (cum ~ attn) and the error
    # lands directly on the location-conv input of the recompute.
    cum_s = jnp.cumsum(prev_s, axis=0)

    # The attention context is NOT stored: ctx_t = attn_t @ memory is one
    # time-batched matmul over the stored alignments (matching the
    # forward's compute dtype for the memory operand).
    from ..models.attention import _fused_tail_enabled
    mem_ctx = memory.astype(cdt) if _fused_tail_enabled() else memory
    ctx_s = jnp.einsum("tbs,bsd->tbd", attns,
                       mem_ctx.astype(f32) if mem_ctx.dtype != f32 else
                       mem_ctx, preferred_element_type=f32)
    ctx_c = ctx_s.astype(cdt)

    small = {k: params["attention"][k] for k in _SMALL_ATT_KEYS}
    w_heads_t = jnp.concatenate(
        [params["proj"]["w"], params["gate"]["w"]], axis=1).T   # (M+1, in)
    mem_c = memory.astype(cdt)     # d_attn's ctx-path matmul operand

    from .decoder_train_kernel import train_megakernel_enabled
    if acts_saved is not None and train_megakernel_enabled(cfg, b, t_enc,
                                                           cdt):
        # Pallas reverse-chain kernel + hoisted attention-weight grads
        # (ops/decoder_bwd_kernel.py) — same emitted series/grads as the
        # scan below, weights VMEM-resident across steps.  No shifted
        # cell-state copies: the kernel reads ca_s/cd_s at t-1 itself.
        (g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_small,
         d_pm) = _bwd_chain_mega(
            cfg, params, memory, step_keys, attns, ha_s, ca_s, cd_s,
            prev_s, cum_s, qsum_saved, acts_saved,
            d_mels, d_gates, d_attn_out, masks_saved=masks_saved)
        return _bptt_weight_grads(
            cfg, params, prenet_tbd, memory, pm, mask, step_keys, attns,
            ha_s, hd_s, ctx_c,
            d_mels, d_gates, g_att_s, g_dec_s, d_ctx_s, d_pre_s,
            d_small, d_pm)

    # Shifted series feed the scan fallback's per-step recompute only —
    # the Pallas path above never materializes them (the kernel reads
    # t-1 rows via its index map; the weight grads contract slices).
    ha_prev_s = shift(ha_s, jnp.zeros((b, h), cdt))
    ca_prev_s = shift(ca_s, jnp.zeros((b, h), ca_s.dtype))
    hd_prev_s = shift(hd_s, jnp.zeros((b, h), cdt))
    cd_prev_s = shift(cd_s, jnp.zeros((b, h), cd_s.dtype))
    ctx_prev_c = shift(ctx_c, jnp.zeros((b, memory.shape[2]), cdt))

    att_fn = lambda sm, hh, pv, cm, pmm: _attn_probs(sm, hh, pv, cm, pmm,
                                                     mask, cdt)

    def dotT(g, w):
        # g (B, out) x w (in, out) -> (B, in), contracting the out dim
        # (no materialized transpose of the VMEM-resident weight).
        return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def body(carry, xs):
        (d_ha_n, d_ca_n, d_hd_n, d_cd_n, d_ctx_n, d_prev_n, d_cum_n,
         d_pm_acc, d_small_acc) = carry
        (pre_t, key_t, ha_p, ca_p, hd_p, cd_p, ctx_pc, ctx_tc, prev_t,
         cum_t, dmel_t, dgate_t, dattn_t) = xs
        r_att, r_dec = jax.random.split(key_t)

        # ---- recompute step t (bit-identical: the stored carries are the
        # bf16-cast values the forward matmuls consumed) ----
        xa = jnp.concatenate([pre_t.astype(cdt), ctx_pc], axis=-1)
        ia, fa, ga, oa = lstm_activations(
            lstm_gates(params["attn_lstm"], xa, ha_p))
        ca_t = fa * ca_p + ia * ga
        tca = jnp.tanh(ca_t)
        ha_t = oa * tca
        if cfg.p_attention_dropout > 0.0:
            mka = jax.random.bernoulli(r_att, keep_a, ha_t.shape)
            ha_d = jnp.where(mka, ha_t / keep_a, 0.0)
        else:
            ha_d = ha_t
        _, att_pb = jax.vjp(att_fn, small, ha_d, prev_t, cum_t, pm)
        xd = jnp.concatenate([ha_d.astype(cdt), ctx_tc], axis=-1)
        id_, fd, gd, od = lstm_activations(
            lstm_gates(params["dec_lstm"], xd, hd_p))
        cd_t = fd * cd_p + id_ * gd
        tcd = jnp.tanh(cd_t)
        if cfg.p_decoder_dropout > 0.0:
            mkd = jax.random.bernoulli(r_dec, keep_d,
                                       (b, h))

        # ---- backward through step t ----
        d_out = jnp.concatenate([dmel_t, dgate_t[:, None]], axis=-1)
        d_proj_in = jnp.dot(d_out.astype(cdt), w_heads_t,
                            preferred_element_type=f32)
        d_hd_drop = d_proj_in[:, :h] + d_hd_n
        d_ctx = d_proj_in[:, h:] + d_ctx_n

        # decoder LSTM
        d_hd = (jnp.where(mkd, d_hd_drop / keep_d, 0.0)
                if cfg.p_decoder_dropout > 0.0 else d_hd_drop)
        d_od = d_hd * tcd
        d_cd = d_cd_n + d_hd * od * (1.0 - tcd * tcd)
        g_dec = jnp.concatenate(
            [d_cd * gd * id_ * (1.0 - id_),
             d_cd * cd_p * fd * (1.0 - fd),
             d_cd * id_ * (1.0 - gd * gd),
             d_od * od * (1.0 - od)], axis=-1).astype(cdt)
        d_cd_prev = d_cd * fd
        d_xd = dotT(g_dec, params["dec_lstm"]["wi"])
        d_hd_prev = dotT(g_dec, params["dec_lstm"]["wh"])
        d_ha_drop = d_xd[:, :h]
        d_ctx = d_ctx + d_xd[:, h:]

        # attention: all ctx_t uses are now accounted for -> to attn_t
        d_attn = (dattn_t + d_prev_n + d_cum_n
                  + jnp.einsum("bd,bsd->bs", d_ctx.astype(cdt), mem_c,
                               preferred_element_type=f32))
        d_small_t, d_ha_att, d_prev_t, d_cum_att, d_pm_t = att_pb(d_attn)
        d_pm_acc = d_pm_acc + d_pm_t.astype(f32)
        d_small_acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(f32), d_small_acc, d_small_t)
        d_cum = d_cum_n + d_cum_att.astype(f32)

        # attention LSTM
        d_ha_drop = d_ha_drop + d_ha_att.astype(f32) + d_ha_n
        d_ha = (jnp.where(mka, d_ha_drop / keep_a, 0.0)
                if cfg.p_attention_dropout > 0.0 else d_ha_drop)
        d_oa = d_ha * tca
        d_ca = d_ca_n + d_ha * oa * (1.0 - tca * tca)
        g_att = jnp.concatenate(
            [d_ca * ga * ia * (1.0 - ia),
             d_ca * ca_p * fa * (1.0 - fa),
             d_ca * ia * (1.0 - ga * ga),
             d_oa * oa * (1.0 - oa)], axis=-1).astype(cdt)
        d_ca_prev = d_ca * fa
        d_xa = dotT(g_att, params["attn_lstm"]["wi"])
        d_ha_prev = dotT(g_att, params["attn_lstm"]["wh"])
        d_pre_t = d_xa[:, :pdim]
        d_ctx_prev = d_xa[:, pdim:]

        new_carry = (d_ha_prev, d_ca_prev, d_hd_prev, d_cd_prev, d_ctx_prev,
                     d_prev_t.astype(f32), d_cum, d_pm_acc, d_small_acc)
        return new_carry, (g_att, g_dec, d_ctx, d_pre_t)

    carry0 = (jnp.zeros((b, h), f32), jnp.zeros((b, h), f32),
              jnp.zeros((b, h), f32), jnp.zeros((b, h), f32),
              jnp.zeros((b, memory.shape[2]), f32),
              jnp.zeros((b, t_enc), f32), jnp.zeros((b, t_enc), f32),
              jnp.zeros(pm.shape, f32),
              jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, f32),
                                     small))
    xs = (prenet_tbd, step_keys, ha_prev_s, ca_prev_s, hd_prev_s, cd_prev_s,
          ctx_prev_c, ctx_c, prev_s, cum_s, d_mels, d_gates, d_attn_out)
    carry_f, (g_att_s, g_dec_s, d_ctx_s, d_pre_s) = jax.lax.scan(
        body, carry0, xs, reverse=True)
    (_, _, _, _, _, _, _, d_pm, d_small) = carry_f
    return _bptt_weight_grads(
        cfg, params, prenet_tbd, memory, pm, mask, step_keys, attns,
        ha_s, hd_s, ctx_c,
        d_mels, d_gates, g_att_s, g_dec_s, d_ctx_s, d_pre_s,
        d_small, d_pm)


def _bptt_weight_grads(cfg, params, prenet_tbd, memory, pm, mask,
                       step_keys, attns, ha_s, hd_s, ctx_c,
                       d_mels, d_gates,
                       g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_small, d_pm):
    """Shared tail: hoisted weight-gradient contractions — one
    time-batched MXU matmul per weight instead of T_dec in-loop
    accumulator updates — and cotangent assembly.

    Shifted operand series are never materialized: the t-1-input
    contractions drop the zero t=0 term and contract SLICES
    (``dw(x_s[:-1], g_s[1:])``) — identical terms, and the (T, B, ·)
    shift-concat copies (~0.6 GB of HBM write+read at B=128: five
    (T, B, .) bf16 series) vanish.
    Concatenated inputs ([prenet|ctx_prev], [ha|ctx], [hd|ctx])
    likewise contract per part and concatenate the small (in, out)
    RESULTS instead of the big (T, B, in) operands."""
    n_mels = cfg.n_mels
    cdt = params["attn_lstm"]["wi"].dtype
    f32 = jnp.float32

    def dw(x_series, g_series):
        return jnp.einsum("tbi,tbg->ig", x_series, g_series,
                          preferred_element_type=f32)

    d_wi_a = jnp.concatenate(
        [dw(prenet_tbd.astype(cdt), g_att_s),
         dw(ctx_c[:-1], g_att_s[1:])], axis=0)   # ctx_prev_t = ctx_{t-1}
    d_wh_a = dw(ha_s[:-1], g_att_s[1:])
    d_b_a = jnp.sum(g_att_s.astype(f32), axis=(0, 1))
    d_wi_d = jnp.concatenate(
        [dw(ha_s, g_dec_s), dw(ctx_c, g_dec_s)], axis=0)
    d_wh_d = dw(hd_s[:-1], g_dec_s[1:])
    d_b_d = jnp.sum(g_dec_s.astype(f32), axis=(0, 1))
    d_out_s = jnp.concatenate([d_mels, d_gates[..., None]], axis=-1)
    d_out_c = d_out_s.astype(cdt)
    d_w_heads = jnp.concatenate(
        [dw(hd_s, d_out_c), dw(ctx_c, d_out_c)], axis=0)
    d_b_heads = jnp.sum(d_out_s, axis=(0, 1))

    # d_memory: fp32 context path (the encoder's whole gradient signal) +
    # the processed-memory path handled by the caller through d_pm.
    d_memory = jnp.einsum("tbs,tbd->bsd", attns, d_ctx_s,
                          preferred_element_type=f32)

    d_attention = dict(d_small)
    d_attention["memory"] = jax.tree_util.tree_map(
        jnp.zeros_like, params["attention"]["memory"])
    d_params = {
        "attention": d_attention,
        "attn_lstm": {"wi": d_wi_a, "wh": d_wh_a, "bi": d_b_a, "bh": d_b_a},
        "dec_lstm": {"wi": d_wi_d, "wh": d_wh_d, "bi": d_b_d, "bh": d_b_d},
        "proj": {"w": d_w_heads[:, :n_mels], "b": d_b_heads[:n_mels]},
        "gate": {"w": d_w_heads[:, n_mels:], "b": d_b_heads[n_mels:]},
    }
    d_params = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype),
                                      d_params, params)
    return (d_params, d_pre_s.astype(prenet_tbd.dtype),
            d_memory.astype(memory.dtype), d_pm.astype(pm.dtype),
            _float0(mask), _float0(step_keys))


def _bwd_chain_mega(cfg, params, memory, step_keys, attns,
                    ha_s, ca_s, cd_s,
                    prev_s, cum_s, qsum_s, acts_saved, d_mels,
                    d_gates, d_attn_out, masks_saved=None):
    """Reverse dx chain via the Pallas kernel + hoisted attention-weight
    gradients (see ops/decoder_bwd_kernel.py for the division of labor).
    ``qsum_s`` (T, B, T_enc*A) is the forward kernel's saved attention
    energy pre-activations — the entire attention-energy residual;
    ``acts_saved`` the saved pre-activation gate stacks (aa_s, ad_s),
    each (T, B, 4H) — removing the reverse kernel's forward matmul
    recompute (activations re-derived in fp32 in-kernel).

    Returns (g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_small, d_pm) — the
    exact quantities the reverse scan's carry/emissions produce."""
    from .decoder_bwd_kernel import decoder_bwd_chain_mega
    from .decoder_train_kernel import build_wband

    t_dec, b, _ = ha_s.shape
    t_enc = memory.shape[1]
    adim = cfg.attention_dim
    kloc = cfg.location_kernel_size
    att = params["attention"]
    cdt = params["attn_lstm"]["wi"].dtype
    f32 = jnp.float32
    kp = t_enc + kloc - 1
    ta = t_enc * adim
    lpad = (kloc - 1) // 2

    if masks_saved is not None:
        mka_s, mkd_s = masks_saved     # forward's draws, saved as residuals
    else:
        mka_s, mkd_s = _step_dropout_masks(cfg, step_keys, b,
                                           cfg.decoder_rnn_dim)
    wband = build_wband(att, t_enc, adim, kloc, cdt)

    d_out_s = jnp.concatenate([d_mels, d_gates[..., None]],
                              axis=-1).astype(f32)

    aa_s, ad_s = acts_saved
    (g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_qsum_s, d_pq_s, dv_b, dpm_b,
     scal) = decoder_bwd_chain_mega(
        cfg, params, wband, memory, mka_s, mkd_s,
        aa_s, ad_s, ca_s, cd_s, attns, qsum_s,
        d_out_s, d_attn_out.astype(f32))

    # ---- hoisted attention-weight gradients (single time-batched
    # contractions over the kernel's emitted d_qsum/d_pq series) ----
    scale = att["energy_scale"].astype(f32)
    # d_pm accumulated IN-kernel (fp32, pre-rounding) — no stream re-read
    d_pm = dpm_b.reshape(b, t_enc, adim)
    d_qw = jnp.einsum("tbh,tba->ha", ha_s.astype(f32), d_pq_s,
                      preferred_element_type=f32)
    zpad = lambda x: jnp.pad(
        x, ((0, 0), (0, 0), (lpad, kloc - 1 - lpad)))
    prevcat_s = jnp.concatenate([zpad(prev_s), zpad(cum_s)],
                                axis=-1).astype(cdt)      # (T, B, 2P)
    d_wband = jnp.einsum("tbp,tbq->pq", prevcat_s, d_qsum_s,
                         preferred_element_type=f32)      # (2P, T*A)
    # fold the band diagonals back to the composed conv weights, then
    # chain-rule through comp = wl @ wld
    d_band = d_wband.reshape(2, kp, t_enc, adim)
    tt = jnp.arange(t_enc)
    d_comp = jnp.stack(
        [jnp.sum(d_band[c][k + tt, tt, :], axis=0)
         for c in range(2) for k in range(kloc)])         # (2K, A)
    lw = att["location_conv"]["w"]
    wl = jnp.concatenate([lw[:, 0, :], lw[:, 1, :]],
                         axis=1).T.astype(f32)            # (2K, F)
    wld = att["location_dense"]["w"].astype(f32)
    d_wl = jnp.dot(d_comp, wld.T)                         # (2K, F)
    d_wld = jnp.dot(wl.T, d_comp)                         # (F, A)
    d_lw = jnp.stack([d_wl[:kloc].T, d_wl[kloc:].T], axis=1)  # (F, 2, K)
    d_small = {
        "query": {"w": d_qw},
        "location_conv": {"w": d_lw},
        "location_dense": {"w": d_wld},
        "v": {"w": jnp.sum(dv_b, axis=0)[:, None],
              "b": scal[1][None] * scale},
        "energy_scale": scal[0],
    }
    return g_att_s, g_dec_s, d_ctx_s, d_pre_s, d_small, d_pm


decoder_scan_bptt.defvjp(_bptt_fwd, _bptt_bwd)
