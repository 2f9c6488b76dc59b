"""Teacher-forced decoder forward as ONE Pallas kernel (training MFU).

The split-BPTT training step's remaining cost is the two sequential
scans (ops/decoder_bptt.py); the forward scan re-streams ~36 MB (bf16)
of LSTM/attention/head weights from HBM on every one of the T_dec
(~512) steps.  Like the inference megakernel
(ops/decoder_megakernel.py), this kernel makes the time axis the Pallas
grid so every weight matrix plus the encoder memory / processed memory
stay VMEM-resident across steps, with the recurrent state in VMEM
scratch.  Per-step HBM traffic drops to the streamed inputs (the
prenetted frame + two dropout-mask rows) and the streamed outputs (the
frame/alignment rows and the O(B) stored carries the split-BPTT
backward consumes).

The location-sensitive attention runs fully batched in 2D (Mosaic has
no lane-relayout reshapes, no 3D stacks at these shapes, no batched
dots):

  * the 31-tap two-channel location conv COMPOSED with the location
    dense layer becomes one dense matmul against a precomputed BANDED
    matrix: ``loc2 (B, T*A) = [pad(prev), pad(cum)] @ WBand`` with
    ``WBand[c*P + t + k, t*A + a] = (w_conv @ w_dense)[c*K + k, a]``;
  * the (B, T*A) conv output reshapes back to (B, T, A) — a pure
    tiling reinterpretation, legal because the lane dim is a full 128
    tile — and joins the broadcast query + processed memory as 3D
    elementwise work; energies reduce over the A lanes against the
    broadcast ``v`` row; softmax runs over T lanes and the context is a
    3D broadcast-multiply + sublane reduce.

Dropout applies PRECOMPUTED 0/1 masks — generated outside with the
exact `jax.random.bernoulli` calls `models/decoder.py::decode_step`
makes, so the backward's per-step recompute (`_bptt_bwd`) sees
bit-identical masks.  Numerics mirror the fused attention tail policy
(models/attention.py): qsum cast to the compute dtype, tanh/energies/
softmax fp32, context fp32-accumulated from compute-dtype memory; the
composed conv weights add one extra reassociation, bounded by the same
bf16-class rounding the policy already accepts (grad parity pinned in
tests/test_train_kernel.py).

Integration point: `decoder_scan_bptt`'s forward (ops/decoder_bptt.py)
— the custom-VJP backward is unchanged, so gradients flow through the
existing hand-written BPTT.  Enabled on TPU under the fused-attention
policy via ModelConfig.decoder_megakernel + env TACOTRON2_MEGA_TRAIN
(kill-switch for A/B).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig

# 112 MiB of the v5e's 128 MiB VMEM: raising this from the original 100
# restored output-stream double-buffering after the gate-stack rows were
# added (B=128 measured 150.3 -> 142.8 ms/step); 120 measured no further
# gain, so 112 keeps margin for Mosaic's own transients.
_VMEM_BUDGET = 112 * 1024 * 1024


def _vmem_estimate(cfg: ModelConfig, b: int, t_enc: int, bpw: int) -> int:
    h = cfg.decoder_rnn_dim
    adim = cfg.attention_dim
    ta = t_enc * adim
    p2 = 2 * (t_enc + cfg.location_kernel_size - 1)
    in_dims = (cfg.prenet_dim + cfg.encoder_embedding_dim + h
               + h + cfg.encoder_embedding_dim + h)
    weights = (in_dims * 4 * h + (h + cfg.encoder_embedding_dim) * 128) * bpw
    attn_mats = p2 * ta * bpw
    # (the transient qsum/tanh values are buffer-reused by Mosaic and not
    # counted: B=128/T_enc=128 measures in under the budget)
    resident = b * (t_enc * cfg.encoder_embedding_dim * bpw  # memory
                    + ta * 4                                 # pm2 fp32
                    + ta * 4            # bwd kernel's resident d_pm accum
                    + t_enc * 3 * 4)                         # mask/prev/cum
    stream = b * (cfg.prenet_dim + 2 * h) * bpw * 2 \
        + b * (4 * h * 4 + t_enc * 4) * 2 \
        + 2 * b * 4 * h * bpw * 2   # pre-act gate rows (ga/gd), dbl-buff
    return weights + attn_mats + resident + stream + 8 * b * h * 4


def train_megakernel_enabled(cfg: ModelConfig, b: int, t_enc: int,
                             cdt) -> bool:
    """Use the Pallas forward for the split-BPTT scan?  Requires TPU (or
    the env force-flag, for interpret-mode tests), the fused-attention
    numerics (the backward recompute mirrors them), and the resident
    working set fitting VMEM.

    Mesh composition: under a registered kernel mesh (ops/meshing.py)
    the kernel shards over the ``data`` axis via ``jax.shard_map`` —
    each core holds the full (replicated) weights VMEM-resident and
    streams only its LOCAL batch shard, so the VMEM estimate is taken on
    the per-shard batch.  Requires a data-ONLY mesh (tensor parallelism
    shards the very weights this kernel keeps resident, so TP runs take
    the scan path, whose matmuls XLA partitions over ``model``) and the
    global batch dividing over the axis.  A cleared config is
    AUTHORITATIVE — the force-flag only applies where the config allows
    the kernel (it exists to skip the TPU-backend check for
    interpret-mode tests, not to override config gating)."""
    if not bool(getattr(cfg, "decoder_megakernel", True)):
        return False
    flag = os.environ.get("TACOTRON2_MEGA_TRAIN")
    if flag is not None:
        if flag in ("0", "false", "no"):
            return False
        # forced on (tests run the kernel in interpret mode off-TPU)
    else:
        if jax.default_backend() != "tpu":
            return False
    from ..models.attention import _fused_tail_enabled
    if not _fused_tail_enabled():
        return False
    from .meshing import data_axis_size, mesh_is_data_only
    if not mesh_is_data_only():
        return False
    n = data_axis_size()
    if b % n != 0:
        return False
    bpw = jnp.dtype(cdt).itemsize
    if _vmem_estimate(cfg, b // n, t_enc, bpw) < _VMEM_BUDGET:
        return True
    _warn_train_vmem_falloff(b // n, t_enc, bpw)
    return False


@functools.lru_cache(maxsize=64)
def _warn_train_vmem_falloff(b_shard: int, t_enc: int, bpw: int) -> None:
    """One-line warning when the VMEM gate silently falls training off
    the megakernel pair onto the ~2.5x-slower split-BPTT scan (r5:
    measured at B=128/T_enc=256 — 266 ms vs ~107 ms pair; the decode
    kernel gained the same warning for VERDICT r4 item 7).  Fires once
    per config at trace time."""
    import logging
    logging.getLogger("tacotron2_tpu").warning(
        "decoder TRAIN megakernel VMEM gate: per-shard batch %d x t_enc "
        "%d with %d-byte compute dtype exceeds the %d MiB budget -> the "
        "split-BPTT scan path runs (~2.5x slower per step at B=128; see "
        "BASELINE.md). Shrink batch/t_enc or use the bf16 policy.",
        b_shard, t_enc, bpw, _VMEM_BUDGET // (1024 * 1024))


def _kernel(n_mels: int, h: int, adim: int, kloc: int, t_enc: int,
            keep_a: float, keep_d: float,
            fscal,
            pre_ref, ma_ref, md_ref,
            wi_a, wh_a, b_a, wi_d, wh_d, b_d,
            wq, wband, v3, w_heads, b_heads,
            mem, pm3, negmask,
            frames_ref, attn_ref, ha_ref, ca_ref, hd_ref, cd_ref, qsum_ref,
            aa_ref, ad_ref,
            h_att, c_att, h_dec, c_dec, ctx_scr, prev_scr, cum_scr):
    t = pl.program_id(0)
    b = prev_scr.shape[0]
    cdt = wi_a.dtype
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        h_att[:] = jnp.zeros_like(h_att)
        c_att[:] = jnp.zeros_like(c_att)
        h_dec[:] = jnp.zeros_like(h_dec)
        c_dec[:] = jnp.zeros_like(c_dec)
        ctx_scr[:] = jnp.zeros_like(ctx_scr)
        prev_scr[:] = jnp.zeros_like(prev_scr)
        cum_scr[:] = jnp.zeros_like(cum_scr)

    # ---- attention LSTM (input: streamed prenet frame + prev context) ----
    xa = jnp.concatenate([pre_ref[0].astype(cdt),
                          ctx_scr[:].astype(cdt)], axis=-1)
    ga = (jnp.dot(xa, wi_a[:], preferred_element_type=f32)
          + jnp.dot(h_att[:].astype(cdt), wh_a[:],
                    preferred_element_type=f32) + b_a[:])
    ia = jax.nn.sigmoid(ga[:, :h])
    fa = jax.nn.sigmoid(ga[:, h:2 * h])
    gga = jnp.tanh(ga[:, 2 * h:3 * h])
    oa = jax.nn.sigmoid(ga[:, 3 * h:])
    ca_new = fa * c_att[:] + ia * gga
    ha_new = oa * jnp.tanh(ca_new)
    # inverted dropout from the precomputed 0/1 mask (x/keep * m ==
    # where(m, x/keep, 0) for finite x)
    ha_drop = (ha_new / keep_a) * ma_ref[0].astype(f32) \
        if keep_a < 1.0 else ha_new
    h_att[:] = ha_drop
    c_att[:] = ca_new

    # ---- banded-matmul location-sensitive attention ----
    pq = jnp.dot(ha_drop.astype(cdt), wq[:], preferred_element_type=f32)
    lpad = (kloc - 1) // 2
    zl = jnp.zeros((b, lpad), f32)
    zr = jnp.zeros((b, kloc - 1 - lpad), f32)
    prevcat = jnp.concatenate(
        [zl, prev_scr[:], zr, zl, cum_scr[:], zr], axis=-1)
    loc2 = jnp.dot(prevcat.astype(cdt), wband[:],
                   preferred_element_type=f32)            # (B, T*A)
    qsum = (pq[:, None, :] + pm3[:]
            + loc2.reshape(b, t_enc, adim)).astype(cdt)
    th = jnp.tanh(qsum.astype(f32))                       # (B, T, A)
    # emit qsum (already rounded to the compute dtype above — the exact
    # value tanh consumed) for the backward kernel: it re-derives
    # th = tanh(qsum) in fp32, BIT-identical to this forward's th, where
    # streaming th itself would add a second cdt rounding that zeroes
    # (1 - th^2) for near-saturated attention energies
    qsum_ref[0] = qsum.reshape(b, t_enc * adim)
    e = jnp.sum(th * v3[:], axis=-1)                      # (B, T)
    e = (e + fscal[0]) * fscal[1] + negmask[:]
    m = jnp.max(e, axis=-1, keepdims=True)
    ex = jnp.exp(e - m)
    attn = ex / jnp.sum(ex, axis=-1, keepdims=True)
    ctx = jnp.sum(jnp.broadcast_to(attn[:, :, None],
                                   mem.shape) * mem[:].astype(f32), axis=1)
    prev_scr[:] = attn
    cum_scr[:] = cum_scr[:] + attn
    ctx_scr[:] = ctx

    # ---- decoder LSTM ----
    xd = jnp.concatenate([ha_drop.astype(cdt), ctx.astype(cdt)], axis=-1)
    gd = (jnp.dot(xd, wi_d[:], preferred_element_type=f32)
          + jnp.dot(h_dec[:].astype(cdt), wh_d[:],
                    preferred_element_type=f32) + b_d[:])
    id_ = jax.nn.sigmoid(gd[:, :h])
    fd = jax.nn.sigmoid(gd[:, h:2 * h])
    ggd = jnp.tanh(gd[:, 2 * h:3 * h])
    od = jax.nn.sigmoid(gd[:, 3 * h:])
    cd_new = fd * c_dec[:] + id_ * ggd
    hd_new = od * jnp.tanh(cd_new)
    hd_drop = (hd_new / keep_d) * md_ref[0].astype(f32) \
        if keep_d < 1.0 else hd_new
    h_dec[:] = hd_drop
    c_dec[:] = cd_new

    # ---- fused heads ----
    proj_in = jnp.concatenate([hd_drop.astype(cdt), ctx.astype(cdt)],
                              axis=-1)
    out = jnp.dot(proj_in, w_heads[:],
                  preferred_element_type=f32) + b_heads[:]

    # ---- streamed outputs: frame row + alignment row + stored carries ----
    frames_ref[0] = out
    attn_ref[0] = attn
    ha_ref[0] = ha_drop.astype(cdt)
    ca_ref[0] = ca_new
    hd_ref[0] = hd_drop.astype(cdt)
    cd_ref[0] = cd_new
    # PRE-activation gate stacks for the reverse kernel: streaming these
    # removes its entire forward-gate recompute (2.28 of 5.2 GMAC/step at
    # the reference dims) plus the prenet/prev-hidden/context rows that
    # recompute consumed.  Pre-activations (not the sigmoid/tanh outputs)
    # stream in the compute dtype for the same reason qsum does above:
    # rounding an INPUT perturbs the re-derived activation by a ~2^-8
    # relative factor, while rounding the saturated OUTPUT snaps it to
    # exactly 0/1 and zeroes gradient factors like ia*(1-ia) outright
    # (fp32 post-activation streams measured +10% step time at B=128 —
    # 157.6 vs 142.8 ms — for numerics this recovers at bf16 cost).
    aa_ref[0] = ga.astype(cdt)
    ad_ref[0] = gd.astype(cdt)


def build_wband(att: Dict[str, Any], t_enc: int, adim: int,
                kloc: int, cdt):
    """Banded matrix of the composed location conv + dense layer:
    ``WBand[c*P + t + k, t*A + a] = (w_conv @ w_dense)[c*K + k, a]``."""
    f32 = jnp.float32
    lw = att["location_conv"]["w"]                        # (F, 2, K)
    wl = jnp.concatenate([lw[:, 0, :], lw[:, 1, :]], axis=1).T  # (2K, F)
    comp = jnp.dot(wl.astype(f32), att["location_dense"]["w"].astype(f32))
    p = t_enc + kloc - 1
    band = jnp.zeros((2 * p, t_enc, adim), f32)
    tt = jnp.arange(t_enc)
    for k in range(kloc):
        band = band.at[k + tt, tt, :].add(comp[k])
        band = band.at[p + k + tt, tt, :].add(comp[kloc + k])
    return band.reshape(2 * p, t_enc * adim).astype(cdt)


def decoder_fwd_train_mega(cfg: ModelConfig, params: Dict[str, Any],
                           prenet_tbd: jnp.ndarray, memory: jnp.ndarray,
                           pm: jnp.ndarray, mask: jnp.ndarray,
                           mka_s: jnp.ndarray, mkd_s: jnp.ndarray
                           ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray], Tuple]:
    """Pallas forward for `decoder_scan_bptt`: same outputs/residuals as
    `_fwd_scan` (mels/gates/attns (T,B,...) + per-step stored carries).

    Args:
        params: decoder core params ({attention, attn_lstm, dec_lstm,
            proj, gate}).
        prenet_tbd: (T_dec, B, prenet_dim) prenetted go-shifted targets.
        memory/pm/mask: as in decoder_scan_bptt.
        mka_s/mkd_s: (T_dec, B, H) bool dropout masks, generated with the
            exact bernoulli calls decode_step makes from step_keys.
    """
    t_enc = memory.shape[1]
    adim = cfg.attention_dim
    kloc = cfg.location_kernel_size
    att = params["attention"]
    cdt = params["attn_lstm"]["wi"].dtype
    f32 = jnp.float32

    b_a = (params["attn_lstm"]["bi"]
           + params["attn_lstm"]["bh"]).astype(f32)[None, :]
    b_d = (params["dec_lstm"]["bi"]
           + params["dec_lstm"]["bh"]).astype(f32)[None, :]
    wband = build_wband(att, t_enc, adim, kloc, cdt)
    v3 = att["v"]["w"][:, 0].astype(f32)[None, None, :]   # (1, 1, adim)
    w_heads = jnp.concatenate([params["proj"]["w"], params["gate"]["w"]],
                              axis=1).astype(cdt)
    b_heads = jnp.concatenate([params["proj"]["b"],
                               params["gate"]["b"]]).astype(f32)[None, :]
    negmask = jnp.where(mask, -1e9, 0.0).astype(f32)
    fscal = jnp.stack([att["v"]["b"][0].astype(f32),
                       att["energy_scale"].astype(f32)])

    from .meshing import shard_over_batch
    call = shard_over_batch(
        functools.partial(_fwd_mega_call, cfg),
        # batch dim per operand: rows streamed (T, B, .) carry it at 1,
        # resident per-item tensors at 0, weights/scalars replicated
        in_batch_dims=(None, 1, 1, 1) + (None,) * 11 + (0, 0, 0),
        out_batch_dims=(1,) * 9)
    frames, attns, ha_s, ca_s, hd_s, cd_s, qsum_s, aa_s, ad_s = call(
        fscal, prenet_tbd.astype(cdt), mka_s.astype(cdt), mkd_s.astype(cdt),
        params["attn_lstm"]["wi"].astype(cdt),
        params["attn_lstm"]["wh"].astype(cdt), b_a,
        params["dec_lstm"]["wi"].astype(cdt),
        params["dec_lstm"]["wh"].astype(cdt), b_d,
        att["query"]["w"].astype(cdt), wband, v3,
        w_heads, b_heads,
        memory.astype(cdt), pm.astype(f32), negmask)

    n_mels = cfg.n_mels
    mels = frames[..., :n_mels]
    gates = frames[..., n_mels]
    return (mels, gates, attns), (ha_s, ca_s, hd_s, cd_s, qsum_s, aa_s,
                                  ad_s)


def _fwd_mega_call(cfg: ModelConfig, fscal, prenet_tbd, mka_s, mkd_s,
                   wi_a, wh_a, b_a, wi_d, wh_d, b_d, wq, wband, v3,
                   w_heads, b_heads, memory, pm, negmask):
    """The pallas_call itself; all shapes derive from the (possibly
    shard_map-local) operand shapes so the same body serves single-core
    and per-shard invocation."""
    t_dec, b, _ = prenet_tbd.shape
    t_enc = memory.shape[1]
    h = cfg.decoder_rnn_dim
    n_mels = cfg.n_mels
    adim = cfg.attention_dim
    kloc = cfg.location_kernel_size
    cdt = wi_a.dtype
    f32 = jnp.float32
    p2 = 2 * (t_enc + kloc - 1)
    ta = t_enc * adim

    const = lambda shape: pl.BlockSpec(
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)
    row = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda t: (t,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, n_mels, h, adim, kloc, t_enc,
                             1.0 - cfg.p_attention_dropout,
                             1.0 - cfg.p_decoder_dropout)
    ta = t_enc * adim
    (frames, attns, ha_s, ca_s, hd_s, cd_s, qsum_s, aa_s,
     ad_s) = pl.pallas_call(
        kern,
        grid=(t_dec,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # fscal
            row((b, cfg.prenet_dim)),                     # prenet frames
            row((b, h)),                                  # attn dropout mask
            row((b, h)),                                  # dec dropout mask
            const((cfg.prenet_dim + cfg.encoder_embedding_dim, 4 * h)),
            const((h, 4 * h)),
            const((1, 4 * h)),
            const((h + cfg.encoder_embedding_dim, 4 * h)),
            const((h, 4 * h)),
            const((1, 4 * h)),
            const((h, adim)),                             # wq
            const((p2, ta)),                              # wband
            const((1, 1, adim)),                          # v3
            const((h + cfg.encoder_embedding_dim, n_mels + 1)),
            const((1, n_mels + 1)),
            const((b, t_enc, cfg.encoder_embedding_dim)),
            const((b, t_enc, adim)),                      # pm3 fp32
            const((b, t_enc)),
        ],
        out_specs=[
            row((b, n_mels + 1)),
            row((b, t_enc)),
            row((b, h)), row((b, h)), row((b, h)), row((b, h)),
            row((b, ta)),
            row((b, 4 * h)), row((b, 4 * h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_dec, b, n_mels + 1), f32),
            jax.ShapeDtypeStruct((t_dec, b, t_enc), f32),
            jax.ShapeDtypeStruct((t_dec, b, h), cdt),
            jax.ShapeDtypeStruct((t_dec, b, h), f32),
            jax.ShapeDtypeStruct((t_dec, b, h), cdt),
            jax.ShapeDtypeStruct((t_dec, b, h), f32),
            jax.ShapeDtypeStruct((t_dec, b, ta), cdt),
            jax.ShapeDtypeStruct((t_dec, b, 4 * h), cdt),
            jax.ShapeDtypeStruct((t_dec, b, 4 * h), cdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), f32),
            pltpu.VMEM((b, h), f32),
            pltpu.VMEM((b, h), f32),
            pltpu.VMEM((b, h), f32),
            pltpu.VMEM((b, cfg.encoder_embedding_dim), f32),
            pltpu.VMEM((b, t_enc), f32),
            pltpu.VMEM((b, t_enc), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=jax.default_backend() != "tpu",
    )(fscal, prenet_tbd, mka_s, mkd_s,
      wi_a, wh_a, b_a, wi_d, wh_d, b_d, wq, wband, v3,
      w_heads, b_heads, memory, pm, negmask)
    return frames, attns, ha_s, ca_s, hd_s, cd_s, qsum_s, aa_s, ad_s
