"""Whole-decode Pallas megakernel: the autoregressive loop in ONE kernel.

The autoregressive decode (reference hot loop: src/model.py:299-333) is
HBM-bandwidth-bound, not compute-bound: every `lax.while_loop` step of the
XLA path re-streams all ~18 M decoder parameters (36 MB bf16 / 72 MB
fp32) from HBM to compute ~2.3 M MACs per batch item — measured
~44 µs/step at batch 1 where the weight stream alone is the speed of
light.  This kernel inverts the dataflow: ONE `pallas_call` whose grid is
the time axis (TPU grid steps execute sequentially on a core), with

  * every weight matrix + the encoder memory/processed-memory as
    constant-`index_map` blocks — Mosaic loads them into VMEM once and
    keeps them resident across all grid steps (the scratch-carry +
    resident-operand pattern, see /opt/skills/guides/pallas_guide.md);
  * the recurrent state (both LSTM h/c, the attention context, the
    previous/cumulative alignments, the fed-back mel frame) in VMEM
    scratch, never touching HBM;
  * per-step HBM traffic reduced to the outputs: one (B, 81) frame row
    and one (B, T_enc) alignment row;
  * the gate-based early exit of `decoder_infer`'s while_loop mapped to
    an SMEM stop flag: once the stop condition fires, the remaining grid
    steps are predicated down to cheap zero-fill writes (µs each), so
    early stops cost what they cost in the while_loop — without giving
    up weight residency.

Numerical contract: mirrors `models/decoder.py::decode_step` in eval mode
(linear/LSTM matmuls consume the compute dtype and accumulate fp32; the
attention tail casts qsum to the compute dtype, then runs tanh/energies/
softmax in fp32; the context is fp32-accumulated from the compute-dtype
memory — the `ops/attention_kernel.py` policy).  The location-sensitive
attention is fully BATCHED via the banded-matmul formulation the train
kernel proves out (ops/decoder_train_kernel.py::build_wband): the
composed location-conv + location-dense map is a precomputed band
matrix, so the whole batch's location features are ONE
(B, 2*(T+K-1)) @ (2*(T+K-1), T*adim) MXU matmul — identical math to
`layers.conv1d_apply`'s 'same'-padded conv followed by the dense layer.
This replaced r3's statically-unrolled per-item middle, which capped
the kernel at B<=8; the batched kernel engages to serving-scale batches
(B=64 at the reference dims) bounded only by the VMEM estimate.

Exact while_loop bookkeeping is preserved: `stop_mode` "any"/"all",
`drop_first_frame` (the reference's diagnostic-step quirk), the traced
`forced_stop_at` instrument, per-item `frame_ends`, and the post-stop
buffer contents (zero mels/aligns, -1e9 gate logits).

Enabled via ModelConfig.decoder_megakernel / TACOTRON2_MEGA_DECODER=1/0;
`decoder_infer` falls back to the while_loop path on CPU or when
disabled.  Parity pinned in tests/test_megakernel.py.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig

_NEG = -1e9


_VMEM_BUDGET = 100 * 1024 * 1024   # leave headroom under the 128 MiB VMEM


def _vmem_estimate(cfg: ModelConfig, b: int, t_enc: int,
                   bytes_per_weight: int) -> int:
    """Rough resident-VMEM footprint of the megakernel (bytes)."""
    t_enc = -(-t_enc // 128) * 128      # kernel lane-pads the encoder axis
    h = cfg.decoder_rnn_dim
    adim = cfg.attention_dim
    in_dims = (cfg.prenet_dim + cfg.encoder_embedding_dim + h
               + h + cfg.encoder_embedding_dim + h)
    weights = in_dims * 4 * h + (h + cfg.encoder_embedding_dim) * 128
    # banded location matrix (resident) — the price of the batched middle
    wband = 2 * (t_enc + cfg.location_kernel_size - 1) * t_enc * adim
    per_item = (t_enc * cfg.encoder_embedding_dim * bytes_per_weight
                + t_enc * adim * 4                    # pm fp32
                + t_enc * adim * (bytes_per_weight + 8)  # qsum cdt + th/prod
                + t_enc * 4 * 4                       # negmask/prev/cum/align
                + 6 * h * 4)                          # carries + activations
    return (weights + wband) * bytes_per_weight + b * per_item


def megakernel_enabled(cfg: ModelConfig, b: int = 1, t_enc: int = 128,
                       bytes_per_weight: int = 4,
                       stop_mode: str = "any") -> bool:
    """Route eval-mode decode through the megakernel?  Env kill-switch
    TACOTRON2_MEGA_DECODER overrides the config; TPU backends only, and
    only when the resident working set fits VMEM (large batches fall
    back to the while_loop path, which is batch-amortized anyway).

    Under a registered data-only mesh (ops/meshing.py) the kernel
    shard_maps over the ``data`` axis — each core keeps the full weights
    VMEM-resident and decodes its LOCAL batch shard to per-shard gate
    stops; requires ``stop_mode="all"`` (per-item stopping semantics,
    see the mesh note in the body).  TP meshes take the while_loop path
    (tensor parallelism shards the very weights this kernel keeps
    resident).  A cleared config is AUTHORITATIVE: the env force-flag
    can only enable the kernel where the config allows it."""
    if not bool(getattr(cfg, "decoder_megakernel", True)):
        return False
    flag = os.environ.get("TACOTRON2_MEGA_DECODER")
    if flag is not None and flag in ("0", "false", "no"):
        return False
    if jax.default_backend() != "tpu":
        return False
    from .meshing import data_axis_size, mesh_is_data_only
    n = data_axis_size()
    if n > 1:
        # Mesh composition (r4): the kernel shard_maps over the data
        # axis with PER-SHARD gate-stop semantics.  Sound only under
        # stop_mode="all" — each item decodes to its OWN gate stop, so
        # per-item frames and frame_ends are identical to the global
        # program; only the garbage region past each item's end differs
        # (zeros vs stale decode frames), and every consumer masks by
        # frame_ends.  Under "any" the FIRST gate anywhere ends the
        # whole batch, which per-shard stopping would change — that
        # path (batch-1 latency) keeps the while_loop under a mesh.
        if stop_mode != "all" or not mesh_is_data_only() or b % n != 0:
            return False
        b = b // n
    # Batched banded-matmul middle (r4): no hard batch cap — the VMEM
    # estimate is the gate (bf16 weights engage through B=128 at the
    # reference dims; fp32 through B=16).  r3's unrolled middle capped
    # this at b=8.  Estimate at the SUBLANE-PADDED batch the kernel will
    # actually compile (decoder_infer_mega pads per-shard rows to the
    # 8-sublane tile) so a batch near the boundary falls back to the
    # while_loop instead of tripping the Mosaic VMEM limit.
    b = max(8, -(-b // 8) * 8)
    if _vmem_estimate(cfg, b, t_enc, bytes_per_weight) < _VMEM_BUDGET:
        return True
    _warn_vmem_falloff(b, t_enc, bytes_per_weight,
                       _vmem_estimate(cfg, b, t_enc, 2) < _VMEM_BUDGET)
    return False


@functools.lru_cache(maxsize=64)
def _warn_vmem_falloff(b_padded: int, t_enc: int, bytes_per_weight: int,
                       bf16_would_fit: bool) -> None:
    """One-line warning when the VMEM gate silently falls a decode off
    the megakernel onto the ~2.5x-slower while_loop program (VERDICT r4
    item 7: fp32 weights at B>16 took the fallback with no signal).
    lru_cache dedupes per (padded-batch, t_enc, dtype) config; fires at
    trace time, i.e. once per compiled program."""
    import logging
    alt = ("; casting params to bf16 (models.tacotron2.cast_params_bf16) "
           "re-engages the megakernel at this batch"
           if bf16_would_fit and bytes_per_weight == 4 else "")
    logging.getLogger("tacotron2_tpu").warning(
        "decoder megakernel VMEM gate: padded batch %d x t_enc %d with "
        "%d-byte weights exceeds the %d MiB budget -> decode runs the "
        "while_loop program (batch-amortized but ~2.5x slower per step "
        "at large B; see BASELINE.md engage-window table)%s",
        b_padded, t_enc, bytes_per_weight, _VMEM_BUDGET // (1024 * 1024),
        alt)


def _kernel(drop_first: bool, stop_mode: str, max_steps: int, n_mels: int,
            h: int, pdim: int, edim: int, adim: int, kloc: int,
            # refs
            fscal, iscal,
            pw1, pw2, wi_a, wh_a, b_a, wi_d, wh_d, b_d,
            wq, wband, v3, w_heads, b_heads,
            mem, pm, negmask,
            frames_ref, aligns_ref, ends_ref, nf_ref,
            h_att, c_att, h_dec, c_dec, ctx_scr, prev_scr, cum_scr,
            mel_scr, done_scr, end_scr, flags):
    t = pl.program_id(0)
    n_steps = pl.num_programs(0)
    b = mel_scr.shape[0]
    t_enc = prev_scr.shape[1]
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
        mel_scr[:] = jnp.zeros_like(mel_scr)
        done_scr[:] = jnp.zeros_like(done_scr)
        end_scr[:] = jnp.full_like(end_scr, max_steps)
        flags[0] = 0   # stop
        flags[1] = 0   # n_frames

    # In non-drop mode the while_loop runs exactly max_steps bodies; the
    # kernel's extra last grid step only finalizes the outputs.
    active = jnp.logical_and(
        flags[0] == 0,
        True if drop_first else t < max_steps)

    @pl.when(active)
    def _():
        # ---- prenet (eval mode: no dropout) ----
        x0 = mel_scr[:].astype(cdt)
        p1 = jax.nn.relu(jnp.dot(x0, pw1[:], preferred_element_type=f32))
        p2 = jax.nn.relu(jnp.dot(p1.astype(cdt), pw2[:],
                                 preferred_element_type=f32))

        # ---- attention LSTM ----
        xa = jnp.concatenate([p2, ctx_scr[:]], axis=-1).astype(cdt)
        ga = (jnp.dot(xa, wi_a[:], preferred_element_type=f32)
              + jnp.dot(h_att[:].astype(cdt), wh_a[:],
                        preferred_element_type=f32) + b_a[:])
        ia = jax.nn.sigmoid(ga[:, :h])
        fa = jax.nn.sigmoid(ga[:, h:2 * h])
        gga = jnp.tanh(ga[:, 2 * h:3 * h])
        oa = jax.nn.sigmoid(ga[:, 3 * h:])
        ca_new = fa * c_att[:] + ia * gga
        ha_new = oa * jnp.tanh(ca_new)
        h_att[:] = ha_new
        c_att[:] = ca_new

        # ---- banded-matmul location-sensitive attention ----
        # Whole-batch formulation (ops/decoder_train_kernel.py): the
        # composed location conv + dense layer is the precomputed band
        # matrix ``wband``, so location features for ALL items are one
        # (B, 2P) @ (2P, T*adim) MXU matmul; tanh/energy/softmax/context
        # batch as (B, T, ...) ops.
        pq = jnp.dot(ha_new.astype(cdt), wq[:],
                     preferred_element_type=f32)              # (B, adim)
        lpad = (kloc - 1) // 2
        zl = jnp.zeros((b, lpad), f32)
        zr = jnp.zeros((b, kloc - 1 - lpad), f32)
        prevcat = jnp.concatenate(
            [zl, prev_scr[:], zr, zl, cum_scr[:], zr], axis=-1)
        loc2 = jnp.dot(prevcat.astype(cdt), wband[:],
                       preferred_element_type=f32)            # (B, T*A)
        qsum = (pq[:, None, :] + pm[:]
                + loc2.reshape(b, t_enc, adim)).astype(cdt)
        th = jnp.tanh(qsum.astype(f32))                       # (B, T, A)
        e = jnp.sum(th * v3[:], axis=-1)                      # (B, T)
        e = (e + fscal[1]) * fscal[2] + negmask[:]
        m = jnp.max(e, axis=-1, keepdims=True)
        ex = jnp.exp(e - m)
        attn = ex / jnp.sum(ex, axis=-1, keepdims=True)       # (B, T)
        ctx = jnp.sum(jnp.broadcast_to(attn[:, :, None], mem.shape)
                      * mem[:].astype(f32), axis=1)           # (B, D)
        prev_scr[:] = attn
        cum_scr[:] = cum_scr[:] + attn
        ctx_scr[:] = ctx

        # ---- decoder LSTM ----
        xd = jnp.concatenate([ha_new, ctx], axis=-1).astype(cdt)
        gd = (jnp.dot(xd, wi_d[:], preferred_element_type=f32)
              + jnp.dot(h_dec[:].astype(cdt), wh_d[:],
                        preferred_element_type=f32) + b_d[:])
        id_ = jax.nn.sigmoid(gd[:, :h])
        fd = jax.nn.sigmoid(gd[:, h:2 * h])
        ggd = jnp.tanh(gd[:, 2 * h:3 * h])
        od = jax.nn.sigmoid(gd[:, 3 * h:])
        cd_new = fd * c_dec[:] + id_ * ggd
        hd_new = od * jnp.tanh(cd_new)
        h_dec[:] = hd_new
        c_dec[:] = cd_new

        # ---- fused projection + gate heads ----
        proj_in = jnp.concatenate([hd_new, ctx], axis=-1).astype(cdt)
        out = jnp.dot(proj_in, w_heads[:],
                      preferred_element_type=f32) + b_heads[:]
        frames_ref[0] = out
        aligns_ref[0] = attn
        mel_scr[:] = out[:, :n_mels]

        # ---- while_loop bookkeeping (decoder_infer semantics) ----
        # recorded-frame count after this step: drop-first discards the
        # t=0 frame, so n_out = t there and t+1 otherwise.
        n_out = t if drop_first else t + 1
        gate = out[:, n_mels:]                            # (B, 1)
        fired = jnp.logical_and(n_out > 1,
                                jax.nn.sigmoid(gate) > fscal[0])
        # while_loop parity: the loop body only ever evaluates the forced
        # stop with n_out >= 1 (the dropped diagnostic step is outside the
        # loop), so forced_stop_at <= 0 must behave like 1, not fire at the
        # dropped t=0 step here.
        fired = jnp.logical_or(
            fired, jnp.logical_and(n_out >= 1, n_out >= iscal[0]))
        was_done = done_scr[:, :1] > 0
        newly = jnp.logical_and(fired, jnp.logical_not(was_done))
        end_scr[:, :1] = jnp.where(newly, n_out, end_scr[:, :1])
        now_done = jnp.logical_or(was_done, fired)
        done_scr[:, :1] = now_done.astype(jnp.int32)

        @pl.when(n_out > 0)
        def _():
            flags[1] = n_out
        if stop_mode == "any":
            stop = jnp.any(now_done)
        else:
            stop = jnp.all(now_done)
        flags[0] = stop.astype(jnp.int32)

    @pl.when(jnp.logical_not(active))
    def _():
        # post-stop rows keep the while_loop's untouched-buffer contents
        frames_ref[0] = jnp.concatenate(
            [jnp.zeros((b, n_mels), f32), jnp.full((b, 1), _NEG, f32)],
            axis=-1)
        aligns_ref[0] = jnp.zeros((b, t_enc), f32)

    @pl.when(t == n_steps - 1)
    def _():
        nf = flags[1]
        ends_ref[:, :1] = jnp.minimum(end_scr[:, :1], nf)
        nf_ref[0] = nf


def decoder_infer_mega(params: Dict[str, Any], cfg: ModelConfig,
                       memory: jnp.ndarray, max_steps: int,
                       gate_threshold: float,
                       drop_first_frame: bool = True,
                       mask: Optional[jnp.ndarray] = None,
                       stop_mode: str = "any",
                       forced_stop_at: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                  jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for `decoder_infer` (same signature/returns),
    running the whole autoregressive decode as one Pallas program."""
    b, t_enc_in, _ = memory.shape
    h = cfg.decoder_rnn_dim
    n_mels = cfg.n_mels
    adim = cfg.attention_dim
    kloc = cfg.location_kernel_size
    att = params["attention"]
    cdt = params["attn_lstm"]["wi"].dtype
    f32 = jnp.float32

    # Tile-align the batched middle's layouts — Mosaic rejects lane
    # reductions at unaligned widths and on single-row vectors ("Not
    # implemented: Offset change"):
    #   * LANE axis (T_enc): softmax sum / context contraction reduce
    #     over it, and callers like the quality harness decode with
    #     EXACT text lengths (22 tokens).  Pad to the 128-lane tile;
    #     padding is attention-masked (-1e9), outputs exact, alignments
    #     slice back.
    #   * SUBLANE axis (B): batch-1 latency decode puts ONE row in every
    #     (B, T) vector.  Pad to the 8-sublane tile by REPEATING row 0 —
    #     copies decode identically, so "any"/"all" stop bookkeeping is
    #     unchanged — and slice every output back.  (r3's column-major
    #     per-item kernel dodged this; the batched formulation pays one
    #     tile of redundant rows instead of the per-item unroll.)
    b_in = b
    from .meshing import data_axis_size
    n_ax = data_axis_size()
    # per-SHARD rows must hit the 8-sublane tile too
    unit = 8 * n_ax if (n_ax > 1 and b % n_ax == 0) else 8
    b = max(unit, -(-b // unit) * unit)
    if b != b_in:
        reps = jnp.concatenate(
            [memory] + [memory[:1]] * (b - b_in), axis=0)
        memory = reps
        if mask is not None:
            mask = jnp.concatenate(
                [mask] + [mask[:1]] * (b - b_in), axis=0)
    t_enc = -(-t_enc_in // 128) * 128
    if t_enc != t_enc_in:
        memory = jnp.pad(memory, [(0, 0), (0, t_enc - t_enc_in), (0, 0)])
        pad_mask = jnp.ones((b, t_enc), bool).at[:, :t_enc_in].set(False)
        mask = (pad_mask if mask is None
                else pad_mask.at[:, :t_enc_in].set(mask))

    from ..models.attention import precompute_memory
    pm = precompute_memory(att, memory).astype(f32)       # (B, T, adim)

    # weight prep (tiny vs the decode itself; XLA hoists what it can)
    pw1 = params["prenet"][0]["w"].astype(cdt)
    pw2 = params["prenet"][1]["w"].astype(cdt)
    b_a = (params["attn_lstm"]["bi"]
           + params["attn_lstm"]["bh"]).astype(f32)[None, :]
    b_d = (params["dec_lstm"]["bi"]
           + params["dec_lstm"]["bh"]).astype(f32)[None, :]
    from .decoder_train_kernel import build_wband
    wband = build_wband(att, t_enc, adim, kloc, cdt)      # (2P, T*adim)
    v3 = att["v"]["w"][:, 0].astype(f32)[None, None, :]   # (1, 1, adim)
    w_heads = jnp.concatenate([params["proj"]["w"], params["gate"]["w"]],
                              axis=1).astype(cdt)         # (1536, M+1)
    b_heads = jnp.concatenate([params["proj"]["b"],
                               params["gate"]["b"]]).astype(f32)[None, :]
    negmask = (jnp.where(mask, _NEG, 0.0).astype(f32)
               if mask is not None else jnp.zeros((b, t_enc), f32))
    fscal = jnp.stack([jnp.asarray(gate_threshold, f32),
                       att["v"]["b"][0].astype(f32),
                       att["energy_scale"].astype(f32)])
    never = jnp.int32(max_steps + 2)
    iscal = (jnp.asarray(forced_stop_at, jnp.int32).reshape(1)
             if forced_stop_at is not None else never.reshape(1))

    s1 = max_steps + 1
    const = lambda *nd: pl.BlockSpec(nd[0], lambda t: (0,) * len(nd[0]),
                                     memory_space=pltpu.VMEM)
    row = lambda shape: pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) *
                                     len(shape), memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, drop_first_frame, stop_mode,
                             max_steps, n_mels, h, cfg.prenet_dim,
                             cfg.encoder_embedding_dim, adim, kloc)

    def _call(fscal_, iscal_, pw1_, pw2_, wia_, wha_, ba_, wid_, whd_, bd_,
              wq_, wband_, v3_, wh_, bh_, mem_, pm_, nm_):
        # Batch size read from the (possibly shard-local) operand so the
        # same closure serves both the single-core call and the
        # shard_map-per-core call (mesh composition below).
        bl = mem_.shape[0]
        frames, aligns, ends, _nf = pl.pallas_call(
            kern,
            grid=(s1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),        # fscal
                pl.BlockSpec(memory_space=pltpu.SMEM),        # iscal
                const((n_mels, cfg.prenet_dim)),
                const((cfg.prenet_dim, cfg.prenet_dim)),
                const((cfg.prenet_dim + cfg.encoder_embedding_dim, 4 * h)),
                const((h, 4 * h)),
                const((1, 4 * h)),
                const((h + cfg.encoder_embedding_dim, 4 * h)),
                const((h, 4 * h)),
                const((1, 4 * h)),
                const((h, adim)),                             # wq
                const((2 * (t_enc + kloc - 1), t_enc * adim)),  # wband
                const((1, 1, adim)),                          # v3
                const((h + cfg.encoder_embedding_dim, n_mels + 1)),
                const((1, n_mels + 1)),
                const((bl, t_enc, cfg.encoder_embedding_dim)),  # memory
                const((bl, t_enc, adim)),                     # pm
                const((bl, t_enc)),                           # negmask
            ],
            out_specs=[
                row((bl, n_mels + 1)),
                row((bl, t_enc)),
                pl.BlockSpec((bl, 1), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s1, bl, n_mels + 1), f32),
                jax.ShapeDtypeStruct((s1, bl, t_enc), f32),
                jax.ShapeDtypeStruct((bl, 1), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bl, h), f32),        # h_att
                pltpu.VMEM((bl, h), f32),        # c_att
                pltpu.VMEM((bl, h), f32),        # h_dec
                pltpu.VMEM((bl, h), f32),        # c_dec
                pltpu.VMEM((bl, cfg.encoder_embedding_dim), f32),
                pltpu.VMEM((bl, t_enc), f32),    # prev
                pltpu.VMEM((bl, t_enc), f32),    # cum
                pltpu.VMEM((bl, n_mels), f32),   # fed-back mel
                pltpu.VMEM((bl, 128), jnp.int32),  # done
                pltpu.VMEM((bl, 128), jnp.int32),  # item_end
                pltpu.SMEM((2,), jnp.int32),    # [stop, n_frames]
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET),
            interpret=jax.default_backend() != "tpu",
        )(fscal_, iscal_, pw1_, pw2_, wia_, wha_, ba_, wid_, whd_, bd_,
          wq_, wband_, v3_, wh_, bh_, mem_, pm_, nm_)
        # The kernel's SMEM n_frames is shard-local; the global count is
        # recovered as max(frame_ends) below (an identity in every mode:
        # ends are clamped to n_frames in-kernel), so _nf is dropped.
        return frames, aligns, ends

    # Mesh composition: per-shard gate stops (sound for stop_mode="all",
    # which megakernel_enabled requires under a mesh — see its docstring).
    from .meshing import shard_over_batch
    run = shard_over_batch(_call,
                           in_batch_dims=(None,) * 15 + (0, 0, 0),
                           out_batch_dims=(1, 1, 0))
    frames, aligns, ends = run(
        fscal, iscal, pw1, pw2,
        params["attn_lstm"]["wi"].astype(cdt),
        params["attn_lstm"]["wh"].astype(cdt), b_a,
        params["dec_lstm"]["wi"].astype(cdt),
        params["dec_lstm"]["wh"].astype(cdt), b_d,
        att["query"]["w"].astype(cdt), wband, v3,
        w_heads, b_heads,
        memory.astype(cdt), pm, negmask)
    ends = ends[:b_in]
    nf = jnp.max(ends).astype(jnp.int32)

    sl = slice(1, None) if drop_first_frame else slice(0, max_steps)
    frames = frames[sl, :b_in]
    mels = jnp.swapaxes(frames[..., :n_mels], 0, 1)       # (B, S, n_mels)
    gates = jnp.swapaxes(frames[..., n_mels], 0, 1)       # (B, S)
    aligns_out = jnp.swapaxes(aligns[sl, :b_in], 0, 1)    # (B, S, T_enc)
    if t_enc != t_enc_in:
        aligns_out = aligns_out[..., :t_enc_in]
    return mels, gates, aligns_out, nf, ends[:, 0]
