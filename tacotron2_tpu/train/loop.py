"""Training driver: epochs, validation, checkpoints, debug-overfit mode.

The host-side orchestration around the jitted train step — the counterpart
of the reference's ``train()`` routine (reference: train.py:287-588) with
the same observable behavior:

  * postnet frozen (bypassed) for the first 3000 steps (train.py:336-341),
  * console log every 200 steps + timestamped training_log.txt
    (train.py:527-535),
  * step checkpoint every 5000 steps, per-epoch checkpoint, best-on-val
    checkpoint (train.py:537-582),
  * validation: teacher-forced mel/gate loss + attention entropy
    (train.py:252-277),
  * alignment heatmap PNG per epoch (train.py:584-587),
  * debug overfit mode: single batch of 8, success when mel L1 < 1.0,
    alignment PNG every 10 iterations, model + batch + autoregressive
    inference artifact export (train.py:396-486).

TPU-native differences: device auto-pick / AMP / GradScaler are gone (bf16
on TPU needs no loss scaling); batches are static-shape bucketed; the whole
step (fwd+bwd+clip+Adam) is one XLA program.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data import BatchLoader, TextMelDataset, collate
from ..dsp.wav import save_wav
from ..models import init_projection_bias, tacotron2_infer_jit
from ..text import sequence_to_text
from ..utils.logging import TrainingLogger
from ..utils.profiling import StepTimer
from ..utils.plotting import save_alignment_plot
from .checkpoint import load_any_checkpoint, save_checkpoint
from .optim import make_optimizer
from .state import TrainState, create_train_state
from .step import eval_step, train_step, train_step_accum
from .loss import LossOutput


def _fmt_losses(l: LossOutput) -> str:
    return (f"Mel {float(l.mel):.4f} Gate {float(l.gate):.4f} "
            f"KL {float(l.attention_kl):.4f} w {float(l.attention_weight):.2f} "
            f"σ {float(l.sigma):.2f}")


def _host_local(x) -> np.ndarray:
    """Array -> host numpy; for multi-process global arrays (not fully
    addressable) returns the concatenation of this host's shards."""
    try:
        return np.asarray(x)
    except Exception:
        return np.concatenate(
            [np.asarray(s.data) for s in x.addressable_shards], axis=0)


def validate(state: TrainState, loader: BatchLoader, cfg: Config,
             sigma_warmup_steps: int, place=None) -> Dict[str, float]:
    """Mean validation mel/gate loss + attention entropy
    (reference: train.py:252-277).  ``place`` optionally maps host batches
    onto a device mesh (data-parallel validation)."""
    total_mel = total_gate = total_ent = 0.0
    count = 0
    for batch in loader:
        if place is not None:
            batch = place(batch)
        losses, _, entropy = eval_step(state, batch, cfg=cfg,
                                       sigma_warmup_steps=sigma_warmup_steps)
        total_mel += float(losses.mel)
        total_gate += float(losses.gate)
        # In-graph entropy: a GLOBAL batch mean under multi-host GSPMD,
        # consistent with the mel/gate means next to it.
        total_ent += float(entropy)
        count += 1
    if count == 0:
        return {"mel": float("nan"), "gate": float("nan"), "entropy": 0.0,
                "batches": 0}
    return {"mel": total_mel / count, "gate": total_gate / count,
            "entropy": total_ent / count, "batches": count}


def export_debug_inference(state: TrainState, batch: Dict[str, np.ndarray],
                           cfg: Config, export_dir: str) -> None:
    """Autoregressive inference on the overfit batch + artifact export
    (reference: train.py:39-124): alignment PNG, per-sample gate-trimmed
    mels, phoneme txt, Griffin-Lim WAV, pairs.csv."""
    os.makedirs(export_dir, exist_ok=True)
    max_len_cap = int(batch["mel_lengths"].max() * 1.10)
    out, n_frames, _ = tacotron2_infer_jit(
        state.params, state.model_state, cfg.model,
        jax.numpy.asarray(batch["text"]),
        max_steps=min(cfg.model.max_decoder_steps, max_len_cap))
    n = int(n_frames)
    mel_post = np.asarray(out.mel_postnet)[:, :n]          # (B, T, n_mels)
    gates = 1.0 / (1.0 + np.exp(-np.asarray(out.gate_logits)[:, :n]))

    align_path = os.path.join(export_dir, "debug_infer_alignment.png")
    save_alignment_plot(np.asarray(out.alignments)[:, :n], align_path)
    print(f"Inference alignment saved: {align_path}")

    rows = []
    for b in range(mel_post.shape[0]):
        stops = np.nonzero(gates[b] > 0.5)[0]
        if len(stops) == 0:
            end = int(batch["mel_lengths"][b])
        else:
            end = int(stops[0]) + 1
        mel_b = mel_post[b, :end]                          # (T_trim, n_mels)
        mel_file = f"debug_infer_mel_{b}.npy"
        np.save(os.path.join(export_dir, mel_file), mel_b)

        length = int(batch["text_lengths"][b])
        txt_file = f"sample_{b}.txt"
        with open(os.path.join(export_dir, txt_file), "w",
                  encoding="utf-8") as f:
            f.write(sequence_to_text(batch["text"][b][:length]) + "\n")

        wav_file = ""
        try:
            from ..infer.vocode import vocode_mel
            wav = vocode_mel(mel_b, cfg.audio)
            wav_file = f"debug_infer_{b}.wav"
            save_wav(os.path.join(export_dir, wav_file), wav,
                     cfg.audio.sampling_rate)
        except Exception as e:
            print(f"WAV export failed (sample {b}): {e}")
        rows.append({"sample_index": b, "text_file": txt_file,
                     "mel_file": mel_file, "wav_file": wav_file})

    pairs = os.path.join(export_dir, "pairs.csv")
    with open(pairs, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=["sample_index", "text_file",
                                          "mel_file", "wav_file"])
        w.writeheader()
        w.writerows(rows)
    print(f"Paired metadata written: {pairs}")


def train(metadata_path: str, checkpoint_dir: str, *,
          cfg: Optional[Config] = None, epochs: Optional[int] = None,
          batch_size: Optional[int] = None,
          learning_rate: Optional[float] = None,
          debug_overfit: bool = False, val_metadata: Optional[str] = None,
          resume: Optional[str] = None,
          postnet_freeze_steps_override: Optional[int] = None,
          accum_steps: int = 1,
          precision: Optional[str] = None,
          remat: Optional[str] = None,
          tensor_parallel: int = 1,
          keep_epoch_ckpts: Optional[int] = None) -> TrainState:
    """Main training routine (CLI contract of reference train.py:287-298).

    ``remat``: None keeps the config; "off" disables decoder-step
    rematerialization; "full"/"dots" enable it with that policy
    (ModelConfig.decoder_remat_policy) — use for batch sizes whose decoder
    activations exceed HBM.

    ``tensor_parallel``: width of the mesh's ``model`` axis (``--tp``).
    1 = pure data parallelism.  N>1 shards the decoder's wide matmuls
    (LSTM gate kernels, projection/gate heads — parallel/mesh.py
    ``_tp_spec_for_path``) over N chips; the remaining chips form the
    ``data`` axis.  Requires device_count divisible by N.
    """
    import dataclasses
    cfg = cfg or Config()
    if precision is not None:
        precision = {"bf16": "bfloat16", "fp32": "float32"}.get(precision,
                                                                precision)
    if (learning_rate is not None or batch_size is not None
            or epochs is not None or precision is not None):
        tr = dataclasses.replace(
            cfg.train,
            **({"learning_rate": learning_rate} if learning_rate else {}),
            **({"batch_size": batch_size} if batch_size else {}),
            **({"epochs": epochs} if epochs else {}),
            **({"precision": precision} if precision else {}))
        cfg = dataclasses.replace(cfg, train=tr)
    if remat is not None:
        if remat not in ("off", "full", "dots"):
            raise ValueError(f"remat must be 'off', 'full', or 'dots'; "
                             f"got {remat!r}")
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, remat_decoder_step=remat != "off",
            **({} if remat == "off" else {"decoder_remat_policy": remat})))

    from .step import compute_dtype_of
    compute_dtype_of(cfg.train.precision)   # validate early, before compiles

    # Multi-process runtime init MUST precede the first backend use —
    # jax.distributed.initialize() refuses to run once jax.devices() (or
    # any computation) has initialized XLA.  No-op unless coordination env
    # vars opt in (parallel/distributed.py).
    from ..parallel.distributed import (global_batch_from_local,
                                        initialize_distributed)
    initialize_distributed()
    is_lead = jax.process_index() == 0

    os.makedirs(checkpoint_dir, exist_ok=True)
    # In a multi-process run only process 0 writes the shared log file and
    # plots (they live in the shared checkpoint_dir; concurrent writers
    # would interleave/corrupt them).  Checkpoint saves stay collective.
    logger = TrainingLogger(checkpoint_dir, enabled=is_lead)
    print(f"Devices: {jax.devices()}")
    logger.log(f"Precision: {cfg.train.precision} "
               "(fp32 master weights; matmuls in the compute dtype)")

    dataset = TextMelDataset(metadata_path)
    tcfg = cfg.train
    if keep_epoch_ckpts is not None:
        tcfg = dataclasses.replace(tcfg, keep_epoch_ckpts=keep_epoch_ckpts)

    # Multi-speaker corpora (metadata carries speaker_id, e.g. LibriSpeech)
    # automatically size the speaker embedding table.
    if dataset.n_speakers > 1 and cfg.model.n_speakers < dataset.n_speakers:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           n_speakers=dataset.n_speakers))
        logger.log(f"Multi-speaker corpus: {dataset.n_speakers} speakers")

    tx = make_optimizer(tcfg, debug=debug_overfit)
    state = create_train_state(cfg, debug=debug_overfit, tx=tx)

    if debug_overfit:
        postnet_freeze_steps = 0           # reference: train.py:336-337
        sigma_warmup = tcfg.debug_sigma_warmup_steps
    else:
        postnet_freeze_steps = (postnet_freeze_steps_override
                                if postnet_freeze_steps_override is not None
                                else tcfg.postnet_freeze_steps)
        sigma_warmup = cfg.guided_attention.sigma_warmup_steps

    start_epoch, best_val_mel = 0, float("inf")
    if resume:
        state, start_epoch, best_val_mel = _resume(resume, state)
        logger.log(f"Resumed from {resume} (epoch {start_epoch + 1}, "
                   f"step {int(state.step)})")

    projection_bias_done = bool(resume)

    # ================= DEBUG OVERFIT MODE =================
    if debug_overfit:
        if tensor_parallel > 1:
            logger.log("NOTE: --tp ignored in --debug overfit mode "
                       "(single-device diagnostic)")
        return _debug_overfit(dataset, state, tx, cfg, checkpoint_dir,
                              logger, sigma_warmup,
                              iters=tcfg.epochs * 20)

    # ================= NORMAL TRAINING =================
    accum_steps = max(1, accum_steps)

    # ---- device mesh / multi-host wiring ----
    # The reference trains on exactly one device (train.py:302-308).  Here,
    # when more than one device is visible AND the global batch divides
    # over them, training runs data-parallel via GSPMD: batches are
    # sharded over a 1-D `data` mesh axis, gradients psum over ICI.  In a
    # multi-process deployment (one process per TPU host) each process
    # loads only its slice of every global batch and the shards are
    # assembled into global arrays.
    n_proc = jax.process_count()
    n_dev = jax.device_count()
    mesh = None
    tp = max(1, tensor_parallel)
    if tp > 1 and n_dev % tp != 0:
        raise RuntimeError(f"--tp {tp} does not divide the "
                           f"{n_dev} visible devices")
    n_data = n_dev // tp
    global_micro_batch = tcfg.batch_size * n_proc
    if tp > 1 and global_micro_batch % n_data != 0:
        raise RuntimeError(
            f"global batch {global_micro_batch} not divisible by the "
            f"data-axis width {n_data} (= {n_dev} devices / tp {tp}) — "
            f"adjust --batch_size or --tp")
    if (n_dev > 1 and global_micro_batch % n_data == 0) or tp > 1:
        from ..parallel import make_mesh, shard_train_state
        mesh = make_mesh(n_data=n_data, n_model=tp)
        state = shard_train_state(mesh, state, tensor_parallel=tp > 1)
        if tp > 1:
            logger.log(f"SPMD mesh: data={n_data} x model={tp} "
                       f"(tensor parallel), {n_proc} processes, "
                       f"global micro-batch {global_micro_batch}")
        else:
            logger.log(f"Data parallel: {n_dev} devices, {n_proc} "
                       f"processes, global micro-batch {global_micro_batch}")
    elif n_proc > 1:
        raise RuntimeError(
            f"multi-process run with global batch {global_micro_batch} not "
            f"divisible by {n_dev} devices — adjust --batch_size")

    # Register the mesh (or clear a stale one from an earlier run in this
    # process) so the Pallas kernels — the fused attention tail and the
    # decoder train megakernels — shard_map themselves over the ``data``
    # axis and run on LOCAL batch shards, instead of forcing GSPMD to
    # replicate the global batch through un-partitionable custom calls
    # (ops/meshing.py).  Under TP the train megakernels additionally gate
    # themselves off (they hold the very weights TP shards VMEM-resident,
    # ops/decoder_train_kernel.py::train_megakernel_enabled); the scan
    # path's matmuls partition over ``model`` instead.
    from ..ops.meshing import set_kernel_mesh
    set_kernel_mesh(mesh)

    def place_batch(batch, micro: bool):
        """Host batch -> (possibly globally sharded) device arrays.
        ``micro`` marks the gradient-accumulation layout
        (accum, B, ...) whose batch axis is axis 1."""
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(None, "data") if micro else P("data")
        if n_proc > 1:
            return global_batch_from_local(mesh, batch, spec=spec)
        sharding = NamedSharding(mesh, spec)
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    # With accumulation the loader draws accum_steps micro-batches worth of
    # examples at once (same padded shape), scanned on device
    # (reference semantics: accumulate across consecutive batches,
    # train.py:516-524).
    loader = BatchLoader(dataset, tcfg.batch_size * accum_steps,
                         seed=tcfg.seed,
                         text_pad_multiple=tcfg.text_pad_multiple,
                         mel_pad_multiple=tcfg.mel_pad_multiple,
                         process_index=jax.process_index(),
                         process_count=n_proc)
    val_loader = None
    if val_metadata:
        # allow_empty: a val set smaller than the multi-host global batch
        # skips validation (validate() reports 'batches': 0) instead of
        # aborting the run the way an empty TRAIN loader does.
        val_loader = BatchLoader(TextMelDataset(val_metadata),
                                 tcfg.batch_size, shuffle=False,
                                 seed=tcfg.seed,
                                 text_pad_multiple=tcfg.text_pad_multiple,
                                 mel_pad_multiple=tcfg.mel_pad_multiple,
                                 drop_last=(n_proc > 1),
                                 process_index=jax.process_index(),
                                 process_count=n_proc, allow_empty=True)
        logger.log(f"Loaded {len(val_loader.dataset)} validation samples.")

    timer = StepTimer()
    gstep = int(state.step)
    run_saved_epochs: list = []   # epoch ckpts THIS run wrote (see pruner)
    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.time()
        # Per-step losses stay device-side (async dispatch keeps the TPU
        # pipeline full); they are only materialized at log points and
        # epoch end.  The reference syncs every step (train.py:525).
        loss_totals = []
        n_batches = 0
        print(f"\nEpoch: {epoch + 1}/{tcfg.epochs}")
        alignments = None
        for batch in loader:
            if not projection_bias_done:
                # Lazy projection-bias init from the first batch
                # (reference: src/model.py:424-441)
                state = state._replace(params=init_projection_bias(
                    state.params, jax.numpy.asarray(batch["mel"])))
                projection_bias_done = True
            use_postnet = gstep >= postnet_freeze_steps
            if accum_steps > 1:
                micro = {k: v.reshape((accum_steps,
                                       v.shape[0] // accum_steps)
                                      + v.shape[1:])
                         for k, v in batch.items()}
                micro = place_batch(micro, micro=True)
                state, losses, alignments = train_step_accum(
                    state, micro, cfg=cfg, tx=tx, use_postnet=use_postnet,
                    sigma_warmup_steps=sigma_warmup,
                    accum_steps=accum_steps)
            else:
                state, losses, alignments = train_step(
                    state, place_batch(batch, micro=False), cfg=cfg, tx=tx,
                    use_postnet=use_postnet,
                    sigma_warmup_steps=sigma_warmup)
            loss_totals.append(losses.total)
            n_batches += 1
            gstep += 1
            timer.tick()
            if gstep % 200 == 0:
                perf = timer.stats(
                    frames_per_step=int(batch["mel_lengths"].sum()))
                running = float(np.mean([float(x) for x in loss_totals]))
                logger.log(
                    f"Step {gstep} | Ep {epoch + 1} B {n_batches}/"
                    f"{len(loader)} Total {running:.4f} "
                    + _fmt_losses(losses)
                    + f" | {perf['steps_per_sec']:.2f} it/s "
                    f"{perf.get('mel_frames_per_sec', 0):.0f} frames/s")
            if tcfg.save_every_steps and gstep % tcfg.save_every_steps == 0:
                _save_best_effort(
                    os.path.join(checkpoint_dir, f"step_{gstep}"),
                    state, epoch, best_val_mel, logger)

        avg = (float(np.mean([float(x) for x in loss_totals]))
               if loss_totals else 0.0)
        logger.log(f"Epoch {epoch + 1} complete. Avg Loss: {avg:.6f}, "
                   f"Time: {time.time() - t0:.2f}s")

        if val_loader is not None:
            metrics = validate(state, val_loader, cfg, sigma_warmup,
                               place=(lambda b: place_batch(b, micro=False))
                               if mesh is not None else None)
            # The reference criterion advances its step counter on every
            # forward, including validation (train.py:216,271) — keep the
            # guided-attention sigma schedule in lockstep.
            state = state._replace(
                loss_step=state.loss_step + int(metrics["batches"]))
            logger.log(f"Validation | Epoch {epoch + 1} "
                       f"Mel {metrics['mel']:.4f} Gate {metrics['gate']:.4f} "
                       f"AttnEntropy {metrics['entropy']:.3f}")
            if metrics["mel"] < best_val_mel:
                # Advance best_val_mel only on a SUCCESSFUL save: if the
                # disk was full here, a later (slightly worse-than-this,
                # better-than-disk) epoch must still retry the save, or
                # best_model stays stale for the rest of the run.
                if _save_best_effort(
                        os.path.join(checkpoint_dir, "best_model"),
                        state, epoch, metrics["mel"], logger):
                    best_val_mel = metrics["mel"]
                    logger.log(f"Saved best checkpoint "
                               f"(val mel {best_val_mel:.4f})")

        if _save_best_effort(
                os.path.join(checkpoint_dir, f"tacotron2_epoch_{epoch + 1}"),
                state, epoch, best_val_mel, logger):
            run_saved_epochs.append(epoch + 1)
        _prune_epoch_ckpts(checkpoint_dir, tcfg.keep_epoch_ckpts, logger,
                           run_saved_epochs)
        if alignments is not None and is_lead:
            save_alignment_plot(
                _host_local(alignments),
                os.path.join(checkpoint_dir, f"alignment_epoch_{epoch + 1}.png"))
    print("\nTraining complete.")
    return state


def _save_best_effort(path: str, state: TrainState, epoch: int,
                      best_val_mel: float, logger) -> bool:
    """Save a cadence checkpoint, surviving IO failure (ENOSPC, quota):
    a failed periodic save must not kill a multi-hour training run —
    the r4 1000-epoch run died exactly this way (disk full of per-epoch
    checkpoints) with the model state healthy in memory."""
    try:
        save_checkpoint(path, state, epoch, best_val_mel)
        return True
    except Exception as e:
        logger.log(f"[WARN] checkpoint save failed for {path}: "
                   f"{type(e).__name__}: {e} — training continues")
        # Orbax leaves a *.orbax-checkpoint-tmp dir behind on failure;
        # remove it so retries (and disk space) recover.
        import shutil
        leftover = path + ".orbax-checkpoint-tmp"
        if os.path.isdir(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
        return False


def _prune_epoch_ckpts(checkpoint_dir: str, keep: int, logger,
                       run_saved_epochs) -> None:
    """Keep only the newest ``keep`` of the per-epoch checkpoints THIS
    RUN created (0 = keep all, the reference's unbounded cadence).

    Scoping to ``run_saved_epochs`` matters on resume: a checkpoint_dir
    may hold hundreds of pre-existing tacotron2_epoch_* dirs from
    earlier runs, and retroactively applying the retention policy to
    artifacts this run never wrote would silently delete them.  Every
    deletion is logged."""
    if not keep or keep <= 0:
        return
    import shutil
    for epoch_n in sorted(run_saved_epochs)[:-keep]:
        path = os.path.join(checkpoint_dir, f"tacotron2_epoch_{epoch_n}")
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
            logger.log(f"Pruned epoch checkpoint {path} "
                       f"(keep_epoch_ckpts={keep})")
    del run_saved_epochs[: max(0, len(run_saved_epochs) - keep)]


def _resume(resume: str, template: TrainState):
    params, model_state, full, epoch, best = load_any_checkpoint(
        resume, template)
    if full is not None:
        return full, epoch, best
    print(f"[resume] WARNING: {resume!r} is a params-only checkpoint "
          "(weights + BN stats). Optimizer state, epoch counter, LR "
          "schedule position, and best-val tracking restart from scratch.")
    return template._replace(params=params, model_state=model_state), 0, best


def _debug_overfit(dataset: TextMelDataset, state: TrainState, tx, cfg: Config,
                   checkpoint_dir: str, logger: TrainingLogger,
                   sigma_warmup: int, iters: int) -> TrainState:
    """Overfit-a-single-batch smoke test (reference: train.py:396-486)."""
    tcfg = cfg.train
    print("DEBUG MODE: overfitting a single batch "
          "(L1 loss, log-power mels)")
    rng = np.random.default_rng(tcfg.seed)
    idx = rng.permutation(len(dataset))[:tcfg.debug_batch_size]
    batch = collate([dataset[int(i)] for i in idx],
                    tcfg.text_pad_multiple, tcfg.mel_pad_multiple)
    print(f"Debug batch shapes: text {batch['text'].shape} "
          f"mel {batch['mel'].shape}")
    print(f"  Mel range: [{batch['mel'].min():.3f}, {batch['mel'].max():.3f}]")
    print(f"  Lengths: {batch['mel_lengths'].tolist()}")

    state = state._replace(params=init_projection_bias(
        state.params, jax.numpy.asarray(batch["mel"])))

    success_iter = None
    losses = None
    alignments = None
    for it in range(iters):
        state, losses, alignments = train_step(
            state, batch, cfg=cfg, tx=tx, use_postnet=True,
            sigma_warmup_steps=sigma_warmup)
        if (it + 1) % 5 == 0:
            eff = float(losses.attention_weight) * float(losses.attention_kl)
            print(f"Iteration {it + 1:4d}, Total: {float(losses.total):.6f}")
            print(f"  {_fmt_losses(losses)} | w*KL: {eff:.4f} | "
                  f"entropy: {float(losses.attention_entropy):.3f}")
        if (it + 1) % 10 == 0:
            p = os.path.join(checkpoint_dir,
                             f"debug_alignment_iter_{it + 1}.png")
            save_alignment_plot(alignments, p)
            print(f"Alignment saved: {p}")
        if float(losses.mel) < tcfg.debug_success_mel_l1:
            success_iter = it + 1
            print(f"SUCCESS: mel L1 {float(losses.mel):.4f} < "
                  f"{tcfg.debug_success_mel_l1} at iteration {success_iter}")
            save_alignment_plot(alignments, os.path.join(
                checkpoint_dir, f"debug_alignment_iter_{it + 1}.png"))
            break

    export_dir = os.path.join(checkpoint_dir, "debug_export")
    try:
        os.makedirs(export_dir, exist_ok=True)
        from .checkpoint import save_params_only
        save_params_only(os.path.join(export_dir, "overfit_model"),
                         state.params, state.model_state)
        np.savez(os.path.join(export_dir, "debug_batch.npz"), **batch)
        print(f"Saved overfit model + batch to {export_dir}")
        export_debug_inference(state, batch, cfg, export_dir)
    except Exception as e:
        print(f"Debug export failed: {e}")
    print("DEBUG MODE COMPLETE")
    return state
