#!/usr/bin/env python
"""Quality-regression evaluation: MCD, gate timing, alignment diagonality.

The training losses (mel L1 / gate BCE / attention entropy — reference:
train.py:458-461) miss regressions that preserve L1: duration drift,
attention smearing, boundary artifacts.  This tool evaluates a checkpoint
on a held-out (preprocessed) metadata set with the standard metrics
(tacotron2_tpu/utils/quality.py) and prints/writes a JSON report:

  * teacher-forced MCD (frame-aligned) per item,
  * autoregressive MCD (DTW-aligned) + gate-timing error per item,
  * alignment diagonality (teacher-forced attention).

    python tools/eval_quality.py CKPT processed/metadata.csv \
        [--n 16] [--out report.json] [--skip-ar]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

from tacotron2_tpu.utils.cache import enable_persistent_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("metadata", help="preprocessed metadata.csv (the "
                                     "directory must hold text/ and mels/)")
    ap.add_argument("--n", type=int, default=16,
                    help="max items to evaluate (default 16)")
    ap.add_argument("--out", default=None, help="also write JSON here")
    ap.add_argument("--skip-ar", action="store_true",
                    help="skip the autoregressive pass (faster; "
                         "teacher-forced metrics only)")
    ap.add_argument("--max_steps", type=int, default=1000)
    ap.add_argument("--n_speakers", type=int, default=None)
    args = ap.parse_args()

    enable_persistent_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.data.dataset import TextMelDataset
    from tacotron2_tpu.infer.synthesize import load_model
    from tacotron2_tpu.models import tacotron2_forward, tacotron2_infer_jit
    from tacotron2_tpu.utils.quality import (alignment_diagonality,
                                             gate_timing_error,
                                             mcd_dtw, mcd_frame_aligned,
                                             summarize)

    cfg = Config()
    if args.n_speakers:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, n_speakers=args.n_speakers))
    params, state = load_model(args.checkpoint, cfg)
    ds = TextMelDataset(args.metadata)
    n = min(args.n, len(ds))
    print(f"Evaluating {n} items from {args.metadata}")

    tf_mcd, diag, ar_mcd, gate_err = [], [], [], []
    per_item = []
    for i in range(n):
        item = ds[i]
        text = np.asarray(item.text, np.int32)
        mel = np.asarray(item.mel, np.float32)             # (80, T)
        t_dec = mel.shape[1]
        spk = jnp.asarray([int(item.speaker_id)], jnp.int32)
        detail = {"index": i, "text_len": int(len(text)),
                  "mel_len": int(t_dec),
                  "speaker_id": int(item.speaker_id)}
        per_item.append(detail)

        # ---- teacher-forced: frame-aligned MCD + diagonality ----
        out, _ = tacotron2_forward(
            params, state, cfg.model, jnp.asarray(text[None]),
            jnp.asarray(mel[None]), jnp.asarray([len(text)], jnp.int32),
            jax.random.PRNGKey(0), train=False, use_postnet=True,
            speaker_ids=spk)
        pred_tf = np.asarray(out.mel_postnet[0])            # (T, 80)
        tf_mcd.append(mcd_frame_aligned(pred_tf, mel.T))
        diag.append(alignment_diagonality(
            np.asarray(out.alignments[0]), text_len=len(text),
            mel_len=t_dec))
        detail["mcd_tf_db"] = round(float(tf_mcd[-1]), 3)
        detail["diagonality"] = round(float(diag[-1]), 4)

        # ---- autoregressive: DTW MCD + gate timing ----
        if not args.skip_ar:
            aout, n_frames, ends = tacotron2_infer_jit(
                params, state, cfg.model, jnp.asarray(text[None]),
                max_steps=args.max_steps, speaker_ids=spk)
            end = int(np.asarray(ends)[0])
            pred_ar = np.asarray(aout.mel_postnet[0])[:max(end, 1)]
            ar_mcd.append(mcd_dtw(pred_ar, mel.T))
            gate_err.append(gate_timing_error(end, t_dec))
            detail["ar_end_frames"] = end
            detail["mcd_ar_dtw_db"] = round(float(ar_mcd[-1]), 3)
            detail["gate_err_frames"] = round(float(gate_err[-1]), 1)
        if (i + 1) % 8 == 0:
            print(f"  {i + 1}/{n}")

    report = {
        "checkpoint": args.checkpoint,
        "n_items": n,
        "mcd_teacher_forced_db": summarize(tf_mcd),
        "alignment_diagonality": summarize(diag),
    }
    if not args.skip_ar:
        report["mcd_autoregressive_dtw_db"] = summarize(ar_mcd)
        report["gate_timing_error_frames"] = summarize(gate_err)
    # Per-item detail so tail outliers in the summary are traceable to
    # the exact val item (VERDICT r4 item 3: the r4 report's MCD max of
    # 21.4 dB was undiagnosable from aggregates alone).
    report["per_item"] = per_item
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
