#!/usr/bin/env python
"""Ground-truth vocoder sanity check.

Mirrors the reference checker (reference: gt_vocoder_check.py:105-227):
pick a metadata row, recompute its mel from the raw wav (authoritative),
classify the mel scale (LIKELY_LINEAR_0_1 / LIKELY_LOG / AMBIGUOUS),
optionally compare with the preprocessed cache, run Griffin-Lim (and
optionally HiFi-GAN) on it, and emit a JSON report — a fixture-based test
of the DSP round-trip independent of the model.

    python gt_vocoder_check.py --metadata processed/metadata.csv \
        [--processed_root processed/] [--index N] [--output_dir DIR] \
        [--hifigan] [--gl_iters 60] [--try_pseudo_log]
"""

import argparse
import json
import os
import random
from datetime import datetime, timezone

import numpy as np

from tacotron2_tpu.utils.cache import enable_persistent_cache
from tacotron2_tpu.config import AudioConfig
from tacotron2_tpu.data import basename_of, read_metadata
from tacotron2_tpu.dsp import get_mel_spectrogram, save_wav
from tacotron2_tpu.utils.diagnostics import classify_mel_scale, mel_stats


def _prepare_mel_for_griffin_lim(mel: np.ndarray, scale_guess: str,
                                 cfg: AudioConfig) -> np.ndarray:
    """Return a linear mel for Griffin-Lim (reference: gt_vocoder_check.py:41-62).

    LIKELY_LINEAR_0_1: undo assumed (db+80)/80 normalization back to power;
    LIKELY_LOG: exponentiate natural-log mel; AMBIGUOUS: pass through.
    """
    if scale_guess == "LIKELY_LINEAR_0_1":
        mel_db = mel * 80.0 - 80.0
        return np.power(10.0, mel_db / 10.0)  # dB -> power
    if scale_guess == "LIKELY_LOG":
        return np.exp(mel)
    return mel


def _linear_mel_to_audio(mel_lin: np.ndarray, n_iter: int,
                         cfg: AudioConfig) -> np.ndarray:
    """Griffin-Lim a mel that is already linear (power=1.0 semantics),
    bypassing mel_to_audio's log-detect heuristic."""
    import jax.numpy as jnp

    from tacotron2_tpu.dsp import griffin_lim, mel_to_linear
    linear = mel_to_linear(
        jnp.asarray(np.maximum(mel_lin, 0.0)), sr=cfg.sampling_rate,
        n_fft=cfg.n_fft, n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax)
    return np.asarray(griffin_lim(
        linear, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_iter=n_iter))


def approximate_linear01_to_log(mel_linear01: np.ndarray) -> np.ndarray:
    """Diagnostic pseudo-log mapping 0..1 -> [-6, 0]
    (reference: src/mel_griffinlim.py:52-61)."""
    x = np.clip(mel_linear01, 0.0, 1.0)
    return -6.0 + 6.0 * x


def main(args):
    cfg = AudioConfig()
    rows = read_metadata(args.metadata)
    if not rows:
        raise ValueError("Empty metadata.")
    if "filepath" not in rows[0] or "text" not in rows[0]:
        raise ValueError("Metadata must contain 'filepath' and 'text'.")

    if args.index is not None:
        if not (0 <= args.index < len(rows)):
            raise IndexError(f"--index out of range (0..{len(rows) - 1})")
        row = rows[args.index]
    else:
        row = rows[random.randint(0, len(rows) - 1)]
    wav_path, text = row["filepath"], row["text"]
    basename = basename_of(wav_path)
    print(f"Selected sample: basename={basename}")

    os.makedirs(args.output_dir, exist_ok=True)
    report = {"timestamp": datetime.now(timezone.utc).isoformat(),
              "wav_path": wav_path, "text": text, "basename": basename}

    # Optional: the preprocessed cache's mel
    if args.processed_root:
        mel_path = os.path.join(args.processed_root, "mels",
                                f"{basename}.npy")
        if os.path.isfile(mel_path):
            proc = np.load(mel_path)
            if proc.shape[0] != cfg.n_mels and proc.shape[1] == cfg.n_mels:
                proc = proc.T
            stats = mel_stats(proc)
            guess = classify_mel_scale(stats)
            print(f"[PROC MEL] stats={stats} scale_guess={guess}")
            report["processed_mel_stats"] = stats
            report["processed_mel_scale_guess"] = guess
        else:
            print(f"Processed mel not found: {mel_path}")

    # Authoritative: recompute from the raw wav
    mel = np.asarray(get_mel_spectrogram(wav_path, cfg))
    stats = mel_stats(mel)
    guess = classify_mel_scale(stats)
    print(f"[RECOMP MEL] stats={stats} scale_guess={guess}")
    report["recomputed_mel_stats"] = stats
    report["recomputed_mel_scale_guess"] = guess

    print(f"Preparing mel for Griffin-Lim (scale guess: {guess})")
    mel_lin = _prepare_mel_for_griffin_lim(mel, guess, cfg)
    print("Running Griffin-Lim on prepared mel...")
    # Invert the already-linear mel directly.  (The reference feeds the
    # prepared mel back through mel_to_audio, whose log/linear heuristic
    # fires on the wide linear dynamic range and exponentiates a second
    # time — an overflow bug, gt_vocoder_check.py:183 + mel_griffinlim.py:36;
    # fixed here rather than replicated.)
    wav_gl = _linear_mel_to_audio(mel_lin, args.gl_iters, cfg)
    gl_path = os.path.join(args.output_dir, f"{basename}_gt_griffinlim.wav")
    save_wav(gl_path, wav_gl, cfg.sampling_rate)
    print(f"Saved: {gl_path}")

    if guess == "LIKELY_LINEAR_0_1" and args.try_pseudo_log:
        pseudo = np.exp(approximate_linear01_to_log(mel))
        print("Running Griffin-Lim on pseudo-log transformed mel...")
        wav_p = _linear_mel_to_audio(pseudo, args.gl_iters, cfg)
        p_path = os.path.join(args.output_dir,
                              f"{basename}_gt_griffinlim_pseudolog.wav")
        save_wav(p_path, wav_p, cfg.sampling_rate)
        print(f"Saved: {p_path}")

    if args.hifigan:
        try:
            from tacotron2_tpu.models.hifigan import load_hifigan_vocoder
            vocode = load_hifigan_vocoder()
            wav_h = vocode(mel[None])[0]
            h_path = os.path.join(args.output_dir,
                                  f"{basename}_gt_hifigan.wav")
            save_wav(h_path, wav_h, cfg.sampling_rate)
            print(f"Saved: {h_path}")
        except Exception as e:
            print(f"HiFi-GAN synthesis failed: {e}")
            report["hifigan_error"] = str(e)

    report_path = os.path.join(args.output_dir,
                               f"{basename}_vocoder_check.json")
    with open(report_path, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(f"Report saved: {report_path}")
    print("Done.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Ground-truth vocoder sanity check.")
    parser.add_argument("--metadata", type=str, required=True)
    parser.add_argument("--processed_root", type=str, default=None)
    parser.add_argument("--index", type=int, default=None)
    parser.add_argument("--output_dir", type=str, default="gt_vocoder_check")
    parser.add_argument("--hifigan", action="store_true")
    parser.add_argument("--gl_iters", type=int, default=60)
    parser.add_argument("--try_pseudo_log", action="store_true")
    args = parser.parse_args()
    enable_persistent_cache()
    main(args)
