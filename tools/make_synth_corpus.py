#!/usr/bin/env python
"""Generate a synthetic speech-like corpus for training-dynamics runs.

This environment has no network egress, so the real LJSpeech corpus the
reference trains on cannot be downloaded.  This tool builds the closest
trainable stand-in: utterances whose AUDIO is derived from their TEXT by a
fixed phoneme -> formant mapping, so a Tacotron 2 model must learn a real
monotonic text-to-spectrum alignment (the same structural problem LJSpeech
poses), not just memorize tones.

Per phoneme: 2 formant sine carriers (distinct per phoneme) + pink-ish
noise for fricatives/stops, ~70-130 ms each, amplitude-enveloped, plus
word-boundary pauses.  Output: LJSpeech-format layout (wavs/ +
pipe-separated metadata.csv) consumable by prepare_ljspeech.py.

    python tools/make_synth_corpus.py OUTDIR --n 256 --seed 0
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))   # runnable from any cwd

SR = 22050

# Words chosen to cover a wide phoneme set with CMUdict entries.
VOCAB = [
    "water", "river", "mountain", "shadow", "morning", "silver",
    "garden", "window", "thunder", "velvet", "candle", "meadow",
    "winter", "summer", "paper", "stone", "light", "dream",
    "voice", "music", "gentle", "golden", "hollow", "whisper",
    "travel", "wonder", "simple", "better", "never", "always",
]

_FRICATIVES = set("S Z SH ZH F V TH DH HH CH JH".split())
_STOPS = set("P B T D K G".split())


def _phoneme_params(phoneme: str, rng: np.random.Generator):
    """Deterministic per-phoneme acoustic fingerprint."""
    h = abs(hash(phoneme)) % 1000
    f1 = 220.0 + (h % 17) * 40.0          # 220..860 Hz
    f2 = 900.0 + (h % 23) * 110.0         # 900..3300 Hz
    noisy = phoneme in _FRICATIVES
    burst = phoneme in _STOPS
    dur = 0.07 + (h % 7) * 0.01           # 70..130 ms
    return f1, f2, noisy, burst, dur


def synth_utterance(phonemes, rng: np.random.Generator) -> np.ndarray:
    chunks = []
    for ph in phonemes:
        if ph == " ":
            chunks.append(np.zeros(int(SR * 0.04), np.float32))
            continue
        core = ph.rstrip("012")
        f1, f2, noisy, burst, dur = _phoneme_params(core, rng)
        n = int(SR * dur)
        t = np.arange(n) / SR
        sig = (0.5 * np.sin(2 * np.pi * f1 * t)
               + 0.3 * np.sin(2 * np.pi * f2 * t))
        if noisy:
            sig = 0.35 * sig + 0.4 * rng.standard_normal(n)
        if burst:
            sig[: n // 3] *= 0.15          # closure then release
        env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n))
                         / (0.012 * SR))
        chunks.append((0.3 * sig * env).astype(np.float32))
    return np.concatenate(chunks) if chunks else np.zeros(SR // 10,
                                                          np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min_words", type=int, default=3)
    ap.add_argument("--max_words", type=int, default=8)
    args = ap.parse_args()

    from scipy.io import wavfile

    from tacotron2_tpu.text import G2p

    g2p = G2p()
    rng = np.random.default_rng(args.seed)
    wav_dir = os.path.join(args.outdir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)

    lines = []
    for i in range(args.n):
        n_words = int(rng.integers(args.min_words, args.max_words + 1))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), n_words)]
        text = " ".join(words) + "."
        phonemes = g2p(" ".join(words))
        wav = synth_utterance(phonemes, rng)
        base = f"SYN-{i:04d}"
        wavfile.write(os.path.join(wav_dir, f"{base}.wav"), SR, wav)
        lines.append(f"{base}|{text}|{text}")

    meta = os.path.join(args.outdir, "metadata.csv")
    with open(meta, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    total_sec = sum(len(synth_utterance(g2p(" ".join(l.split('|')[1]
                    .rstrip('.').split())), rng)) for l in lines[:8]) / SR
    print(f"{args.n} utterances -> {args.outdir} "
          f"(~{total_sec / 8:.2f}s each)")


if __name__ == "__main__":
    main()
