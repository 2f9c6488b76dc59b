"""Offline corpus preprocessing: audio -> cached log-mels, text -> token IDs.

The reference processes the corpus with a sequential host loop, one librosa
call per file (reference: preprocess.py:31-55).  Here the mel extraction is
*batched on device*: waveforms are grouped into length buckets (so XLA
compiles a handful of static shapes, not one per file), reflect-padded on
host, and transformed as (B, S) batches by one jitted XLA program — rFFT +
mel filterbank matmul on the MXU.

Cache layout mirrors the reference's contract (``mels/<base>``,
``text/<base>``, copied ``metadata.csv``) with ``.npy`` instead of
``torch.save`` pickles.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import AudioConfig
from ..dsp.mel import batched_log_mel_with_lengths, reflect_pad_batch
from ..dsp.wav import load_audio
from ..text.frontend import text_to_sequence
from .metadata import basename_of, read_metadata

# Padded-signal buckets: multiples of 2^15 samples (~1.5 s at 22.05 kHz).
_BUCKET_QUANTUM = 1 << 15


def _bucket_len(n_samples: int) -> int:
    return -(-n_samples // _BUCKET_QUANTUM) * _BUCKET_QUANTUM


def preprocess_corpus(metadata_path: str, output_dir: str,
                      cfg: Optional[AudioConfig] = None,
                      batch_size: int = 16,
                      log_every: int = 50) -> Dict[str, int]:
    """Run the full offline preprocessing pass.

    Per-file failures are skipped with a warning, like the reference
    (reference: preprocess.py:46-55).  Returns counters.
    """
    cfg = cfg or AudioConfig()
    rows = read_metadata(metadata_path)
    mels_dir = os.path.join(output_dir, "mels")
    text_dir = os.path.join(output_dir, "text")
    os.makedirs(mels_dir, exist_ok=True)
    os.makedirs(text_dir, exist_ok=True)

    print(f"Preprocessing {len(rows)} files -> {output_dir}")
    stats = {"ok": 0, "skipped": 0}

    # Stage 1 (host): tokenize text, load audio, assign to length buckets.
    buckets: Dict[int, List[dict]] = {}
    for i, row in enumerate(rows):
        base = basename_of(row["filepath"])
        try:
            seq = text_to_sequence(row["text"])
            np.save(os.path.join(text_dir, f"{base}.npy"),
                    np.asarray(seq, dtype=np.int32))
            y, _ = load_audio(row["filepath"], target_sr=cfg.sampling_rate)
        except Exception as e:  # per-file skip semantics
            print(f"Skipping {row['filepath']}: {e}")
            stats["skipped"] += 1
            continue
        buckets.setdefault(_bucket_len(len(y)), []).append(
            {"base": base, "wav": y})
        if log_every and (i + 1) % log_every == 0:
            print(f"  loaded {i + 1}/{len(rows)}")

    # Stage 2 (device): batched mel extraction per bucket.
    pad = cfg.n_fft // 2
    for bucket_samples in sorted(buckets):
        items = buckets[bucket_samples]
        total_len = bucket_samples + cfg.n_fft
        for start in range(0, len(items), batch_size):
            chunk = items[start:start + batch_size]
            # Fixed batch shape per bucket: pad the tail chunk by repeating
            # the last item so XLA sees exactly one shape per bucket.
            padded_chunk = chunk + [chunk[-1]] * (batch_size - len(chunk))
            sigs = [c["wav"] for c in padded_chunk]
            lengths = np.asarray([len(s) for s in sigs], dtype=np.int32)
            batch = reflect_pad_batch(sigs, pad, total_len)
            mels, mel_lens = batched_log_mel_with_lengths(
                batch, lengths, sr=cfg.sampling_rate, n_fft=cfg.n_fft,
                hop_length=cfg.hop_length, win_length=cfg.win_length,
                n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax,
                mel_eps=cfg.mel_eps)
            mels = np.asarray(mels)
            mel_lens = np.asarray(mel_lens)
            for j, c in enumerate(chunk):
                np.save(os.path.join(mels_dir, f"{c['base']}.npy"),
                        mels[j, :, :int(mel_lens[j])])
                stats["ok"] += 1

    shutil.copyfile(metadata_path, os.path.join(output_dir, "metadata.csv"))
    print(f"Preprocessing complete: {stats['ok']} ok, "
          f"{stats['skipped']} skipped -> {output_dir}")
    return stats
