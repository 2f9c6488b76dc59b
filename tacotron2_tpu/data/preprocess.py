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
from typing import Dict, List, Optional

import numpy as np

from ..config import AudioConfig
from ..dsp.mel import batched_log_mel_with_lengths, reflect_pad_batch
from ..dsp.wav import load_audio
from ..text.frontend import text_to_sequence
from .metadata import basename_of, read_metadata
from .native_loader import decode_batch_padded, native_available

# Padded-signal buckets: multiples of 2^15 samples (~1.5 s at 22.05 kHz).
_BUCKET_QUANTUM = 1 << 15


def _bucket_len(n_samples: int) -> int:
    return -(-n_samples // _BUCKET_QUANTUM) * _BUCKET_QUANTUM


def _estimated_wav_samples(path: str) -> int:
    """Upper-bound sample estimate from file size (PCM16 mono: the
    LJSpeech case).  Only used for bucketing; the decoder reports truth."""
    try:
        return max(0, (os.path.getsize(path) - 44) // 2)
    except OSError:
        return 0


def preprocess_corpus(metadata_path: str, output_dir: str,
                      cfg: Optional[AudioConfig] = None,
                      batch_size: int = 16,
                      log_every: int = 50,
                      use_native: Optional[bool] = None) -> Dict[str, int]:
    """Run the full offline preprocessing pass.

    Per-file failures are skipped with a warning, like the reference
    (reference: preprocess.py:46-55).  Returns counters.

    When the native C++ loader is available and the corpus is WAV at the
    target rate (the LJSpeech case), audio never touches Python: files are
    bucketed by size, a C++ thread pool decodes + reflect-pads whole
    batches, and XLA turns each batch into mels.  Files the native path
    cannot handle (other formats / rates) fall back per-file to Python.
    """
    cfg = cfg or AudioConfig()
    rows = read_metadata(metadata_path)
    mels_dir = os.path.join(output_dir, "mels")
    text_dir = os.path.join(output_dir, "text")
    os.makedirs(mels_dir, exist_ok=True)
    os.makedirs(text_dir, exist_ok=True)
    if use_native is None:
        use_native = native_available()

    print(f"Preprocessing {len(rows)} files -> {output_dir} "
          f"(native loader: {use_native})")
    stats = {"ok": 0, "skipped": 0}
    pad = cfg.n_fft // 2

    def device_mels(batch: np.ndarray, lengths: np.ndarray):
        mels, mel_lens = batched_log_mel_with_lengths(
            batch, lengths, sr=cfg.sampling_rate, n_fft=cfg.n_fft,
            hop_length=cfg.hop_length, win_length=cfg.win_length,
            n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax,
            mel_eps=cfg.mel_eps)
        return np.asarray(mels), np.asarray(mel_lens)

    # Stage 1 (host): tokenize text; partition rows into the native fast
    # path (WAV files, bucketed by size estimate) and the Python path.
    native_buckets: Dict[int, List[dict]] = {}
    python_rows: List[dict] = []
    for row in rows:
        base = basename_of(row["filepath"])
        try:
            seq = text_to_sequence(row["text"])
            np.save(os.path.join(text_dir, f"{base}.npy"),
                    np.asarray(seq, dtype=np.int32))
        except Exception as e:
            print(f"Skipping (text) {row['filepath']}: {e}")
            stats["skipped"] += 1
            continue
        item = {"base": base, "path": row["filepath"]}
        if use_native and row["filepath"].lower().endswith(".wav"):
            est = _estimated_wav_samples(row["filepath"])
            native_buckets.setdefault(_bucket_len(est), []).append(item)
        else:
            python_rows.append(item)

    # Stage 2a (native + device): threaded C++ decode/pad -> batched mels.
    done = 0
    for bucket_samples in sorted(native_buckets):
        items = native_buckets[bucket_samples]
        total_len = bucket_samples + cfg.n_fft
        for start in range(0, len(items), batch_size):
            chunk = items[start:start + batch_size]
            padded_chunk = chunk + [chunk[-1]] * (batch_size - len(chunk))
            batch, lengths, rates = decode_batch_padded(
                [c["path"] for c in padded_chunk], pad, total_len)
            usable = (lengths > 0) & (rates == cfg.sampling_rate)
            mels, mel_lens = device_mels(batch,
                                         lengths.astype(np.int32))
            for j, c in enumerate(chunk):
                if usable[j]:
                    np.save(os.path.join(mels_dir, f"{c['base']}.npy"),
                            mels[j, :, :int(mel_lens[j])])
                    stats["ok"] += 1
                else:
                    python_rows.append(c)  # wrong rate/size: slow path
            done += len(chunk)
            if log_every and done % log_every < batch_size:
                print(f"  native: {done}/{len(rows)}")

    # Stage 2b (python + device): per-file load/resample, bucketed batches.
    py_buckets: Dict[int, List[dict]] = {}
    for item in python_rows:
        try:
            y, _ = load_audio(item["path"], target_sr=cfg.sampling_rate)
        except Exception as e:
            print(f"Skipping (mel) {item['path']}: {e}")
            stats["skipped"] += 1
            continue
        py_buckets.setdefault(_bucket_len(len(y)), []).append(
            {**item, "wav": y})
    for bucket_samples in sorted(py_buckets):
        items = py_buckets[bucket_samples]
        total_len = bucket_samples + cfg.n_fft
        for start in range(0, len(items), batch_size):
            chunk = items[start:start + batch_size]
            padded_chunk = chunk + [chunk[-1]] * (batch_size - len(chunk))
            sigs = [c["wav"] for c in padded_chunk]
            lengths = np.asarray([len(s) for s in sigs], dtype=np.int32)
            batch = reflect_pad_batch(sigs, pad, total_len)
            mels, mel_lens = device_mels(batch, lengths)
            for j, c in enumerate(chunk):
                np.save(os.path.join(mels_dir, f"{c['base']}.npy"),
                        mels[j, :, :int(mel_lens[j])])
                stats["ok"] += 1

    shutil.copyfile(metadata_path, os.path.join(output_dir, "metadata.csv"))
    print(f"Preprocessing complete: {stats['ok']} ok, "
          f"{stats['skipped']} skipped -> {output_dir}")
    return stats
