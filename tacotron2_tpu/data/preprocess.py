"""Offline corpus preprocessing: audio -> cached log-mels, text -> token IDs.

The reference processes the corpus with a sequential host loop, one librosa
call per file (reference: preprocess.py:31-55).  Here the pass is a
PIPELINE over three overlapping resources:

  * **decode** — the C++ thread-pool WAV loader (native/wavio.cc) reads
    and reflect-pads whole batches outside the GIL,
  * **device** — waveform batches become log-mels as (B, S) XLA programs
    (rFFT + filterbank matmul on the MXU), grouped into length buckets so
    a handful of static shapes compile, dispatched ASYNCHRONOUSLY,
  * **writeback** — a writer thread pulls each finished mel batch off the
    device (the device->host wait releases the GIL — on a tunneled chip
    this transfer, not compute, dominates) and writes per-item ``.npy``
    files while the main thread decodes and dispatches the next batches.

The text stage (normalize -> G2P -> token IDs, pure-Python host work) can
fan out over a process pool (``text_workers``; auto = one worker per CPU,
capped at 8 — serial on single-core hosts where processes only add IPC).

Cache layout mirrors the reference's contract (``mels/<base>``,
``text/<base>``, copied ``metadata.csv``) with ``.npy`` instead of
``torch.save`` pickles.
"""

from __future__ import annotations

import os
import shutil
import threading
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import AudioConfig
from ..dsp.mel import batched_log_mel_with_lengths, reflect_pad_batch
from ..dsp.wav import load_audio
from ..text.frontend import text_to_sequence
from .metadata import basename_of, read_metadata
from .native_loader import decode_batch_padded, native_available

# Padded-signal buckets: multiples of 2^15 samples (~1.5 s at 22.05 kHz).
_BUCKET_QUANTUM = 1 << 15

# Device batches allowed in flight before the producer blocks: bounds
# device memory while keeping decode / compute / writeback overlapped.
_MAX_INFLIGHT = 8

# Concurrent device->host transfers.  On a tunneled chip each transfer
# costs ~1 s of round-trip LATENCY regardless of size (measured: 72
# serial transfers = 76 s of an 87 s corpus pass), so pipelining several
# in flight divides the wall by the concurrency; on a local chip the
# transfers are ~1 ms and the extra threads are harmless.
_WRITER_THREADS = 4


def _bucket_len(n_samples: int) -> int:
    return -(-n_samples // _BUCKET_QUANTUM) * _BUCKET_QUANTUM


def _estimated_wav_samples(path: str) -> int:
    """Upper-bound sample estimate from file size (PCM16 mono: the
    LJSpeech case).  Only used for bucketing; the decoder reports truth."""
    try:
        return max(0, (os.path.getsize(path) - 44) // 2)
    except OSError:
        return 0


def _tokenize_one(args: Tuple[str, str]) -> Tuple[str, Optional[List[int]],
                                                  str]:
    """(base, text) -> (base, seq | None, error).  Top-level so process
    pools can pickle it; the G2P singleton loads once per worker."""
    base, text = args
    try:
        return base, text_to_sequence(text), ""
    except Exception as e:  # pragma: no cover - G2P failures are data bugs
        return base, None, f"{type(e).__name__}: {e}"


def _run_text_stage(rows, text_dir: str, workers: Optional[int]
                    ) -> Tuple[Dict[str, bool], int]:
    """Tokenize + save every row's text.  Returns (ok-by-base, skipped)."""
    if workers is None:
        workers = min(os.cpu_count() or 1, 8)
    jobs = [(basename_of(r["filepath"]), r["text"]) for r in rows]
    if workers > 1 and len(jobs) > 2 * workers:
        # spawn, not fork: the parent may hold an initialized TPU client,
        # which must not be inherited.  Workers only run the text
        # frontend, so they never initialize a backend of their own.
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(
                max_workers=workers,
                mp_context=multiprocessing.get_context("spawn")) as ex:
            results = list(ex.map(_tokenize_one, jobs,
                                  chunksize=max(1, len(jobs) // (4 * workers))))
    else:
        results = [_tokenize_one(j) for j in jobs]
    ok: Dict[str, bool] = {}
    skipped = 0
    for (base, seq, err), row in zip(results, rows):
        if seq is None:
            print(f"Skipping (text) {row['filepath']}: {err}")
            skipped += 1
            ok[base] = False
            continue
        np.save(os.path.join(text_dir, f"{base}.npy"),
                np.asarray(seq, dtype=np.int32))
        ok[base] = True
    return ok, skipped


class _MelWriter:
    """Writeback stage: device->host transfer + per-item .npy saves on a
    worker thread, overlapping the producer's decode + device dispatch.

    ``submit`` never blocks on the device; the transfer (``np.asarray`` on
    a jax array) happens on the writer thread, whose wait releases the
    GIL.  In-flight batches are bounded by ``_MAX_INFLIGHT``.
    """

    def __init__(self, mels_dir: str):
        from concurrent.futures import ThreadPoolExecutor
        self.mels_dir = mels_dir
        self._ex = ThreadPoolExecutor(max_workers=_WRITER_THREADS)
        self._futures: deque = deque()
        self._lock = threading.Lock()
        self.ok = 0
        self.fallback: List[dict] = []
        self.transfer_sec = 0.0

    def _write(self, mels_dev, mel_lens, chunk, usable):
        # mel_lens is HOST-computed (1 + samples // hop): only the mel
        # array itself crosses the device boundary.
        t0 = time.perf_counter()
        mels = np.asarray(mels_dev)        # blocks HERE, off the main thread
        dt = time.perf_counter() - t0
        n_ok = 0
        for j, c in enumerate(chunk):
            if usable is None or usable[j]:
                np.save(os.path.join(self.mels_dir, f"{c['base']}.npy"),
                        mels[j, :, :int(mel_lens[j])])
                n_ok += 1
            else:
                with self._lock:
                    self.fallback.append(c)
        with self._lock:
            self.ok += n_ok
            self.transfer_sec += dt

    def submit(self, mels_dev, mel_lens, chunk, usable=None):
        while len(self._futures) >= _MAX_INFLIGHT:
            self._futures.popleft().result()
        self._futures.append(
            self._ex.submit(self._write, mels_dev, mel_lens, chunk, usable))

    def drain(self) -> None:
        while self._futures:
            self._futures.popleft().result()

    def close(self) -> None:
        self.drain()
        self._ex.shutdown()


def preprocess_corpus(metadata_path: str, output_dir: str,
                      cfg: Optional[AudioConfig] = None,
                      batch_size: int = 64,
                      log_every: int = 50,
                      use_native: Optional[bool] = None,
                      text_workers: Optional[int] = None) -> Dict[str, int]:
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
    wall0 = time.perf_counter()

    def device_mels_async(batch: np.ndarray, lengths: np.ndarray):
        """Dispatch the jitted mel program; returns (device mels, HOST
        mel lengths) — no sync, the writer thread pays the one transfer.
        The frame count is deterministic (1 + samples // hop, the same
        formula dsp/mel.py applies on device), so the lengths never need
        to come back from the device."""
        mels_dev, _ = batched_log_mel_with_lengths(
            batch, lengths, sr=cfg.sampling_rate, n_fft=cfg.n_fft,
            hop_length=cfg.hop_length, win_length=cfg.win_length,
            n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax,
            mel_eps=cfg.mel_eps)
        return mels_dev, 1 + lengths // cfg.hop_length

    # ---- Stage 1 (host, process-pool): tokenize + save text ----
    t0 = time.perf_counter()
    text_ok, text_skipped = _run_text_stage(rows, text_dir, text_workers)
    stats["skipped"] += text_skipped
    t_text = time.perf_counter() - t0

    # Partition surviving rows: native fast path (WAV, bucketed by size
    # estimate) vs per-file Python decode.
    native_buckets: Dict[int, List[dict]] = {}
    python_rows: List[dict] = []
    for row in rows:
        base = basename_of(row["filepath"])
        if not text_ok.get(base, False):
            continue
        item = {"base": base, "path": row["filepath"]}
        if use_native and row["filepath"].lower().endswith(".wav"):
            est = _estimated_wav_samples(row["filepath"])
            native_buckets.setdefault(_bucket_len(est), []).append(item)
        else:
            python_rows.append(item)

    # ---- Stage 2a: C++ decode -> async device mels -> writer thread ----
    t0 = time.perf_counter()
    writer = _MelWriter(mels_dir)
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
            mels_dev, lens_dev = device_mels_async(batch,
                                                   lengths.astype(np.int32))
            writer.submit(mels_dev, lens_dev, chunk, usable)
            done += len(chunk)
            if log_every and done % log_every < batch_size:
                print(f"  native: {done}/{len(rows)}")
    writer.drain()
    python_rows.extend(writer.fallback)   # wrong rate/size: slow path
    writer.fallback = []
    t_native = time.perf_counter() - t0

    # ---- Stage 2b: per-file Python load, bucketed, same pipeline ----
    t0 = time.perf_counter()
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
            mels_dev, lens_dev = device_mels_async(batch, lengths)
            writer.submit(mels_dev, lens_dev, chunk)
    writer.close()   # close() drains; no per-bucket barrier
    stats["ok"] += writer.ok
    t_python = time.perf_counter() - t0

    shutil.copyfile(metadata_path, os.path.join(output_dir, "metadata.csv"))
    wall = time.perf_counter() - wall0
    print(f"  stage breakdown: text {t_text:.2f}s | native pipeline "
          f"{t_native:.2f}s (D2H+save {writer.transfer_sec:.2f}s "
          f"overlapped) | python path {t_python:.2f}s | total {wall:.2f}s")
    print(f"Preprocessing complete: {stats['ok']} ok, "
          f"{stats['skipped']} skipped -> {output_dir}")
    return stats
