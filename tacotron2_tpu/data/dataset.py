"""Preprocessed (text, mel) dataset and static-shape batch assembly.

Counterpart of the reference's dataset + collate pair
(reference: src/data_utils.py:9-83), redesigned for XLA:

  * the collate's dynamic max-length padding (src/data_utils.py:57-61) is
    replaced by *quantized* padding — padded dims are rounded up to fixed
    multiples so the jitted train step sees a small, finite set of shapes
    instead of one shape per batch;
  * batches keep the reference's sort-by-text-length-descending order
    (src/data_utils.py:54-56);
  * everything returned is a numpy array, ready for a single host->device
    transfer.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from .metadata import basename_of, read_metadata


@dataclasses.dataclass
class Example:
    text: np.ndarray   # (T_text,) int32
    mel: np.ndarray    # (n_mels, T_mel) float32
    speaker_id: int = 0


class TextMelDataset:
    """Loads preprocessed ``.npy`` caches listed in a metadata CSV.

    Raw ``speaker_id`` values from the metadata (e.g. LibriSpeech speaker
    numbers like 1089) are mapped to contiguous embedding indices 0..N-1;
    ``n_speakers`` reports N so the training driver can size the speaker
    embedding table.  (The reference records speaker_id but never consumes
    it — prepare_metadata.py:47-51.)
    """

    def __init__(self, metadata_path: str):
        self.rows = read_metadata(metadata_path)
        self.data_dir = os.path.dirname(os.path.abspath(metadata_path))
        raw_ids = sorted({int(r.get("speaker_id", 0) or 0)
                          for r in self.rows})
        self.speaker_map = {raw: i for i, raw in enumerate(raw_ids)}
        self._text_lengths: Dict[int, int] = {}

    @property
    def n_speakers(self) -> int:
        return len(self.speaker_map)

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, index: int) -> Example:
        row = self.rows[index]
        base = basename_of(row["filepath"])
        text = np.load(os.path.join(self.data_dir, "text", f"{base}.npy"))
        mel = np.load(os.path.join(self.data_dir, "mels", f"{base}.npy"))
        speaker = self.speaker_map[int(row.get("speaker_id", 0) or 0)]
        return Example(text=text.astype(np.int32),
                       mel=mel.astype(np.float32), speaker_id=speaker)

    def text_length(self, index: int) -> int:
        """Token count of an example (cached — the loader's length-aware
        pooling asks every epoch; don't re-read the file each time)."""
        if index not in self._text_lengths:
            row = self.rows[index]
            base = basename_of(row["filepath"])
            self._text_lengths[index] = int(np.load(os.path.join(
                self.data_dir, "text", f"{base}.npy")).shape[0])
        return self._text_lengths[index]

    def mel_length(self, index: int) -> int:
        """Mel frame count of an example, from the .npy header only
        (mmap — no data read).  Used by multi-process loaders to agree on
        global padded shapes without loading other hosts' mels."""
        if not hasattr(self, "_mel_lengths"):
            self._mel_lengths: Dict[int, int] = {}
        if index not in self._mel_lengths:
            row = self.rows[index]
            base = basename_of(row["filepath"])
            m = np.load(os.path.join(self.data_dir, "mels", f"{base}.npy"),
                        mmap_mode="r")
            self._mel_lengths[index] = int(m.shape[1])
        return self._mel_lengths[index]


def _round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def collate(examples: Sequence[Example], text_pad_multiple: int = 32,
            mel_pad_multiple: int = 64,
            fixed_text_len: Optional[int] = None,
            fixed_mel_len: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Assemble a static-shape batch dict.

    Sorts by text length descending (reference: src/data_utils.py:54-56),
    zero-pads text and mel, quantizes padded dims.
    """
    order = np.argsort([-len(e.text) for e in examples], kind="stable")
    examples = [examples[i] for i in order]

    text_lengths = np.asarray([len(e.text) for e in examples], dtype=np.int32)
    mel_lengths = np.asarray([e.mel.shape[1] for e in examples],
                             dtype=np.int32)
    t_text = fixed_text_len or _round_up(int(text_lengths.max()),
                                         text_pad_multiple)
    t_mel = fixed_mel_len or _round_up(int(mel_lengths.max()),
                                       mel_pad_multiple)
    n_mels = examples[0].mel.shape[0]

    b = len(examples)
    text = np.zeros((b, t_text), dtype=np.int32)
    mel = np.zeros((b, n_mels, t_mel), dtype=np.float32)
    for i, e in enumerate(examples):
        text[i, :len(e.text)] = e.text
        mel[i, :, :e.mel.shape[1]] = e.mel
    speakers = np.asarray([e.speaker_id for e in examples], dtype=np.int32)
    return {"text": text, "text_lengths": text_lengths, "mel": mel,
            "mel_lengths": mel_lengths, "speaker_ids": speakers}


class BatchLoader:
    """Shuffling epoch iterator producing static-shape batches.

    Replaces the reference's ``DataLoader(shuffle=True, num_workers=0)``
    (reference: train.py:314-317).  ``drop_last`` keeps every batch the same
    size B (a hard requirement under jit).
    """

    def __init__(self, dataset: TextMelDataset, batch_size: int,
                 seed: int = 1234, shuffle: bool = True,
                 text_pad_multiple: int = 32, mel_pad_multiple: int = 64,
                 sort_pool: bool = True, drop_last: bool = True,
                 prefetch: int = 2, process_index: int = 0,
                 process_count: int = 1, allow_empty: bool = False):
        """``drop_last=True`` keeps every batch exactly B (one jit shape);
        validation loaders pass False so small val sets still evaluate
        (the trailing partial batch costs one extra compile).

        ``prefetch`` > 0 assembles up to that many batches ahead on a
        background thread, overlapping disk reads + host collate with
        device compute (the training step runs ~0.1 s on device; a slow
        disk would otherwise stall it).  0 loads synchronously on the
        consuming thread.

        Multi-host data parallelism: with ``process_count`` > 1 every
        process derives the SAME global epoch order and global batch
        partition from the shared seed, then loads only its own
        ``batch_size`` rows of each global batch (global batch =
        batch_size x process_count).  Padded dims are computed from the
        length metadata of the WHOLE global batch (headers only, no data
        reads for other hosts' rows), so all processes collate to
        identical static shapes and compile the identical program —
        required for GSPMD.  Multi-process forces drop_last.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.text_pad_multiple = text_pad_multiple
        self.mel_pad_multiple = mel_pad_multiple
        self.sort_pool = sort_pool
        if process_count > 1:
            drop_last = True      # SPMD needs every process to see a batch
        if not (0 <= process_index < process_count):
            raise ValueError(f"process_index {process_index} not in "
                             f"[0, {process_count})")
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        if drop_last and len(dataset) < batch_size * process_count:
            # With drop_last every epoch would yield ZERO batches.  For a
            # TRAIN loader that means training would "complete" having
            # done nothing — fail fast.  Callers whose consumer handles
            # an empty epoch explicitly (validation: validate() reports
            # 'batches': 0) opt out via allow_empty and get a warning.
            msg = (f"dataset has {len(dataset)} examples but the global "
                   f"batch is {batch_size * process_count} (batch_size "
                   f"{batch_size} x {process_count} processes) with "
                   f"drop_last: every epoch yields zero batches")
            if not allow_empty:
                raise ValueError(msg)
            print(f"[loader] WARNING: {msg}")
        self._rng = np.random.default_rng(seed)

    @property
    def global_batch_size(self) -> int:
        return self.batch_size * self.process_count

    def __len__(self) -> int:
        if self.drop_last:
            return len(self.dataset) // self.global_batch_size
        return -(-len(self.dataset) // self.global_batch_size)

    def _epoch_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        if self.sort_pool and len(idx) > self.global_batch_size:
            # Length-aware pooling: sort shuffled indices by text length in
            # pools of 32 batches, then shuffle the batch order.  Keeps
            # batches length-homogeneous (less padding waste, fewer shapes)
            # while preserving stochasticity.
            pool = self.global_batch_size * 32
            chunks = []
            for s in range(0, len(idx), pool):
                chunk = idx[s:s + pool]
                lens = np.asarray([self.dataset.text_length(i) for i in chunk])
                chunks.append(chunk[np.argsort(-lens, kind="stable")])
            idx = np.concatenate(chunks)
        return idx

    def _iter_sync(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_order()
        n_batches = len(self)
        gb = self.global_batch_size
        batch_starts = np.arange(n_batches) * gb
        if self.shuffle:
            self._rng.shuffle(batch_starts)
        for s in batch_starts:
            rows = idx[s:s + gb]
            if self.process_count > 1:
                # Globally agreed padded dims from length metadata of the
                # full global batch; then load only this process's slice.
                t_text = _round_up(
                    max(self.dataset.text_length(int(i)) for i in rows),
                    self.text_pad_multiple)
                t_mel = _round_up(
                    max(self.dataset.mel_length(int(i)) for i in rows),
                    self.mel_pad_multiple)
                lo = self.process_index * self.batch_size
                members = [self.dataset[int(i)]
                           for i in rows[lo:lo + self.batch_size]]
                if members:
                    yield collate(members, self.text_pad_multiple,
                                  self.mel_pad_multiple,
                                  fixed_text_len=t_text, fixed_mel_len=t_mel)
            else:
                members = [self.dataset[int(i)] for i in rows]
                if members:
                    yield collate(members, self.text_pad_multiple,
                                  self.mel_pad_multiple)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._iter_sync()
            return
        # One producer thread per epoch, bounded queue: batch N+1 (and
        # N+2, ...) are read + collated while the device chews on batch N.
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put_or_abort(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self._iter_sync():
                    if not put_or_abort(batch):
                        return
                put_or_abort(sentinel)
            except BaseException as e:          # propagate to consumer
                put_or_abort(e)

        thread = threading.Thread(target=producer, daemon=True,
                                  name="batch-prefetch")
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            thread.join(timeout=5.0)
