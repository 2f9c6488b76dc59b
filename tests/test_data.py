"""Data layer tests: metadata prep, offline preprocessing, bucketed loading.

Uses a synthetic miniature LJSpeech-format corpus (sine-tone wavs) created
on the fly — the same end-to-end path a real corpus takes
(reference flow: prepare_ljspeech.py -> preprocess.py -> data_utils.py).
"""

import os

import numpy as np
import pytest

from tacotron2_tpu.config import AudioConfig
from tacotron2_tpu.data import (BatchLoader, TextMelDataset, collate,
                                prepare_ljspeech_metadata, preprocess_corpus,
                                read_metadata)
from tacotron2_tpu.dsp import get_mel_spectrogram, save_wav

TEXTS = [
    "Hello world.",
    "The quick brown fox.",
    "Testing one two three.",
    "A longer sentence for the synthetic corpus fixture, with numbers like 42.",
    "Short.",
    "Speech synthesis on tensor processing units.",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("lj_corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(7)
    lines = []
    for i, text in enumerate(TEXTS):
        dur = 0.3 + 0.15 * i
        n = int(22050 * dur)
        t = np.arange(n) / 22050
        y = (0.3 * np.sin(2 * np.pi * (220 * (i + 1)) * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        save_wav(str(wavs / f"LJTEST-{i:04d}.wav"), y, 22050)
        lines.append(f"LJTEST-{i:04d}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return str(root)


@pytest.fixture(scope="module")
def processed(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("processed")
    meta = os.path.join(str(out), "raw_metadata.csv")
    n = prepare_ljspeech_metadata(corpus, meta)
    assert n == len(TEXTS)
    stats = preprocess_corpus(meta, str(out), batch_size=4)
    assert stats["ok"] == len(TEXTS)
    assert stats["skipped"] == 0
    return str(out)


class TestMetadataPrep:
    def test_columns_and_paths(self, corpus, tmp_path):
        meta = str(tmp_path / "m.csv")
        prepare_ljspeech_metadata(corpus, meta)
        rows = read_metadata(meta)
        assert set(rows[0].keys()) == {"filepath", "text"}
        assert all(os.path.isabs(r["filepath"]) for r in rows)
        assert rows[1]["text"] == TEXTS[1]


class TestPreprocess:
    def test_cache_files_exist(self, processed):
        rows = read_metadata(os.path.join(processed, "metadata.csv"))
        assert len(rows) == len(TEXTS)
        for i in range(len(TEXTS)):
            assert os.path.isfile(
                os.path.join(processed, "mels", f"LJTEST-{i:04d}.npy"))
            assert os.path.isfile(
                os.path.join(processed, "text", f"LJTEST-{i:04d}.npy"))

    def test_batched_mel_matches_per_file(self, processed):
        rows = read_metadata(os.path.join(processed, "metadata.csv"))
        cached = np.load(os.path.join(processed, "mels", "LJTEST-0002.npy"))
        solo = np.asarray(get_mel_spectrogram(rows[2]["filepath"],
                                              AudioConfig()))
        assert cached.shape == solo.shape
        np.testing.assert_allclose(cached, solo, rtol=1e-4, atol=1e-4)

    def test_mel_is_log_scale(self, processed):
        mel = np.load(os.path.join(processed, "mels", "LJTEST-0000.npy"))
        assert mel.shape[0] == 80
        assert mel.min() < -0.5  # log-mels are negative-heavy
        assert mel.min() >= np.log(1e-5) - 1e-4  # clipped floor


class TestDatasetAndLoader:
    def test_getitem(self, processed):
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        ex = ds[0]
        assert ex.text.dtype == np.int32
        assert ex.mel.dtype == np.float32
        assert ex.mel.shape[0] == 80

    def test_collate_static_shapes(self, processed):
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        batch = collate([ds[i] for i in range(4)], text_pad_multiple=32,
                        mel_pad_multiple=64)
        assert batch["text"].shape[1] % 32 == 0
        assert batch["mel"].shape[2] % 64 == 0
        # sorted by text length descending
        assert (np.diff(batch["text_lengths"]) <= 0).all()
        # padding is zeros
        i = int(np.argmin(batch["text_lengths"]))
        assert (batch["text"][i, batch["text_lengths"][i]:] == 0).all()

    def test_loader_epoch(self, processed):
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        loader = BatchLoader(ds, batch_size=2, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["text"].shape[0] == 2
            assert b["mel"].shape[0] == 2

    def test_loader_rejects_zero_batch_epochs(self, processed):
        # drop_last + dataset smaller than the global batch would yield
        # ZERO batches every epoch (training would silently do nothing):
        # the loader must fail fast instead.
        import pytest
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        with pytest.raises(ValueError, match="zero batches"):
            BatchLoader(ds, batch_size=len(ds) + 1)
        with pytest.raises(ValueError, match="zero batches"):
            BatchLoader(ds, batch_size=4, process_index=0, process_count=2)
        # drop_last=False tolerates it (trailing partial batch)
        assert len(BatchLoader(ds, batch_size=len(ds) + 1,
                               drop_last=False)) == 1

    def test_loader_partial_batch_kept_for_validation(self, processed):
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        loader = BatchLoader(ds, batch_size=4, shuffle=False,
                             drop_last=False)
        batches = list(loader)
        assert len(batches) == 2  # 6 examples -> 4 + 2
        assert batches[-1]["text"].shape[0] == 2

    def test_loader_deterministic_with_seed(self, processed):
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        a = [b["text_lengths"].tolist()
             for b in BatchLoader(ds, batch_size=2, seed=5)]
        b = [b["text_lengths"].tolist()
             for b in BatchLoader(ds, batch_size=2, seed=5)]
        assert a == b

    def test_prefetch_matches_sync(self, processed):
        """The background-prefetch iterator yields byte-identical batches
        in the same order as the synchronous path."""
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        sync = list(BatchLoader(ds, batch_size=2, seed=7, prefetch=0))
        pre = list(BatchLoader(ds, batch_size=2, seed=7, prefetch=2))
        assert len(sync) == len(pre) > 0
        for bs, bp in zip(sync, pre):
            for k in bs:
                np.testing.assert_array_equal(bs[k], bp[k])

    def test_prefetch_propagates_errors(self, processed, tmp_path):
        """A dataset failure on the producer thread surfaces on the
        consuming thread, not as a silent hang."""
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))

        class Exploding:
            def __len__(self):
                return len(ds)

            def text_length(self, i):
                return ds.text_length(i)

            def __getitem__(self, i):
                raise OSError("disk gone")

        loader = BatchLoader(Exploding(), batch_size=2, seed=0, prefetch=2,
                             sort_pool=False)
        with pytest.raises(OSError, match="disk gone"):
            list(loader)

    def test_prefetch_early_abandon_does_not_hang(self, processed):
        ds = TextMelDataset(os.path.join(processed, "metadata.csv"))
        loader = BatchLoader(ds, batch_size=2, seed=0, prefetch=1)
        it = iter(loader)
        next(it)
        it.close()  # consumer walks away mid-epoch; must not deadlock
