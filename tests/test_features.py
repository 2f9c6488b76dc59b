"""Feature tests: long-form streaming synthesis, multi-speaker
conditioning, profiling utilities.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Config, ModelConfig
from tacotron2_tpu.infer.longform import split_sentences, synthesize_longform
from tacotron2_tpu.models import (tacotron2_forward, tacotron2_infer_jit,
                                  tacotron2_init)
from tacotron2_tpu.utils.profiling import StepTimer

SMALL_MODEL = ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=40)
SMALL = Config(model=SMALL_MODEL)


class TestSentenceSplit:
    def test_split(self):
        s = split_sentences("Hello world. How are you? Fine! Done;")
        assert s == ["Hello world.", "How are you?", "Fine!", "Done;"]

    def test_single_sentence(self):
        assert split_sentences("  Just one sentence  ") == ["Just one sentence"]

    def test_empty(self):
        assert split_sentences("   ") == []


class TestLongform:
    def test_paragraph_synthesis(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        text = ("Myself Frank Underwood. I am testing paragraphs! "
                "Streaming decode works; sentence by sentence.")
        wav, mels = synthesize_longform(params, state, text, SMALL,
                                        max_steps_per_sentence=16,
                                        griffinlim_iters=4)
        assert len(mels) == 4  # split at '.', '!', ';'
        assert wav.ndim == 1 and wav.size > 0
        assert np.isfinite(wav).all()
        # inter-sentence silences present: total longer than sum of pieces
        piece_samples = sum(m.shape[0] * 256 for m in mels)
        assert wav.size >= piece_samples

    def test_oneshot_concatenation_exact(self):
        """r5 (VERDICT r4 item 6): the default longform path rides the
        one-dispatch proportional program per token bucket; the output
        waveform must be EXACTLY the per-sentence PCM pieces (trimmed at
        each sentence's own gate stop) joined by the fixed silences —
        byte-identical to invoking the bucket program directly."""
        from tacotron2_tpu.infer.fused import synthesize_pcm_proportional
        from tacotron2_tpu.text import pad_sequences, text_to_sequence

        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        text = "Alpha beta gamma. Delta epsilon! A zeta eta theta now;"
        silence_ms = 80.0
        wav, mels = synthesize_longform(
            params, state, text, SMALL, max_steps_per_sentence=12,
            griffinlim_iters=3, silence_ms=silence_ms)

        # Reference assembly: same grouping logic (all three sentences
        # land in the 32-token bucket), one direct program call.
        sentences = split_sentences(text)
        seqs = [text_to_sequence(s) or [0] for s in sentences]
        bucket = 32
        assert all(len(s) <= bucket for s in seqs)
        tokens, lengths = pad_sequences(seqs, pad_to=bucket)
        pcm, ends, _, mel = synthesize_pcm_proportional(
            params, state, SMALL.model, SMALL.audio,
            jnp.asarray(tokens), jnp.asarray(lengths), None,
            max_steps=12, stop_mode="all", gl_iters=3, return_mel=True)
        hop = SMALL.audio.hop_length
        sil = np.zeros(int(SMALL.audio.sampling_rate * silence_ms / 1000.0),
                       np.float32)
        pieces = []
        for row in range(len(seqs)):
            n = int(ends[row])
            pieces.append(pcm[row, : n * hop].astype(np.float32) / 32767.0)
            if row < len(seqs) - 1:
                pieces.append(sil)
        expect = np.concatenate(pieces)
        assert wav.shape == expect.shape
        np.testing.assert_array_equal(wav, expect)
        # per-sentence mels trim at the same gate stops
        assert [m.shape[0] for m in mels] == [int(e) for e in ends]


class TestMultiSpeaker:
    def test_speaker_conditioning_changes_output(self):
        import dataclasses
        cfg = dataclasses.replace(SMALL_MODEL, n_speakers=4)
        params, state = tacotron2_init(jax.random.PRNGKey(0), cfg)
        assert "speaker" in params
        rng = np.random.default_rng(0)
        text = jnp.asarray(rng.integers(1, 72, (2, 9)), jnp.int32)
        mel = jnp.asarray(rng.standard_normal((2, 80, 12)) - 5.0, jnp.float32)
        lengths = jnp.asarray([9, 9], jnp.int32)
        out_a, _ = tacotron2_forward(
            params, state, cfg, text, mel, lengths,
            jax.random.PRNGKey(1), train=False,
            speaker_ids=jnp.asarray([0, 0], jnp.int32))
        out_b, _ = tacotron2_forward(
            params, state, cfg, text, mel, lengths,
            jax.random.PRNGKey(1), train=False,
            speaker_ids=jnp.asarray([1, 2], jnp.int32))
        assert not np.allclose(np.asarray(out_a.mel_coarse),
                               np.asarray(out_b.mel_coarse))

    def test_single_speaker_has_no_speaker_params(self):
        params, _ = tacotron2_init(jax.random.PRNGKey(0), SMALL_MODEL)
        assert "speaker" not in params

    def test_synthesize_mels_speaker_selection(self):
        import dataclasses
        from tacotron2_tpu.infer import synthesize_mels
        cfg_m = dataclasses.replace(SMALL_MODEL, n_speakers=4)
        cfg = Config(model=cfg_m)
        params, state = tacotron2_init(jax.random.PRNGKey(0), cfg_m)
        a, _ = synthesize_mels(params, state, ["Hello."], cfg, max_steps=8,
                               speaker_id=0)
        b, _ = synthesize_mels(params, state, ["Hello."], cfg, max_steps=8,
                               speaker_id=3)
        assert not np.allclose(a[0], b[0])

    def test_multispeaker_inference(self):
        import dataclasses
        cfg = dataclasses.replace(SMALL_MODEL, n_speakers=4)
        params, state = tacotron2_init(jax.random.PRNGKey(0), cfg)
        text = jnp.asarray(
            np.random.default_rng(0).integers(1, 72, (1, 9)), jnp.int32)
        out, n, _ = tacotron2_infer_jit(params, state, cfg, text,
                                        max_steps=8,
                                        speaker_ids=jnp.asarray([2], jnp.int32))
        assert int(n) >= 1


class TestMultiSpeakerTraining:
    def test_speaker_mapping_and_auto_sizing(self, tmp_path):
        """LibriSpeech-style metadata (raw speaker ids) -> contiguous
        embedding indices; train() auto-sizes the speaker table."""
        import csv as _csv
        import dataclasses
        import os

        from tacotron2_tpu.data import TextMelDataset
        from tacotron2_tpu.dsp import save_wav
        from tacotron2_tpu.data import preprocess_corpus

        root = tmp_path / "corpus"
        (root / "wavs").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(4):
            n = int(22050 * 0.3)
            y = (0.3 * np.sin(np.arange(n) * 0.03 * (i + 1))).astype(
                np.float32)
            fp = str(root / "wavs" / f"MS-{i:04d}.wav")
            save_wav(fp, y, 22050)
            rows.append({"filepath": os.path.abspath(fp),
                         "text": f"sample number {i}",
                         "speaker_id": str([1089, 1089, 2300, 9023][i])})
        meta = str(tmp_path / "meta.csv")
        with open(meta, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["filepath", "text",
                                               "speaker_id"])
            w.writeheader()
            w.writerows(rows)
        out = str(tmp_path / "processed")
        preprocess_corpus(meta, out, batch_size=4)

        ds = TextMelDataset(os.path.join(out, "metadata.csv"))
        assert ds.n_speakers == 3
        assert sorted({ds[i].speaker_id for i in range(4)}) == [0, 1, 2]

        from tacotron2_tpu.train import train as train_fn
        cfg = dataclasses.replace(
            SMALL, train=dataclasses.replace(
                SMALL.train, epochs=1, batch_size=4, text_pad_multiple=8,
                mel_pad_multiple=16))
        state = train_fn(os.path.join(out, "metadata.csv"),
                         str(tmp_path / "ckpt"), cfg=cfg)
        assert "speaker" in state.params
        table = np.asarray(state.params["speaker"]["embedding"]["table"])
        assert table.shape[0] == 3


class TestProfilerTrace:
    def test_trace_writes_xplane(self, tmp_path):
        import jax.numpy as jnp_

        from tacotron2_tpu.utils.profiling import trace
        d = str(tmp_path / "prof")
        with trace(d):
            (jnp_.ones((64, 64)) @ jnp_.ones((64, 64))).block_until_ready()
        import glob as g
        assert g.glob(d + "/**/*.xplane.pb", recursive=True)


class TestStepTimer:
    def test_stats(self):
        t = StepTimer(window=10)
        import time
        for _ in range(4):
            t.tick()
            time.sleep(0.01)
        s = t.stats(frames_per_step=100)
        assert s["step_time_s"] > 0.005
        assert s["steps_per_sec"] > 0
        assert s["mel_frames_per_sec"] > 0
        assert t.total_steps == 4


class TestSynthCorpusTool:
    def test_multispeaker_metadata_feeds_data_layer(self, tmp_path):
        """tools/make_synth_corpus.py --n_speakers writes a
        filepath,text,speaker_id CSV whose speakers map to contiguous
        embedding ids, and whose audio differs across speakers (scaled
        formants) — the corpus a multi-speaker evidence run trains on."""
        import csv as _csv
        import os
        import subprocess
        import sys

        out = str(tmp_path / "ms")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools",
                                          "make_synth_corpus.py"),
             out, "--n", "6", "--seed", "3", "--n_speakers", "2"],
            check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
        with open(os.path.join(out, "metadata.csv")) as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 6
        assert {r["speaker_id"] for r in rows} == {"0", "1"}
        from scipy.io import wavfile
        sr0, y0 = wavfile.read(rows[0]["filepath"])
        sr1, y1 = wavfile.read(rows[1]["filepath"])
        assert sr0 == sr1 == 22050
        # different formant scale -> different spectra: compare spectral
        # centroids of the two speakers' first utterances
        def centroid(y):
            s = np.abs(np.fft.rfft(y[: 22050]))
            fr = np.fft.rfftfreq(len(y[: 22050]), 1 / 22050)
            return float((s * fr).sum() / s.sum())
        assert abs(centroid(y1) - centroid(y0)) > 50.0

    def test_single_speaker_pipe_format(self, tmp_path):
        import os
        import subprocess
        import sys
        out = str(tmp_path / "ss")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools",
                                          "make_synth_corpus.py"),
             out, "--n", "3", "--seed", "3"],
            check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
        first = open(os.path.join(out, "metadata.csv")).readline()
        assert first.count("|") == 2  # LJSpeech pipe format

    def test_prosody_variation(self):
        """r5: --prosody adds rate/duration jitter, pitch wobble and a
        noise floor (a harder, more speech-like duration problem), while
        prosody=0 reproduces the r4 deterministic corpus BIT-FOR-BIT
        (identical rng consumption), keeping every committed evidence
        corpus regenerable."""
        import importlib.util
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "msc", os.path.join(repo, "tools", "make_synth_corpus.py"))
        msc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(msc)
        ph = "HH AH0 L OW1 W ER1 L D".split()
        base = msc.synth_utterance(ph, np.random.default_rng(7))
        again = msc.synth_utterance(ph, np.random.default_rng(7),
                                    prosody=0.0)
        np.testing.assert_array_equal(base, again)
        v1 = msc.synth_utterance(ph, np.random.default_rng(7), prosody=0.2)
        v2 = msc.synth_utterance(ph, np.random.default_rng(8), prosody=0.2)
        assert len(v1) != len(v2)          # per-utterance rate/jitter
        assert len(v1) != len(base)
        # durations stay centered: within ±25% of the deterministic length
        assert 0.75 < len(v1) / len(base) < 1.25
        # noise floor present in the silence-free leading samples
        assert np.abs(v1[:64]).max() > 0.0

    def test_fingerprint_stable_across_runs(self):
        """crc32-keyed formants: same phoneme -> same params regardless of
        interpreter hash seed (regression for the salted-hash bug)."""
        import importlib.util
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "synth_corpus_tool", os.path.join(repo, "tools",
                                              "make_synth_corpus.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        import zlib
        rng = np.random.default_rng(0)
        h = zlib.crc32(b"AA") % 1000
        f1, f2, *_ = mod._phoneme_params("AA", rng)
        assert f1 == 220.0 + (h % 17) * 40.0
        assert f2 == 900.0 + (h % 23) * 110.0
        assert mod._phoneme_params("AA", rng) == mod._phoneme_params("AA",
                                                                     rng)
