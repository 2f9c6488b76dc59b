"""End-to-end pipeline tests with a reduced-size model on a synthetic
corpus: prepare -> preprocess -> train --debug (overfit, alignment PNGs,
WAV export) -> inference synthesis.

This recreates the reference's de-facto integration test (the debug
overfit flow, reference: train.py:396-486) as an automated pytest.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

from tacotron2_tpu.config import Config, ModelConfig, TrainConfig
from tacotron2_tpu.data import prepare_ljspeech_metadata, preprocess_corpus
from tacotron2_tpu.dsp import save_wav
from tacotron2_tpu.infer import load_model, synthesize_mels
from tacotron2_tpu.train import train

SMALL_CFG = Config(
    model=ModelConfig(
        symbols_embedding_dim=48, encoder_embedding_dim=48,
        decoder_rnn_dim=64, prenet_dim=24, attention_rnn_dim=64,
        attention_dim=24, location_n_filters=8, location_kernel_size=15,
        postnet_embedding_dim=32, max_decoder_steps=120),
    train=TrainConfig(epochs=3, batch_size=4, debug_batch_size=4,
                      debug_sigma_warmup_steps=40,
                      debug_success_mel_l1=10.0,  # smoke threshold: tiny
                      #                             model, few iterations
                      text_pad_multiple=8, mel_pad_multiple=16))

TEXTS = [
    "Hello world.",
    "Testing speech synthesis.",
    "The quick brown fox jumps.",
    "Tensor processing units are fast.",
]


@pytest.fixture(scope="module")
def processed(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(3)
    lines = []
    for i, text in enumerate(TEXTS):
        n = int(22050 * (0.25 + 0.05 * i))
        t = np.arange(n) / 22050
        y = (0.3 * np.sin(2 * np.pi * 300 * (i + 1) * t)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        save_wav(str(wavs / f"LJE2E-{i:04d}.wav"), y, 22050)
        lines.append(f"LJE2E-{i:04d}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

    out = tmp_path_factory.mktemp("processed_e2e")
    meta = str(out / "raw.csv")
    prepare_ljspeech_metadata(str(root), meta)
    preprocess_corpus(meta, str(out), batch_size=4)
    return str(out)


@pytest.fixture(scope="module")
def debug_run(processed, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt_e2e"))
    state = train(os.path.join(processed, "metadata.csv"), ckpt_dir,
                  cfg=SMALL_CFG, debug_overfit=True)
    return ckpt_dir, state


class TestDebugOverfit:
    def test_artifacts_exported(self, debug_run):
        ckpt_dir, _ = debug_run
        export = os.path.join(ckpt_dir, "debug_export")
        assert os.path.isdir(os.path.join(export, "overfit_model"))
        assert os.path.isfile(os.path.join(export, "debug_batch.npz"))
        assert os.path.isfile(os.path.join(export, "pairs.csv"))
        assert os.path.isfile(os.path.join(export,
                                           "debug_infer_alignment.png"))
        # per-sample phoneme text + mel files
        assert len(glob.glob(os.path.join(export, "sample_*.txt"))) == 4
        assert len(glob.glob(os.path.join(export, "debug_infer_mel_*.npy"))) == 4
        # WAV export via Griffin-Lim fallback
        assert len(glob.glob(os.path.join(export, "debug_infer_*.wav"))) >= 1

    def test_alignment_pngs_saved(self, debug_run):
        ckpt_dir, _ = debug_run
        assert glob.glob(os.path.join(ckpt_dir, "debug_alignment_iter_*.png"))

    def test_steps_advanced(self, debug_run):
        _, state = debug_run
        assert int(state.step) >= 1


class TestInferencePipeline:
    def test_checkpoint_load_and_synthesize(self, debug_run):
        ckpt_dir, _ = debug_run
        ckpt = os.path.join(ckpt_dir, "debug_export", "overfit_model")
        params, model_state = load_model(ckpt, SMALL_CFG)
        # Weights must land ON DEVICE: the backend-independent restore
        # yields host numpy, and host operands would re-upload the whole
        # parameter set on every synthesis dispatch (~43 MB — measured
        # 1.9 s/call vs 76 ms through a tunneled chip).
        import jax
        for leaf in jax.tree_util.tree_leaves(params):
            assert isinstance(leaf, jax.Array), type(leaf)
        mels, aligns = synthesize_mels(params, model_state,
                                       ["Hello world."], SMALL_CFG,
                                       max_steps=40)
        assert len(mels) == 1
        assert mels[0].shape[1] == SMALL_CFG.model.n_mels
        assert mels[0].shape[0] >= 1
        assert np.isfinite(mels[0]).all()


class TestNormalTrainingLoop:
    def test_one_epoch_with_validation(self, processed, tmp_path_factory):
        ckpt_dir = str(tmp_path_factory.mktemp("ckpt_normal"))
        cfg = dataclasses.replace(
            SMALL_CFG, train=dataclasses.replace(SMALL_CFG.train, epochs=1))
        meta = os.path.join(processed, "metadata.csv")
        state = train(meta, ckpt_dir, cfg=cfg, val_metadata=meta)
        assert int(state.step) == 1  # 4 examples / batch 4 = 1 step
        assert os.path.isdir(os.path.join(ckpt_dir, "tacotron2_epoch_1"))
        assert os.path.isdir(os.path.join(ckpt_dir, "best_model"))
        assert os.path.isfile(os.path.join(ckpt_dir, "training_log.txt"))
        assert glob.glob(os.path.join(ckpt_dir, "alignment_epoch_1.png"))

    def test_resume(self, processed, tmp_path_factory):
        ckpt_dir = str(tmp_path_factory.mktemp("ckpt_resume"))
        cfg = dataclasses.replace(
            SMALL_CFG, train=dataclasses.replace(SMALL_CFG.train, epochs=1))
        meta = os.path.join(processed, "metadata.csv")
        train(meta, ckpt_dir, cfg=cfg)
        cfg2 = dataclasses.replace(
            SMALL_CFG, train=dataclasses.replace(SMALL_CFG.train, epochs=2))
        state = train(meta, ckpt_dir, cfg=cfg2,
                      resume=os.path.join(ckpt_dir, "tacotron2_epoch_1"))
        # Reference resume semantics (train.py:373,490): the checkpoint
        # stores the just-finished 0-based epoch and training restarts AT
        # that epoch — so epochs 0 and 1 both run again: 1 + 2 = 3 steps.
        assert int(state.step) == 3
