"""Quality metrics (utils/quality.py) + the eval_quality CLI.

The metrics close the VERDICT r2 gap that mel-L1-preserving regressions
(duration drift, attention smear) were invisible: each metric is pinned
on synthetic cases with known answers.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from tacotron2_tpu.utils.quality import (alignment_diagonality,
                                         gate_timing_error, mcd_dtw,
                                         mcd_frame_aligned, mel_cepstra,
                                         summarize)


class TestMCD:
    def test_identical_mels_zero(self, rng):
        mel = rng.standard_normal((40, 80)) - 5.0
        assert mcd_frame_aligned(mel, mel) == 0.0
        assert mcd_dtw(mel, mel) == pytest.approx(0.0, abs=1e-6)

    def test_scaling_monotone(self, rng):
        mel = rng.standard_normal((40, 80)) - 5.0
        small = mcd_frame_aligned(mel + 0.1, mel)
        big = mcd_frame_aligned(mel + 1.0, mel)
        assert 0 < small < big

    def test_energy_offset_excluded(self, rng):
        """A constant offset over all mel bins lands in c0 only — MCD
        (coefficients 1..K) must ignore it."""
        mel = rng.standard_normal((40, 80)) - 5.0
        assert mcd_frame_aligned(mel + 3.0, mel) == pytest.approx(0.0,
                                                                  abs=1e-8)

    def test_dtw_absorbs_time_stretch(self, rng):
        """A 2x time-stretched copy is far under frame-aligned comparison
        but close under DTW."""
        t = np.linspace(0, 4 * np.pi, 60)
        mel = (np.sin(t)[:, None] * np.linspace(1, 0.3, 80)[None]) - 5.0
        stretched = np.repeat(mel, 2, axis=0)
        aligned = mcd_frame_aligned(stretched[:60], mel)
        warped = mcd_dtw(stretched, mel)
        assert warped < 0.5 * aligned
        assert warped < 2.0   # near-equal content under warping

    def test_cepstra_shape(self, rng):
        c = mel_cepstra(rng.standard_normal((10, 80)), n_coefs=13)
        assert c.shape == (10, 13)


class TestGateTiming:
    def test_exact(self):
        assert gate_timing_error(300, 300) == 0
        assert gate_timing_error(290, 300) == 10
        assert gate_timing_error(310, 300) == 10


class TestDiagonality:
    def test_perfect_diagonal_scores_high(self):
        t_dec, t_enc = 100, 25
        attn = np.zeros((t_dec, t_enc))
        for t in range(t_dec):
            attn[t, int(t / t_dec * t_enc)] = 1.0
        assert alignment_diagonality(attn) > 0.99

    def test_uniform_attention_scores_low(self):
        attn = np.full((100, 25), 1 / 25)
        score = alignment_diagonality(attn)
        # uniform mass in a ~2*0.12 band ~= 0.25-0.35
        assert score < 0.5

    def test_collapsed_attention_scores_low(self):
        attn = np.zeros((100, 25))
        attn[:, 0] = 1.0      # stuck on the first token
        assert alignment_diagonality(attn) < 0.3

    def test_respects_true_lengths(self):
        """Padding rows/cols must not dilute the score."""
        t_dec, t_enc = 50, 10
        attn = np.zeros((80, 32))
        for t in range(t_dec):
            attn[t, int(t / t_dec * t_enc)] = 1.0
        assert alignment_diagonality(attn, text_len=t_enc,
                                     mel_len=t_dec) > 0.99


def test_summarize():
    s = summarize([1.0, 2.0, 3.0])
    assert s["n"] == 3 and s["mean"] == 2.0 and s["median"] == 2.0
    assert summarize([]) == {"n": 0}


class TestEvalQualityCLI:
    def test_end_to_end_cli(self, tmp_path):
        """Full CLI run on a fresh default-architecture checkpoint + a
        3-item synthetic corpus: exit 0, report structure, value sanity
        (fresh weights -> nonzero MCD, diagonality in [0, 1])."""
        import os

        import jax

        from tacotron2_tpu.config import Config
        from tacotron2_tpu.models import tacotron2_init
        from tacotron2_tpu.train import create_train_state
        from tacotron2_tpu.train.checkpoint import save_checkpoint

        cfg = Config()
        params, state = tacotron2_init(jax.random.PRNGKey(0), cfg.model)
        tstate = create_train_state(cfg, seed=0)
        tstate = tstate._replace(params=params, model_state=state)
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, tstate, epoch=0, best_val_mel=1.0)

        root = tmp_path / "corpus"
        os.makedirs(root / "text")
        os.makedirs(root / "mels")
        rng = np.random.default_rng(0)
        lines = ["filepath,text"]
        for i in range(3):
            base = f"Q-{i:03d}"
            np.save(root / "text" / f"{base}.npy",
                    rng.integers(1, 72, (8,)).astype(np.int32))
            np.save(root / "mels" / f"{base}.npy",
                    (rng.standard_normal((80, 20)) - 5.0).astype(np.float32))
            lines.append(f"/wavs/{base}.wav,text {i}")
        meta = root / "metadata.csv"
        meta.write_text("\n".join(lines))

        out = tmp_path / "report.json"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, "tools/eval_quality.py", ckpt, str(meta),
             "--n", "3", "--out", str(out), "--skip-ar"],
            capture_output=True, text=True, timeout=600, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(out.read_text())
        assert report["n_items"] == 3
        assert report["mcd_teacher_forced_db"]["n"] == 3
        assert report["mcd_teacher_forced_db"]["mean"] > 0
        assert 0.0 <= report["alignment_diagonality"]["mean"] <= 1.0

    def test_api_report(self, tmp_path):
        """Metric pipeline through the Python API on a tiny model (the
        CLI is a thin wrapper over exactly these calls)."""
        import jax
        import jax.numpy as jnp
        import dataclasses

        from tacotron2_tpu.config import Config, ModelConfig
        from tacotron2_tpu.models import (tacotron2_forward,
                                          tacotron2_infer_jit,
                                          tacotron2_init)

        small = Config(model=ModelConfig(
            symbols_embedding_dim=32, encoder_embedding_dim=32,
            decoder_rnn_dim=48, prenet_dim=16, attention_rnn_dim=48,
            attention_dim=24, location_n_filters=8, location_kernel_size=15,
            postnet_embedding_dim=24, max_decoder_steps=40))
        params, state = tacotron2_init(jax.random.PRNGKey(0), small.model)
        rng = np.random.default_rng(0)
        text = rng.integers(1, 72, (8,)).astype(np.int32)
        mel = (rng.standard_normal((80, 20)) - 5.0).astype(np.float32)

        out, _ = tacotron2_forward(
            params, state, small.model, jnp.asarray(text[None]),
            jnp.asarray(mel[None]), jnp.asarray([8], jnp.int32),
            jax.random.PRNGKey(0), train=False, use_postnet=True)
        m = mcd_frame_aligned(np.asarray(out.mel_postnet[0]), mel.T)
        d = alignment_diagonality(np.asarray(out.alignments[0]),
                                  text_len=8, mel_len=20)
        assert np.isfinite(m) and m > 0
        assert 0.0 <= d <= 1.0

        aout, n, ends = tacotron2_infer_jit(
            params, state, small.model, jnp.asarray(text[None]),
            max_steps=30)
        end = int(np.asarray(ends)[0])
        md = mcd_dtw(np.asarray(aout.mel_postnet[0])[:max(end, 1)], mel.T)
        ge = gate_timing_error(end, 20)
        assert np.isfinite(md) and ge >= 0
