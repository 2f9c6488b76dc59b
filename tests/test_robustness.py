"""Robustness / property tests: frontend on arbitrary input, DSP on varied
lengths, loader invariants — the edge cases a production deployment hits.
"""

import numpy as np

import jax

from tacotron2_tpu.config import SYMBOLS, Config, ModelConfig
from tacotron2_tpu.dsp import log_mel_spectrogram
from tacotron2_tpu.models import tacotron2_infer_jit, tacotron2_init
from tacotron2_tpu.text import (normalize_text, pad_sequences,
                                text_to_sequence)

SMALL = ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=20)


class TestFrontendRobustness:
    def test_arbitrary_unicode_and_symbols(self):
        for s in ["", "   ", "!!!", "1234567890", "ünïcödé tëxt",
                  "mixed 42nd CASE, punct!?;", "\t\nwhitespace\r\n",
                  "a" * 500]:
            seq = text_to_sequence(s)
            assert all(0 <= i < len(SYMBOLS) for i in seq)

    def test_normalizer_idempotent(self):
        for s in ["Hello World 42!", "well-known facts", "a  b   c"]:
            once = normalize_text(s)
            assert normalize_text(once) == once

    def test_empty_text_pads_to_one_token(self):
        tokens, lengths = pad_sequences([[]])
        assert tokens.shape == (1, 1)
        assert lengths[0] == 0


class TestDspRobustness:
    def test_various_signal_lengths(self):
        # lengths around hop/frame boundaries must not crash or mis-shape
        for n in [1024, 1025, 1279, 1280, 4096, 22050]:
            y = np.sin(np.arange(n) * 0.01).astype(np.float32)
            mel = np.asarray(log_mel_spectrogram(y))
            assert mel.shape == (80, 1 + n // 256)
            assert np.isfinite(mel).all()

    def test_silence_hits_log_floor(self):
        mel = np.asarray(log_mel_spectrogram(np.zeros(4096, np.float32)))
        np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-5)

    def test_clipping_amplitude_finite(self):
        y = np.full(4096, 10.0, np.float32)  # way beyond [-1, 1]
        mel = np.asarray(log_mel_spectrogram(y))
        assert np.isfinite(mel).all()


class TestInferenceRobustness:
    def test_minimal_one_token_input(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        tokens = np.zeros((1, 1), np.int32)
        out, n, _ = tacotron2_infer_jit(params, state, SMALL,
                                        jax.numpy.asarray(tokens),
                                        max_steps=8)
        assert int(n) >= 1
        assert np.isfinite(np.asarray(out.mel_postnet)).all()

    def test_batch_of_identical_texts_identical_outputs(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        rng = np.random.default_rng(0)
        row = rng.integers(1, 72, (1, 9))
        tokens = np.repeat(row, 3, axis=0).astype(np.int32)
        out, n, _ = tacotron2_infer_jit(params, state, SMALL,
                                        jax.numpy.asarray(tokens),
                                        max_steps=10)
        m = np.asarray(out.mel_postnet)
        np.testing.assert_allclose(m[0], m[1], atol=1e-5)
        np.testing.assert_allclose(m[0], m[2], atol=1e-5)


class TestPlatformPinning:
    def test_jax_platforms_env_survives_sitecustomize(self):
        """A CLI launched with JAX_PLATFORMS=cpu must actually run on CPU.

        This image's sitecustomize forces jax_platforms to the hardware
        plugin at `import jax`, overriding the env var — so without the
        re-assert in enable_persistent_cache() a cpu-pinned subprocess
        blocks retrying the device tunnel whenever another tenant holds
        the time-shared chip (observed as tools/eval_quality.py hanging
        to its 600 s timeout mid-suite).
        """
        import os
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, "-c",
             "from tacotron2_tpu.utils.cache import enable_persistent_cache\n"
             "enable_persistent_cache()\n"
             "import jax\n"
             "print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=300, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert proc.stdout.strip().splitlines()[-1] == "cpu"
