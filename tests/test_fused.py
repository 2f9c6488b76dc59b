"""Fused single-dispatch synthesis tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import AudioConfig, Config, ModelConfig
from tacotron2_tpu.infer.fused import synthesize_wav, synthesize_wav_fused
from tacotron2_tpu.models import tacotron2_init

SMALL = Config(model=ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=32))


class TestFused:
    def test_single_program_produces_audio(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(1, 72, (2, 16)), jnp.int32)
        lengths = jnp.asarray([16, 12], jnp.int32)
        wav, n, ends = synthesize_wav_fused(
            params, state, SMALL.model, SMALL.audio, tokens, lengths, None,
            max_steps=24)
        assert wav.shape == (2, 24 * 256)
        assert int(n) == 24  # fresh weights: gate never fires
        assert np.isfinite(np.asarray(wav)).all()

    def test_host_wrapper_trims_per_item(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        # force immediate gate firing -> 2 recorded frames per item
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)
        wavs = synthesize_wav(params, state, ["Hi there.", "Second one."],
                              SMALL, max_steps=24, gl_iters=4)
        assert len(wavs) == 2
        for w in wavs:
            assert w.shape[0] == 2 * 256  # frame_ends * hop
            assert np.isfinite(w).all()

    def test_masked_tail_is_near_silence(self):
        """Frames beyond the gate stop are floored before vocoding, so the
        padded region of the raw fused output carries ~no energy."""
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)
        rng = np.random.default_rng(1)
        tokens = jnp.asarray(rng.integers(1, 72, (1, 16)), jnp.int32)
        wav, n, ends = synthesize_wav_fused(
            params, state, SMALL.model, SMALL.audio, tokens,
            jnp.asarray([16], jnp.int32), None, max_steps=24, gl_iters=4)
        w = np.asarray(wav)[0]
        valid = w[: int(ends[0]) * 256]
        tail = w[(int(ends[0]) + 4) * 256:]  # skip GL spill-over window
        assert np.sqrt((tail ** 2).mean()) < 0.05 * max(
            np.sqrt((valid ** 2).mean()), 1e-6) + 1e-4
