"""Fused single-dispatch synthesis tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import AudioConfig, Config, ModelConfig
from tacotron2_tpu.infer.fused import (synthesize_wav, synthesize_wav_fused,
                                       synthesize_wav_fused_hifigan)
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

    def test_fused_hifigan_single_program(self):
        """Tokens -> waveform through the NEURAL vocoder in one XLA program
        (the reference's primary path, inference.py:40-54,71-74), and it
        matches running the modular decode + hifigan_apply separately."""
        from tacotron2_tpu.models.hifigan import hifigan_apply, hifigan_init
        from tacotron2_tpu.models import tacotron2_infer_jit

        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        hp = hifigan_init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(1, 72, (2, 16)), jnp.int32)
        lengths = jnp.asarray([16, 12], jnp.int32)

        wav, mel_fused, n, ends = synthesize_wav_fused_hifigan(
            params, state, hp, SMALL.model, SMALL.audio, tokens, lengths,
            None, max_steps=24)
        assert wav.shape == (2, 24 * 256)   # upsampling 8*8*2*2 == hop 256
        assert mel_fused.shape == (2, 24, 80)
        assert int(n) == 24
        assert np.isfinite(np.asarray(wav)).all()

        out, n2, ends2 = tacotron2_infer_jit(
            params, state, SMALL.model, tokens, max_steps=24,
            text_lengths=lengths)
        mel = np.asarray(out.mel_postnet)
        valid = np.arange(mel.shape[1])[None, :, None] < np.asarray(
            ends2)[:, None, None]
        mel = np.where(valid, mel, np.log(SMALL.audio.mel_eps))
        wav_modular = hifigan_apply(hp, jnp.swapaxes(jnp.asarray(mel), 1, 2))
        np.testing.assert_allclose(np.asarray(wav), np.asarray(wav_modular),
                                   atol=5e-5)

    def test_fused_hifigan_chunked_vocoder_matches_unchunked(self):
        """vocoder_chunk_frames (memory-bounded serving for batches past
        the HBM wall) produces the same waveform as the unchunked fused
        program."""
        from tacotron2_tpu.models.hifigan import hifigan_init

        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        hp = hifigan_init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(1, 72, (2, 16)), jnp.int32)
        lengths = jnp.asarray([16, 12], jnp.int32)
        ref, _, _, _ = synthesize_wav_fused_hifigan(
            params, state, hp, SMALL.model, SMALL.audio, tokens, lengths,
            None, max_steps=96)
        chunked, _, _, _ = synthesize_wav_fused_hifigan(
            params, state, hp, SMALL.model, SMALL.audio, tokens, lengths,
            None, max_steps=96, vocoder_chunk_frames=24)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                                   atol=5e-5)

    def test_host_wrapper_hifigan(self):
        from tacotron2_tpu.models.hifigan import hifigan_init
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)
        hp = hifigan_init(jax.random.PRNGKey(1))
        wavs = synthesize_wav(params, state, ["Hi there."], SMALL,
                              max_steps=24, hifigan_params=hp)
        assert len(wavs) == 1
        assert wavs[0].shape[0] == 2 * 256
        assert np.isfinite(wavs[0]).all()

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
