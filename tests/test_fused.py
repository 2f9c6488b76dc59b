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


class TestLengthProportional:
    """The one-dispatch length-proportional path (+ its two-phase serving
    split): bucket-capped decode+vocode, int16 PCM, escalation on a gate
    that outruns the predicted bucket."""

    def _gated_params(self, stop_at=None):
        import jax
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        return params, state

    def test_estimate_and_pick_bucket(self):
        from tacotron2_tpu.infer.fused import (VOCODE_BUCKETS,
                                               estimate_frames, pick_bucket)
        assert estimate_frames(52) == int(np.ceil(7.0 * 52 + 40))  # ~404
        assert pick_bucket(300, 1000) == 384
        assert pick_bucket(404, 1000) == 512
        assert pick_bucket(1, 1000) == 128
        assert pick_bucket(5000, 1000) == 1000
        assert pick_bucket(20, 32, buckets=(8, 16, 24, 32)) == 24
        assert pick_bucket(40, 32, buckets=(8, 16, 24, 32)) == 32
        assert VOCODE_BUCKETS[-1] == 1000

    def test_proportional_pcm_matches_full_program(self):
        """Bucket-capped program == full-length program on the samples
        whose HiFi-GAN receptive field sees only shared mel frames (decode
        is causal, so the mel prefix is identical under any cap)."""
        from tacotron2_tpu.infer.fused import (_synthesize_pcm_bucket,
                                               synthesize_pcm_proportional)
        from tacotron2_tpu.models.hifigan import (RECEPTIVE_FRAMES,
                                                  hifigan_init)
        params, state = self._gated_params()
        hp = hifigan_init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(1, 72, (1, 16)), jnp.int32)
        lengths = jnp.asarray([16], jnp.int32)
        bucket = 24
        pcm, ends, used = synthesize_pcm_proportional(
            params, state, SMALL.model, SMALL.audio, tokens, lengths,
            expected_frames=20, buckets=(8, 16, 24, 32),
            hifigan_params=hp, forced_stop_at=jnp.int32(10))
        assert used == bucket
        assert pcm.dtype == np.int16
        assert pcm.shape == (1, bucket * 256)
        assert int(ends[0]) == 10
        pcm_full, ends_full, _ = _synthesize_pcm_bucket(
            params, state, hp, SMALL.model, SMALL.audio, tokens, lengths,
            None, bucket=32, gate_threshold=None, stop_mode="any",
            gl_iters=4, use_hifigan=True, forced_stop_at=jnp.int32(10))
        assert int(ends_full[0]) == 10
        n_cmp = (bucket - RECEPTIVE_FRAMES) * 256
        np.testing.assert_allclose(
            pcm[:, :n_cmp].astype(np.int32),
            np.asarray(pcm_full)[:, :n_cmp].astype(np.int32), atol=1)

    def test_proportional_escalates_when_gate_outruns_bucket(self):
        """A gate that never fires inside the predicted bucket triggers ONE
        escalation to the full-length program."""
        from tacotron2_tpu.infer.fused import synthesize_pcm_proportional
        params, state = self._gated_params()
        rng = np.random.default_rng(1)
        tokens = jnp.asarray(rng.integers(1, 72, (1, 16)), jnp.int32)
        lengths = jnp.asarray([16], jnp.int32)
        # predicted 8-frame bucket, but the (forced) gate fires at 20
        pcm, ends, used = synthesize_pcm_proportional(
            params, state, SMALL.model, SMALL.audio, tokens, lengths,
            expected_frames=4, buckets=(8, 16, 24, 32), gl_iters=4,
            forced_stop_at=jnp.int32(20))
        assert used == 32          # escalated to max_decoder_steps
        assert int(ends[0]) == 20
        assert pcm.shape == (1, 32 * 256)
        assert np.isfinite(pcm.astype(np.float32)).all()

    def test_proportional_griffinlim_structure(self):
        from tacotron2_tpu.infer.fused import synthesize_pcm_proportional
        params, state = self._gated_params()
        rng = np.random.default_rng(2)
        tokens = jnp.asarray(rng.integers(1, 72, (1, 16)), jnp.int32)
        pcm, ends, used = synthesize_pcm_proportional(
            params, state, SMALL.model, SMALL.audio, tokens,
            jnp.asarray([16], jnp.int32), expected_frames=12,
            buckets=(8, 16, 24, 32), gl_iters=4,
            forced_stop_at=jnp.int32(6))
        assert used == 16
        assert int(ends[0]) == 6
        assert pcm.dtype == np.int16 and pcm.shape == (1, 16 * 256)

    def test_two_phase_matches_oneshot(self):
        """decode_mel_fused + vocode_bucket_hifigan_pcm16 (the serving
        split: mel stays device-resident) == the one-shot bucket program."""
        from tacotron2_tpu.infer.fused import (_synthesize_pcm_bucket,
                                               decode_mel_fused,
                                               vocode_bucket_hifigan_pcm16)
        from tacotron2_tpu.models.hifigan import hifigan_init
        params, state = self._gated_params()
        hp = hifigan_init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(3)
        tokens = jnp.asarray(rng.integers(1, 72, (2, 16)), jnp.int32)
        lengths = jnp.asarray([16, 12], jnp.int32)
        mel, _, ends = decode_mel_fused(
            params, state, SMALL.model, tokens, lengths, None,
            max_steps=24, forced_stop_at=jnp.int32(10))
        pcm2 = vocode_bucket_hifigan_pcm16(hp, mel, ends, SMALL.audio, 16)
        pcm1, ends1, _ = _synthesize_pcm_bucket(
            params, state, hp, SMALL.model, SMALL.audio, tokens, lengths,
            None, bucket=16, gate_threshold=None, stop_mode="any",
            gl_iters=4, use_hifigan=True, forced_stop_at=jnp.int32(10))
        np.testing.assert_array_equal(np.asarray(ends), np.asarray(ends1))
        np.testing.assert_allclose(np.asarray(pcm2).astype(np.int32),
                                   np.asarray(pcm1).astype(np.int32),
                                   atol=1)
