"""Streaming decode tests: chunked generator matches the monolithic decode."""

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Config, ModelConfig
from tacotron2_tpu.infer.streaming import stream_mels
from tacotron2_tpu.models import tacotron2_infer, tacotron2_init
from tacotron2_tpu.text import pad_sequences, text_to_sequence

SMALL = Config(model=ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=40))


class TestStreaming:
    def test_chunks_match_monolithic_decode(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        text = "Streaming matches batch decoding."

        chunks = list(stream_mels(params, state, text, SMALL,
                                  chunk_frames=7, max_steps=30))
        streamed = np.concatenate(chunks, axis=0)

        seq = text_to_sequence(text)
        tokens, lengths = pad_sequences([seq], pad_multiple=16)
        out, n, _ = tacotron2_infer(
            params, state, SMALL.model, jnp.asarray(tokens), max_steps=30,
            text_lengths=jnp.asarray(lengths))
        mono = np.asarray(out.mel_coarse)[0, :int(n)]

        assert streamed.shape == mono.shape
        np.testing.assert_allclose(streamed, mono, atol=1e-5)

    def test_multiple_chunk_sizes_agree(self):
        params, state = tacotron2_init(jax.random.PRNGKey(1), SMALL.model)
        a = np.concatenate(list(stream_mels(params, state, "Hello world.",
                                            SMALL, chunk_frames=4,
                                            max_steps=20)))
        b = np.concatenate(list(stream_mels(params, state, "Hello world.",
                                            SMALL, chunk_frames=16,
                                            max_steps=20)))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_gate_stop_truncates_stream(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)
        chunks = list(stream_mels(params, state, "Short.", SMALL,
                                  chunk_frames=8, max_steps=30))
        total = sum(c.shape[0] for c in chunks)
        assert total == 2  # gate fires as soon as >1 frames are out

    def test_postnet_stream_matches_offline_postnet(self):
        """apply_postnet=True: the lookahead-refined stream concatenates
        to exactly the offline postnet output (offline pads the coarse
        buffer with zeros past the gate stop; the stream's flush
        reproduces that via conv SAME zero padding)."""
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        text = "Postnet streaming parity."

        chunks = list(stream_mels(params, state, text, SMALL,
                                  chunk_frames=7, max_steps=30,
                                  apply_postnet=True))
        streamed = np.concatenate(chunks, axis=0)

        seq = text_to_sequence(text)
        tokens, lengths = pad_sequences([seq], pad_multiple=16)
        out, n, _ = tacotron2_infer(
            params, state, SMALL.model, jnp.asarray(tokens), max_steps=30,
            text_lengths=jnp.asarray(lengths))
        mono = np.asarray(out.mel_postnet)[0, :int(n)]

        assert streamed.shape == mono.shape
        np.testing.assert_allclose(streamed, mono, atol=1e-4)

    def test_postnet_stream_chunk_sizes_agree(self):
        params, state = tacotron2_init(jax.random.PRNGKey(1), SMALL.model)
        a = np.concatenate(list(stream_mels(
            params, state, "Hello world.", SMALL, chunk_frames=4,
            max_steps=20, apply_postnet=True)))
        b = np.concatenate(list(stream_mels(
            params, state, "Hello world.", SMALL, chunk_frames=16,
            max_steps=20, apply_postnet=True)))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_postnet_stream_gate_stop_parity(self):
        """Gate-ended streams exercise the other flush branch (offline
        buffer holds real zero frames past the stop)."""
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL.model)
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)

        chunks = list(stream_mels(params, state, "Short.", SMALL,
                                  chunk_frames=8, max_steps=30,
                                  apply_postnet=True))
        streamed = np.concatenate(chunks, axis=0)

        seq = text_to_sequence("Short.")
        tokens, lengths = pad_sequences([seq], pad_multiple=16)
        out, n, _ = tacotron2_infer(
            params, state, SMALL.model, jnp.asarray(tokens), max_steps=30,
            text_lengths=jnp.asarray(lengths))
        mono = np.asarray(out.mel_postnet)[0, :int(n)]
        assert streamed.shape == mono.shape == (2, 80)
        np.testing.assert_allclose(streamed, mono, atol=1e-4)

    def test_refine_stream_small_chunk_gate_flush_parity(self):
        """Small chunk_frames: a gate-stop flush with a full 2r-frame
        buffer needs r-2 zero rows past the last emitted frame (the
        deepest layer-1 phantom BatchNorm activation its cone reads;
        input-level zeros equal conv SAME padding).  Regression: bufmax
        = 2r + chunk_frames left only chunk_frames rows, so for
        chunk_frames < r-2 the tail frames' cones ran off the window."""
        from tacotron2_tpu.infer.streaming import (_postnet_window,
                                                   _refine_stream)
        params, state = tacotron2_init(jax.random.PRNGKey(2), SMALL.model)
        mcfg = SMALL.model
        r = mcfg.postnet_n_convolutions * \
            ((mcfg.postnet_kernel_size - 1) // 2)
        t_total, cf = 25, 4
        assert cf < r - 2
        rng = np.random.default_rng(0)
        coarse = rng.standard_normal(
            (t_total, mcfg.n_mels)).astype(np.float32)

        def gen():
            for i in range(0, t_total, cf):
                yield coarse[i:i + cf]
            return "gate"

        streamed = np.concatenate(list(_refine_stream(
            params, state, mcfg, gen(), cf)))
        offline_buf = np.concatenate(
            [coarse, np.zeros((r + 4, mcfg.n_mels), np.float32)])
        offline = np.asarray(_postnet_window(
            params, state, mcfg, jnp.asarray(offline_buf)))[:t_total]
        assert streamed.shape == offline.shape
        np.testing.assert_allclose(streamed, offline, atol=1e-4)

    def test_refine_stream_gate_near_cap_parity(self):
        """Gate firing within r frames of max_steps: the offline buffer
        holds only (max_steps - n) real zero rows before it ENDS, so
        the flush must append exactly those zeros and run the window at
        its true length instead of assuming r zeros exist."""
        from tacotron2_tpu.infer.streaming import (_postnet_window,
                                                   _refine_stream)
        params, state = tacotron2_init(jax.random.PRNGKey(3), SMALL.model)
        mcfg = SMALL.model
        r = mcfg.postnet_n_convolutions * \
            ((mcfg.postnet_kernel_size - 1) // 2)
        t_total, cf, zero_tail = 25, 8, 3
        assert zero_tail < r
        rng = np.random.default_rng(1)
        coarse = rng.standard_normal(
            (t_total, mcfg.n_mels)).astype(np.float32)

        def gen():
            for i in range(0, t_total, cf):
                yield coarse[i:i + cf]
            return ("gate", zero_tail)

        streamed = np.concatenate(list(_refine_stream(
            params, state, mcfg, gen(), cf)))
        # offline: max_steps buffer = frames + zero_tail zeros, then END
        offline_buf = np.concatenate(
            [coarse, np.zeros((zero_tail, mcfg.n_mels), np.float32)])
        offline = np.asarray(_postnet_window(
            params, state, mcfg, jnp.asarray(offline_buf)))[:t_total]
        assert streamed.shape == offline.shape
        np.testing.assert_allclose(streamed, offline, atol=1e-4)
