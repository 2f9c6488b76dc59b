"""Rematerialization option: gradients identical with and without."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Config, ModelConfig
from tacotron2_tpu.train import create_train_state, make_optimizer, train_step

BASE = ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=40,
    # This file pins remat-vs-plain AUTODIFF equivalence; the split-BPTT
    # backward has its own parity suite (test_split_bptt.py).
    decoder_split_bptt=False)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.integers(1, 72, (2, 8)), jnp.int32),
        "text_lengths": jnp.asarray([8, 6], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((2, 80, 16)) - 5.0,
                           jnp.float32),
        "mel_lengths": jnp.asarray([16, 12], jnp.int32),
        "speaker_ids": jnp.zeros((2,), jnp.int32),
    }


class TestRemat:
    def test_remat_step_matches_plain_step(self):
        results = {}
        variants = {"plain": dict(remat_decoder_step=False),
                    "full": dict(remat_decoder_step=True,
                                 decoder_remat_policy="full"),
                    "dots": dict(remat_decoder_step=True,
                                 decoder_remat_policy="dots")}
        for name, fields in variants.items():
            cfg = Config(model=dataclasses.replace(BASE, **fields))
            state = create_train_state(cfg, seed=0)
            tx = make_optimizer(cfg.train)
            state, losses, _ = train_step(
                state, _batch(), cfg=cfg, tx=tx, use_postnet=True,
                sigma_warmup_steps=800)
            results[name] = (float(losses.total),
                             np.asarray(state.params["decoder"]["proj"]["w"]))
        for name in ("full", "dots"):
            assert np.isclose(results["plain"][0], results[name][0],
                              rtol=1e-6), name
            np.testing.assert_allclose(results["plain"][1], results[name][1],
                                       atol=1e-6)

    def test_unknown_remat_policy_rejected(self):
        import pytest
        cfg = Config(model=dataclasses.replace(
            BASE, remat_decoder_step=True, decoder_remat_policy="bogus"))
        state = create_train_state(cfg, seed=0)
        tx = make_optimizer(cfg.train)
        with pytest.raises(ValueError, match="decoder_remat_policy"):
            train_step(state, _batch(), cfg=cfg, tx=tx, use_postnet=True,
                       sigma_warmup_steps=800)
