"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the full training step compiles and executes under
data-parallel and tensor-parallel shardings, and that DP results match
single-device results (GSPMD semantics are global).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Config, ModelConfig
from tacotron2_tpu.parallel import (make_mesh, shard_batch,
                                    shard_train_state)
from tacotron2_tpu.train import create_train_state, make_optimizer, train_step

SMALL = Config(model=ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=50))


def _batch(b=8, t_enc=8, t_dec=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": rng.integers(1, 72, (b, t_enc)).astype(np.int32),
        "text_lengths": np.full((b,), t_enc, np.int32),
        "mel": (rng.standard_normal((b, 80, t_dec)).astype(np.float32) - 5.0),
        "mel_lengths": np.full((b,), t_dec, np.int32),
        "speaker_ids": np.zeros((b,), np.int32),
    }


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


class TestDataParallel:
    def test_dp8_matches_single_device(self, eight_devices):
        batch = _batch()
        sigma = 800

        state0 = create_train_state(SMALL, seed=0)
        tx = make_optimizer(SMALL.train)
        _, losses_single, _ = train_step(
            state0, {k: jnp.asarray(v) for k, v in batch.items()},
            cfg=SMALL, tx=tx, use_postnet=True, sigma_warmup_steps=sigma)

        mesh = make_mesh(n_data=8, n_model=1)
        state = create_train_state(SMALL, seed=0)
        with mesh:
            state = shard_train_state(mesh, state)
            db = shard_batch(mesh, batch)
            new_state, losses_dp, _ = train_step(
                state, db, cfg=SMALL, tx=tx, use_postnet=True,
                sigma_warmup_steps=sigma)
            assert int(new_state.step) == 1
        np.testing.assert_allclose(float(losses_dp.total),
                                   float(losses_single.total), rtol=1e-4)
        np.testing.assert_allclose(float(losses_dp.mel),
                                   float(losses_single.mel), rtol=1e-4)

    def test_tensor_parallel_executes(self, eight_devices):
        mesh = make_mesh(n_data=4, n_model=2)
        batch = _batch(b=4)
        state = create_train_state(SMALL, seed=0)
        tx = make_optimizer(SMALL.train)
        with mesh:
            state = shard_train_state(mesh, state, tensor_parallel=True)
            db = shard_batch(mesh, batch)
            new_state, losses, _ = train_step(
                state, db, cfg=SMALL, tx=tx, use_postnet=True,
                sigma_warmup_steps=800)
        assert np.isfinite(float(losses.total))
        assert int(new_state.step) == 1


class TestGraftEntry:
    def test_entry_compiles(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape[0] == 2
