"""Mesh composition of the Pallas kernels (ops/meshing.py).

With a kernel mesh registered, the fused attention tail and the decoder
train megakernels wrap their pallas_calls in ``jax.shard_map`` over the
``data`` axis, so each (virtual) device runs the kernel on its LOCAL
batch shard — instead of the un-partitionable custom call forcing GSPMD
to replicate the global batch.  These tests pin that the sharded
invocation is numerically the SAME program: forward outputs and every
gradient must match the unsharded kernel run (fp32 interpret mode —
tight tolerances).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import ModelConfig
from tacotron2_tpu.ops.meshing import (data_axis_size, kernel_mesh,
                                       mesh_is_data_only, set_kernel_mesh)
from tacotron2_tpu.parallel import make_mesh

SMALL = ModelConfig(n_mels=8, prenet_dim=16, encoder_embedding_dim=32,
                    decoder_rnn_dim=64, attention_rnn_dim=64,
                    attention_dim=16, location_n_filters=4,
                    location_kernel_size=7)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


@pytest.fixture()
def fused_attention(monkeypatch):
    monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "1")
    jax.clear_caches()
    yield
    jax.clear_caches()


def _tail_inputs(b, t=12, a=16, d=32):
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    qsum = jax.random.normal(ks[0], (b, t, a)) * 0.4
    v_w = jax.random.normal(ks[1], (a,)) * 0.3
    memory = jax.random.normal(ks[2], (b, t, d)) * 0.5
    mask = jnp.zeros((b, t), bool).at[:, -3:].set(True)
    return qsum, v_w, jnp.float32(0.1), jnp.float32(1.2), mask, memory


class TestAttentionTailMesh:
    def _grads(self, inputs):
        from tacotron2_tpu.ops.attention_kernel import attention_tail
        qsum, v_w, v_b, scale, mask, memory = inputs

        def loss(qsum, v_w, scale, memory):
            attn, ctx = attention_tail(qsum, v_w, v_b, scale, mask, memory)
            return jnp.sum(attn ** 2) + jnp.sum(ctx ** 2)

        val, grads = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3)))(qsum, v_w, scale, memory)
        return float(val), [np.asarray(g) for g in grads]

    def test_sharded_matches_unsharded(self, eight_devices, fused_attention):
        inputs = _tail_inputs(b=16)
        val0, g0 = self._grads(inputs)
        jax.clear_caches()
        with kernel_mesh(make_mesh(n_data=8, n_model=1)):
            assert data_axis_size() == 8
            val1, g1 = self._grads(inputs)
        assert abs(val1 - val0) < 1e-4 * abs(val0)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)

    def test_indivisible_batch_falls_back(self, eight_devices,
                                          fused_attention):
        # b=9 does not divide over the 8-wide axis: the wrapper must fall
        # back to the unsharded call and stay correct.
        inputs = _tail_inputs(b=9)
        val0, g0 = self._grads(inputs)
        jax.clear_caches()
        with kernel_mesh(make_mesh(n_data=8, n_model=1)):
            val1, g1 = self._grads(inputs)
        assert abs(val1 - val0) < 1e-4 * abs(val0)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


class TestTrainMegakernelMesh:
    B, T_ENC, T_DEC = 8, 12, 10

    def _value_and_grad(self, monkeypatch):
        from tacotron2_tpu.models.attention import precompute_memory
        from tacotron2_tpu.models.decoder import decoder_init
        from tacotron2_tpu.ops.decoder_bptt import decoder_scan_bptt

        params = decoder_init(jax.random.PRNGKey(0), SMALL)
        core = {k: params[k] for k in ("attention", "attn_lstm",
                                       "dec_lstm", "proj", "gate")}
        pre = jax.random.normal(jax.random.PRNGKey(1),
                                (self.T_DEC, self.B, 16)) * 0.3
        memory = jax.random.normal(jax.random.PRNGKey(2),
                                   (self.B, self.T_ENC, 32)) * 0.5
        pm = precompute_memory(core["attention"], memory)
        mask = jnp.zeros((self.B, self.T_ENC), bool).at[1, 9:].set(True)
        keys = jax.random.split(jax.random.PRNGKey(7), self.T_DEC)

        def loss(c, p_in, m_in, pm_in):
            mels, gates, attns = decoder_scan_bptt(
                SMALL, c, p_in, m_in, pm_in, mask, keys)
            return (jnp.sum(mels ** 2) + jnp.sum(gates ** 2)
                    + jnp.sum(attns ** 2) * 0.1)

        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            core, pre, memory, pm)

    def test_sharded_kernels_match_unsharded(self, eight_devices,
                                             fused_attention, monkeypatch):
        """Both megakernels (forward + reverse dx chain), 8-way sharded
        over the data axis, must reproduce the unsharded kernels'
        value and every gradient leaf."""
        from tacotron2_tpu.ops.decoder_train_kernel import (
            train_megakernel_enabled)
        monkeypatch.setenv("TACOTRON2_MEGA_TRAIN", "1")
        jax.clear_caches()
        l0, g0 = self._value_and_grad(monkeypatch)
        jax.clear_caches()
        with kernel_mesh(make_mesh(n_data=8, n_model=1)):
            assert train_megakernel_enabled(SMALL, self.B, self.T_ENC,
                                            jnp.float32)
            l1, g1 = self._value_and_grad(monkeypatch)
        assert abs(float(l1) - float(l0)) < 1e-4 * abs(float(l0))
        leaves0 = jax.tree_util.tree_leaves_with_path(g0)
        leaves1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        gscale = max(float(jnp.max(jnp.abs(v))) for _, v in leaves0)
        for path, v0 in leaves0:
            d = float(jnp.max(jnp.abs(leaves1[path] - v0)))
            rel = d / (float(jnp.max(jnp.abs(v0))) + 1e-4 * gscale)
            assert rel < 1e-4, (jax.tree_util.keystr(path), rel)


class TestGating:
    def test_train_kernel_requires_data_only_mesh(self, eight_devices,
                                                  fused_attention,
                                                  monkeypatch):
        from tacotron2_tpu.ops.decoder_train_kernel import (
            train_megakernel_enabled)
        monkeypatch.setenv("TACOTRON2_MEGA_TRAIN", "1")
        with kernel_mesh(make_mesh(n_data=4, n_model=2)):
            assert not mesh_is_data_only()
            # TP shards the weights the kernel keeps VMEM-resident
            assert not train_megakernel_enabled(SMALL, 8, 32, jnp.float32)
        with kernel_mesh(make_mesh(n_data=8, n_model=1)):
            assert mesh_is_data_only()
            # indivisible global batch -> scan path
            assert not train_megakernel_enabled(SMALL, 9, 32, jnp.float32)
            assert train_megakernel_enabled(SMALL, 8, 32, jnp.float32)

    def test_context_set_and_restore(self, eight_devices):
        assert data_axis_size() == 1
        mesh = make_mesh(n_data=8, n_model=1)
        prev = set_kernel_mesh(mesh)
        try:
            assert data_axis_size() == 8
        finally:
            set_kernel_mesh(*prev)
        assert data_axis_size() == 1

    def test_inference_megakernel_mesh_gating(self, eight_devices,
                                              monkeypatch):
        """Under a mesh the inference whole-decode kernel engages only
        with per-item stopping semantics (stop_mode="all"), a data-only
        mesh, and a dividing batch — per-shard gate stops are sound
        exactly there (ops/decoder_megakernel.py)."""
        from tacotron2_tpu.ops.decoder_megakernel import megakernel_enabled
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert megakernel_enabled(SMALL, b=1, t_enc=64)
        with kernel_mesh(make_mesh(n_data=8, n_model=1)):
            assert not megakernel_enabled(SMALL, b=8, t_enc=64)  # "any"
            assert megakernel_enabled(SMALL, b=8, t_enc=64,
                                      stop_mode="all")
            assert not megakernel_enabled(SMALL, b=9, t_enc=64,
                                          stop_mode="all")  # indivisible
        with kernel_mesh(make_mesh(n_data=4, n_model=2)):
            assert not megakernel_enabled(SMALL, b=8, t_enc=64,
                                          stop_mode="all")  # TP shards W


class TestInferMegakernelMesh:
    """r4: the inference megakernel shard_maps over the data axis with
    per-shard gate stops (stop_mode="all").  Per-item frames up to each
    item's frame_end, the frame_ends themselves, and n_frames must match
    the unsharded kernel; only garbage past an item's end may differ."""

    B, T_ENC, MAX = 16, 12, 14

    def test_sharded_matches_unsharded(self, eight_devices, monkeypatch):
        monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "0")
        from tacotron2_tpu.models.decoder import decoder_init
        from tacotron2_tpu.ops.decoder_megakernel import decoder_infer_mega
        params = decoder_init(jax.random.PRNGKey(0), SMALL)
        memory = jax.random.normal(
            jax.random.PRNGKey(7), (self.B, self.T_ENC, 32)) * 0.5
        lens = 4 + (jnp.arange(self.B) % (self.T_ENC - 4))
        mask = jnp.arange(self.T_ENC)[None, :] >= lens[:, None]
        args = dict(mask=mask, stop_mode="all",
                    forced_stop_at=jnp.int32(9))
        ref = decoder_infer_mega(params, SMALL, memory, self.MAX, 0.5,
                                 **args)
        jax.clear_caches()
        with kernel_mesh(make_mesh(n_data=8, n_model=1)):
            got = decoder_infer_mega(params, SMALL, memory, self.MAX, 0.5,
                                     **args)
        assert int(ref[3]) == int(got[3])
        np.testing.assert_array_equal(np.asarray(ref[4]),
                                      np.asarray(got[4]))
        ends = np.asarray(ref[4])
        for r, g in zip(ref[:3], got[:3]):
            r, g = np.asarray(r), np.asarray(g)
            for i in range(self.B):
                e = int(ends[i])
                err = np.max(np.abs(r[i, :e] - g[i, :e]))
                assert err < 2e-4, err


class TestFullStepDP8WithKernels:
    def test_dp8_step_matches_single_device(self, eight_devices,
                                            fused_attention, monkeypatch):
        """End-to-end: a full train_step on an 8-way data mesh with BOTH
        Pallas megakernels active (shard_map path) matches the
        single-device step with the same kernels."""
        import dataclasses

        from tacotron2_tpu.config import Config
        from tacotron2_tpu.parallel import shard_batch, shard_train_state
        from tacotron2_tpu.train import (create_train_state, make_optimizer,
                                         train_step)

        cfg = Config(model=dataclasses.replace(
            SMALL, symbols_embedding_dim=32, postnet_embedding_dim=24,
            max_decoder_steps=50))
        monkeypatch.setenv("TACOTRON2_MEGA_TRAIN", "1")
        rng = np.random.default_rng(5)
        b, t_enc, t_dec = 8, 8, 16
        batch = {
            "text": rng.integers(1, 72, (b, t_enc)).astype(np.int32),
            "text_lengths": np.full((b,), t_enc, np.int32),
            "mel": (rng.standard_normal((b, cfg.model.n_mels, t_dec))
                    .astype(np.float32) - 5.0),
            "mel_lengths": np.full((b,), t_dec, np.int32),
            "speaker_ids": np.zeros((b,), np.int32),
        }
        tx = make_optimizer(cfg.train)

        jax.clear_caches()
        state0 = create_train_state(cfg, seed=0)
        _, losses_single, _ = train_step(
            state0, {k: jnp.asarray(v) for k, v in batch.items()},
            cfg=cfg, tx=tx, use_postnet=True, sigma_warmup_steps=800)

        jax.clear_caches()
        mesh = make_mesh(n_data=8, n_model=1)
        with kernel_mesh(mesh), mesh:
            state = shard_train_state(mesh, create_train_state(cfg, seed=0))
            db = shard_batch(mesh, batch)
            _, losses_dp, _ = train_step(
                state, db, cfg=cfg, tx=tx, use_postnet=True,
                sigma_warmup_steps=800)
        np.testing.assert_allclose(float(losses_dp.total),
                                   float(losses_single.total), rtol=1e-4)
        np.testing.assert_allclose(float(losses_dp.mel),
                                   float(losses_single.mel), rtol=1e-4)
